"""Run mutex (reference ``dbo.begin_run`` semantics, storage.py:103-111).

The reference takes an exclusive DB lock per run and returns NULL if a
run is already active. Here: an O_CREAT|O_EXCL lock file (atomic on
POSIX; on a real cluster this is a conditional Iceberg append, which
snapshot isolation makes atomic)."""

from __future__ import annotations

import json
import os
import uuid


class RunLock:
    def __init__(self, root: str):
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "run.lock")
        self.run_id: str | None = None

    def begin_run(self) -> str | None:
        """Returns a run_id, or None if another run holds the lock."""
        run_id = uuid.uuid4().hex[:12]
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None
        with os.fdopen(fd, "w") as f:
            json.dump({"run_id": run_id}, f)
        self.run_id = run_id
        return run_id

    def end_run(self) -> None:
        if self.run_id is not None and os.path.exists(self.path):
            os.unlink(self.path)
        self.run_id = None

    def __enter__(self):
        rid = self.begin_run()
        if rid is None:
            raise RuntimeError("another run is active (begin_run returned NULL)")
        return rid

    def __exit__(self, *exc):
        self.end_run()
        return False
