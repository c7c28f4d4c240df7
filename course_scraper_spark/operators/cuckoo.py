"""Cuckoo-filter sidecar — the deletable twin of the bloom sidecar.

The north-star design calls for a "partitioned bloom+cuckoo URL-seen
filter": bloom (operators/bloom.py) is the cheap append-only prefilter;
the cuckoo filter (Fan et al., CoNEXT'14: partial-key cuckoo hashing,
4-slot buckets, 16-bit fingerprints) adds *deletion* — needed when a
seen-entry must be retired (recrawl windows, TTL'd URLs) without
rebuilding the filter.

Same layout contract as the bloom sidecar: one blob per host bucket,
aligned with the seen table's hash partitioning; exactness still comes
from the anti-join — the filter only prunes.

Build: mostly-vectorized numpy. Primary/alternate bucket placement is
resolved in vector passes; only the overflow remainder (a few % at 0.7
load) falls into the bounded eviction loop. Probe: fully vectorized
(gather both candidate buckets, compare fingerprints).
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 200


def _fingerprint(h: np.ndarray) -> np.ndarray:
    fp = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    # partial-key cuckoo: alt = b XOR hash(fp)
    fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFFFFFF)
    return ((b.astype(np.uint64) ^ fph) % np.uint64(n_buckets)).astype(np.int64)


class CuckooFilter:
    def __init__(self, n_keys: int, load: float = 0.7):
        n_buckets = max(8, int(n_keys / (_SLOTS * load)))
        # power of two for cheap masking behavior of XOR-alt
        self.n_buckets = 1 << int(np.ceil(np.log2(n_buckets)))
        self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)

    # -- build ---------------------------------------------------------
    def insert_many(self, hashes: np.ndarray) -> int:
        """Insert 64-bit key hashes; returns number that failed (filter
        too full — callers size by n_keys so this is ~0)."""
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        b1 = _bucket1(h, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)

        pending_fp, pending_b = fp, b1
        alt = b2
        # vector passes: try to place everyone in their current bucket;
        # those that don't fit switch to the alternate; repeat
        for _pass in range(8):
            if len(pending_fp) == 0:
                return 0
            placed = np.zeros(len(pending_fp), dtype=bool)
            order = np.argsort(pending_b, kind="stable")
            for idx in order:  # grouped by bucket: cheap slot assignment
                b = pending_b[idx]
                row = self.table[b]
                free = np.flatnonzero(row == 0)
                if free.size:
                    row[free[0]] = pending_fp[idx]
                    placed[idx] = True
            pending_fp = pending_fp[~placed]
            new_b = alt[~placed]
            alt = pending_b[~placed]
            pending_b = new_b

        # bounded eviction loop for the stragglers
        fails = 0
        for i in range(len(pending_fp)):
            f, b = int(pending_fp[i]), int(pending_b[i])
            ok = False
            for _ in range(_MAX_KICKS):
                row = self.table[b]
                free = np.flatnonzero(row == 0)
                if free.size:
                    row[free[0]] = f
                    ok = True
                    break
                j = int((f * 2654435761 + b) % _SLOTS)  # deterministic victim
                f, self.table[b, j] = int(self.table[b, j]), f
                b = int(
                    _alt_bucket(np.array([b], dtype=np.int64), np.array([f], dtype=np.uint16), self.n_buckets)[0]
                )
            if not ok:
                fails += 1
        return fails

    # -- probe ----------------------------------------------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        b1 = _bucket1(h, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    # -- delete ----------------------------------------------------------
    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per key; returns mask of keys
        actually deleted (the capability blooms lack)."""
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        b1 = _bucket1(h, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        out = np.zeros(len(h), dtype=bool)
        for i in range(len(h)):  # deletes are rare control-plane ops
            for b in (b1[i], b2[i]):
                row = self.table[b]
                hit = np.flatnonzero(row == fp[i])
                if hit.size:
                    row[hit[0]] = 0
                    out[i] = True
                    break
        return out

    # -- (de)serialization ------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, n_buckets: int) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.n_buckets = n_buckets
        obj.table = np.frombuffer(bytearray(blob), dtype=np.uint16).reshape(n_buckets, _SLOTS).copy()
        return obj
