"""Snapshot tables: Iceberg-style semantics over plain parquet.

The sandbox ships no Iceberg runtime jars, so this module implements the
subset of Iceberg behavior the engine's storage design needs — on a real
cluster every call here maps 1:1 onto an Iceberg catalog table
(``MERGE INTO``, snapshot reads, tags) and this file becomes a thin
wrapper; the engine code does not change.

Semantics provided:

* **append / overwrite / merge commits** with an append-only JSON
  snapshot log (atomic tmp+rename), each commit optionally *tagged*
  (``run_{id}_wave_{k}`` checkpoint tags — SURVEY.md §4.5).
* **snapshot / tag reads** (time travel) — the resume path.
* **bucket partitioning**: tables may declare ``bucket_col`` —
  rows carry ``_bucket = pmod(xxhash64(col), n_buckets)`` and a MERGE
  rewrites ONLY the buckets present in its source (partition-scoped
  rewrite = the Iceberg copy-on-write behavior). This is the explicit
  hash-partition-on-host design the north rule requires: url_seen and
  urls tables bucket by host, so a wave's MERGE touches just the hosts
  in that wave.
* **MERGE INTO** (storage.py:227-246 K1, :248-276 K2, merge_courses.py
  K6): match on key columns (null-safe), update named columns on match,
  insert unmatched source rows.

Reads reconstruct the live file set per bucket by replaying the log:
append adds a dir to a bucket's list, overwrite/merge replaces the
affected buckets' lists. Every data file holds a single ``_bucket``
run (we repartition by bucket before writing) so parquet min/max stats
prune bucket-filtered reads.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "snapshots.json"
ALL = "__all__"


@dataclass
class Commit:
    id: int
    op: str  # create | append | overwrite | merge
    dir: str | None
    buckets: list[int] | None  # None = all buckets affected
    tag: str | None = None
    meta: dict = field(default_factory=dict)


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._log_path = os.path.join(path, _LOG)
        if os.path.exists(self._log_path):
            with open(self._log_path) as f:
                raw = json.load(f)
            self.props = raw["props"]
            self.commits = [Commit(**c) for c in raw["commits"]]
        else:
            self.props = {}
            self.commits = []

    # -- creation ----------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        bucket_col: str | None = None,
        n_buckets: int = 16,
    ) -> "SnapshotTable":
        os.makedirs(path, exist_ok=True)
        t = cls(spark, path)
        if not t.commits:
            t.props = {"bucket_col": bucket_col, "n_buckets": n_buckets}
            t.commits.append(Commit(id=0, op="create", dir=None, buckets=None))
            t._flush()
        return t

    def _flush(self) -> None:
        tmp = self._log_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(
                {"props": self.props, "commits": [c.__dict__ for c in self.commits]}, f
            )
        os.replace(tmp, self._log_path)

    # -- helpers -----------------------------------------------------------
    def _bucketed(self, df: DataFrame) -> DataFrame:
        bc = self.props.get("bucket_col")
        if bc is None:
            return df.withColumn("_bucket", F.lit(0))
        n = int(self.props["n_buckets"])
        return df.withColumn("_bucket", F.pmod(F.xxhash64(F.col(bc)), F.lit(n)).cast("int"))

    def _write_dir(self, df: DataFrame) -> tuple[str, list[int], int]:
        b = self._bucketed(df).repartition(F.col("_bucket"))
        rel = f"s{len(self.commits)}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.path, "data", rel)
        b.write.mode("overwrite").parquet(out)
        # one read-back job yields both the touched-bucket list and the
        # row count (the Iceberg summary's added-records twin)
        stats = (
            self.spark.read.parquet(out).groupBy("_bucket").count().collect()
        )
        buckets = sorted(r._bucket for r in stats)
        return rel, buckets, sum(r["count"] for r in stats)

    def _commit(self, op: str, rel: str | None, buckets, tag, meta=None) -> int:
        cid = len(self.commits)
        self.commits.append(
            Commit(id=cid, op=op, dir=rel, buckets=buckets, tag=tag, meta=meta or {})
        )
        self._flush()
        return cid

    # -- writes ------------------------------------------------------------
    def append(self, df: DataFrame, tag: str | None = None, meta: dict | None = None) -> int:
        rel, buckets, n = self._write_dir(df)
        m = dict(meta or {})
        m.setdefault("inserted", n)
        m.setdefault("updated", 0)
        return self._commit("append", rel, buckets, tag, m)

    def overwrite(self, df: DataFrame, tag: str | None = None, meta: dict | None = None) -> int:
        rel, _, n = self._write_dir(df)
        m = dict(meta or {})
        m.setdefault("inserted", n)
        m.setdefault("updated", 0)
        return self._commit("overwrite", rel, None, tag, m)

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        update_cols: list[str] | None = None,
        insert: bool = True,
        tag: str | None = None,
    ) -> int:
        """MERGE INTO: null-safe match on ``on``; matched target rows get
        ``update_cols`` overwritten from source; unmatched source rows are
        inserted (when ``insert``). Rewrites only the buckets the source
        touches (plus, for bucketless tables, the whole table)."""
        target = self.read()
        cols = target.columns
        src = source.select(*cols)

        bc = self.props.get("bucket_col")
        if bc is not None and target.head(1):
            src_bucketed = self._bucketed(src)
            touched = sorted(
                r._bucket for r in src_bucketed.select("_bucket").distinct().collect()
            )
            tgt_bucketed = self._bucketed(target)
            scope = tgt_bucketed.filter(F.col("_bucket").isin(touched)).drop("_bucket")
        else:
            touched = None
            scope = target

        cond = [scope[k].eqNullSafe(src[k]) for k in on]
        joined = scope.alias("t").join(src.alias("s"), cond, "full_outer").persist()

        matched = F.col(f"t.{on[0]}").isNotNull() & F.col(f"s.{on[0]}").isNotNull()
        t_only = F.col(f"s.{on[0]}").isNull()
        s_only = F.col(f"t.{on[0]}").isNull()
        # update_cols: None = update every column on match; [] = update none
        # (insert-only MERGE, K1 semantics, storage.py:227-246)
        upd = set(cols if update_cols is None else update_cols)
        out_cols = []
        for c in cols:
            tc, sc = F.col(f"t.{c}"), F.col(f"s.{c}")
            merged_val = (
                F.when(matched, sc if c in upd else tc)
                .when(t_only, tc)
                .otherwise(sc)  # source-only -> insert
            )
            out_cols.append(merged_val.alias(c))
        result = joined.select(*out_cols)
        if not insert:
            keys = scope.select(*on)
            result = result.join(keys, on, "left_semi")

        # insert/update tally — the Iceberg snapshot summary's twin
        # (surfaced by last_commit_tally). One small agg over the
        # already-persisted scoped join; matched rows only count as
        # updates when a WHEN MATCHED clause exists (upd non-empty),
        # mirroring MERGE semantics.
        counts = joined.agg(
            F.sum(matched.cast("long")).alias("m"),
            F.sum(s_only.cast("long")).alias("i"),
        ).first()
        n_updated = int(counts["m"] or 0) if upd else 0
        n_inserted = int(counts["i"] or 0) if insert else 0

        rel, buckets, _ = self._write_dir(result)
        joined.unpersist()
        return self._commit(
            "merge", rel, touched if touched is not None else None, tag,
            {"inserted": n_inserted, "updated": n_updated},
        )

    def last_commit_tally(self) -> tuple[int, int]:
        """(inserted, updated) of the latest data commit — interface
        parity with ``IcebergTable.last_commit_tally``. The emulation's
        counts are EXACT (computed from the merge join itself); the
        Iceberg backend's updated count is a copy-on-write file-level
        upper bound (see iceberg.py)."""
        for c in reversed(self.commits):
            if c.op in ("append", "overwrite", "merge"):
                return int(c.meta.get("inserted", 0)), int(c.meta.get("updated", 0))
        raise ValueError("no data commits yet")

    # -- reads -------------------------------------------------------------
    def _live_dirs(self, snapshot_id: int | None = None) -> dict[str, tuple[str, set[int]]]:
        """dir -> ('include'|'exclude', bucket set).

        'include' = only those buckets of the dir are live; 'exclude' =
        every bucket EXCEPT those (wildcard dirs from overwrite commits,
        whose bucket list was never recorded, minus buckets later
        rewritten by a scoped merge — without the exclusion, an
        overwrite-then-merge history would read the touched buckets from
        BOTH dirs and duplicate their rows)."""
        upto = snapshot_id if snapshot_id is not None else len(self.commits) - 1

        # replay: per-bucket list of contributing dirs + wildcard dirs
        # with their dead (superseded) buckets
        per_bucket: dict[int, list[str]] = {}
        wildcard: list[tuple[str, set[int]]] = []
        for c in self.commits[: upto + 1]:
            if c.op == "create" or c.dir is None:
                continue
            if c.op == "append":
                for b in c.buckets or []:
                    per_bucket.setdefault(b, []).append(c.dir)
            elif c.op == "overwrite" or (c.op == "merge" and c.buckets is None):
                per_bucket = {}
                wildcard = [(c.dir, set())]
            elif c.op == "merge":
                for b in c.buckets:
                    per_bucket[b] = [c.dir]
                    for _d, dead in wildcard:
                        dead.add(b)

        out: dict[str, tuple[str, set[int]]] = {}
        for d, dead in wildcard:
            out[d] = ("exclude", dead)
        for b, dirs in per_bucket.items():
            for d in dirs:
                mode, buckets = out.setdefault(d, ("include", set()))
                buckets.add(b)
        return out

    def expire_snapshots(self, keep_last: int = 10) -> list[str]:
        """Iceberg-style table maintenance (``expireSnapshots``): only the
        last ``keep_last`` snapshots stay time-travelable; data dirs
        referenced by NO retained snapshot are deleted from disk. Returns
        the deleted dirs. Reads at expired snapshot ids/tags raise — the
        Iceberg contract — while the commit log itself stays (metadata is
        tiny; lineage/tags remain inspectable). A long-running crawl calls
        this periodically so per-wave delta files don't accumulate
        forever once their snapshots are past the resume horizon."""
        import shutil

        cutoff = max(0, len(self.commits) - keep_last)
        live: set[str] = set()
        for c in self.commits[cutoff:]:
            live |= set(self._live_dirs(c.id).keys())
        deleted = []
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                if d not in live:
                    shutil.rmtree(os.path.join(data_root, d))
                    deleted.append(d)
        # Never lower an existing floor: a later call with a larger
        # keep_last must not re-admit snapshot ids whose data dirs were
        # already deleted (reads would then fail with raw missing-file
        # errors instead of the KeyError guard in read()).
        self.props["min_snapshot_id"] = max(
            int(self.props.get("min_snapshot_id", 0)), cutoff
        )
        self._flush()
        return deleted

    def read(self, snapshot_id: int | None = None, tag: str | None = None) -> DataFrame:
        if tag is not None:
            matches = [c.id for c in self.commits if c.tag == tag]
            if not matches:
                raise KeyError(f"no snapshot tagged {tag!r}")
            snapshot_id = matches[-1]
        min_id = int(self.props.get("min_snapshot_id", 0))
        if snapshot_id is not None and snapshot_id < min_id:
            raise KeyError(
                f"snapshot {snapshot_id} expired (oldest retained: {min_id}); "
                f"expire_snapshots removed its data files"
            )
        live = self._live_dirs(snapshot_id)
        dfs = []
        for rel, (mode, buckets) in live.items():
            df = self.spark.read.parquet(os.path.join(self.path, "data", rel))
            if mode == "include":
                df = df.filter(F.col("_bucket").isin(sorted(buckets)))
            elif buckets:  # exclude mode with superseded buckets
                df = df.filter(~F.col("_bucket").isin(sorted(buckets)))
            dfs.append(df.drop("_bucket"))
        if not dfs:
            raise ValueError("empty table read requires a schema; append first")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def is_empty(self) -> bool:
        return not self._live_dirs()

    def latest_tag(self, prefix: str) -> tuple[str, int] | None:
        for c in reversed(self.commits):
            if c.tag and c.tag.startswith(prefix):
                return c.tag, c.id
        return None

    def snapshot_ids(self) -> list[int]:
        return [c.id for c in self.commits]
