"""Real Apache Iceberg backend for the engine's snapshot tables.

`snaptable.SnapshotTable` emulates Iceberg semantics over plain parquet
because this sandbox ships no Iceberg runtime jar. THIS module is the
production binding: the same interface (append / overwrite / merge /
read / tags / expire_snapshots) issued as real Iceberg operations
against a configured Spark catalog — the storage design the north rule
names ("Iceberg tables ... explicit hash-partitioning on host").

Mapping (reference semantics: /root/reference/src/storage.py:227-298 —
K1 insert-only MERGE, K2 update-only MERGE, K6 upsert MERGE):

=====================  =====================================================
engine call            Iceberg operation
=====================  =====================================================
create(bucket_col=h)   CREATE TABLE ... USING iceberg
                       PARTITIONED BY (bucket(n, h))      [lazy, first write]
append(df, tag)        df.writeTo(t).append(); ALTER TABLE t CREATE TAG ...
overwrite(df, tag)     df.writeTo(t).using("iceberg").replace()   [atomic RTAS]
merge(src, on, ...)    MERGE INTO t USING s ON t.k <=> s.k
                       [WHEN MATCHED THEN UPDATE SET ...]
                       [WHEN NOT MATCHED THEN INSERT *]
read(snapshot_id=...)  spark.read.option("snapshot-id", ...).table(t)
read(tag=...)          SELECT * FROM t VERSION AS OF 'tag'
expire_snapshots(k)    CALL cat.system.expire_snapshots(retain_last => k,
                       older_than => now)
=====================  =====================================================

The bucket-scoped rewrite the emulation implements by hand (only the
buckets present in a MERGE source are rewritten) is NATIVE here:
Iceberg's copy-on-write MERGE rewrites only the data files whose rows
match, and ``bucket(n, host)`` partitioning confines a wave's MERGE to
the host buckets in that wave. Likewise the co-partitioned seen
anti-join: both sides of a bucketed-table join report compatible
storage partitioning, so the growing seen side never reshuffles
(storage-partitioned joins, spark.sql.sources.v2.bucketing.enabled).

Availability is detected at runtime (:func:`iceberg_available`);
tests/test_table_backends.py parameterizes the contract suite over both
backends and skips this one cleanly when the jar is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ICEBERG_EXTENSION = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def iceberg_available(spark: SparkSession, catalog: str | None = None) -> bool:
    """True iff the Iceberg runtime jar is on the JVM classpath AND a
    Spark catalog is configured (``spark.sql.catalog.<name>``). Both are
    required: the jar supplies MERGE INTO / time travel / procedures,
    the catalog supplies the table namespace."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_EXTENSION)  # noqa: SLF001
    except Exception:
        return False
    prefix = f"spark.sql.catalog.{catalog}" if catalog else "spark.sql.catalog."
    try:
        confs = dict(spark.sparkContext.getConf().getAll())
    except Exception:
        return False
    return any(k.startswith(prefix) for k in confs)


class IcebergTable:
    """Drop-in production twin of ``snaptable.SnapshotTable``.

    ``ident`` is a fully-qualified catalog identifier
    (``catalog.db.table``). Snapshot ids are Iceberg's (random longs,
    NOT sequential — order by history, not by id). The table is created
    lazily on the first write so the schema comes from the data, like
    the emulation."""

    def __init__(self, spark: SparkSession, ident: str):
        if ident.count(".") < 2:
            raise ValueError(
                f"ident must be catalog.db.table, got {ident!r} "
                "(the expire/maintenance procedures need the catalog name)"
            )
        self.spark = spark
        self.ident = ident
        self.catalog, self.namespace, self.table = ident.split(".", 2)
        self.props: dict = {"bucket_col": None, "n_buckets": 16}

    # -- creation ----------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        ident: str,
        bucket_col: str | None = None,
        n_buckets: int = 16,
    ) -> "IcebergTable":
        t = cls(spark, ident)
        t.props = {"bucket_col": bucket_col, "n_buckets": n_buckets}
        return t

    def _exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def _writer(self, df: DataFrame):
        w = df.writeTo(self.ident).using("iceberg").tableProperty("format-version", "2")
        bc = self.props.get("bucket_col")
        if bc is not None:
            w = w.partitionedBy(F.bucket(int(self.props["n_buckets"]), F.col(bc)))
        return w

    def _current_snapshot_id(self) -> int:
        # Read the main branch HEAD from the refs metadata table, not the
        # latest row of `.snapshots`: snapshot ids are random longs and
        # committed_at has millisecond granularity, so two rapid commits
        # in the same millisecond make an ORDER BY committed_at pick
        # nondeterministically — the refs pointer is the authoritative
        # current snapshot.
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.refs "
            "WHERE name = 'main' AND type = 'BRANCH'"
        ).first()
        if row is None:
            raise ValueError(f"{self.ident} has no snapshots")
        return int(row.snapshot_id)

    def _tag(self, tag: str | None) -> None:
        if tag is not None:
            self.spark.sql(f"ALTER TABLE {self.ident} CREATE OR REPLACE TAG `{tag}`")

    # -- writes ------------------------------------------------------------
    def append(self, df: DataFrame, tag: str | None = None, meta: dict | None = None) -> int:
        if self._exists():
            df.writeTo(self.ident).append()
        else:
            self._writer(df).create()
        self._tag(tag)
        return self._current_snapshot_id()

    def overwrite(self, df: DataFrame, tag: str | None = None, meta: dict | None = None) -> int:
        # atomic replace-table-as-select: full overwrite in one commit
        self._writer(df).createOrReplace()
        self._tag(tag)
        return self._current_snapshot_id()

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        update_cols: list[str] | None = None,
        insert: bool = True,
        tag: str | None = None,
    ) -> int:
        """MERGE INTO with the emulation's exact semantics: null-safe
        match on ``on``; update_cols=None updates every column on match,
        [] updates none (K1 insert-only); insert=False is K2
        update-only. Iceberg's copy-on-write rewrites only matched data
        files — with bucket partitioning, only the touched buckets."""
        if not self._exists():
            if not insert:
                raise ValueError("update-only merge into a non-existent table")
            return self.append(source, tag=tag)
        cols = self.spark.table(self.ident).columns
        view = f"__merge_src_{abs(hash(self.ident)) % 10**8}"
        source.select(*cols).createOrReplaceTempView(view)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in on)
        upd = cols if update_cols is None else update_cols
        clauses = []
        if upd:
            sets = ", ".join(f"t.{c} = s.{c}" for c in upd)
            clauses.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
        if insert:
            clauses.append("WHEN NOT MATCHED THEN INSERT *")
        if not clauses:
            raise ValueError("merge with update_cols=[] and insert=False is a no-op")
        try:
            self.spark.sql(
                f"MERGE INTO {self.ident} t USING {view} s ON {cond} " + " ".join(clauses)
            )
        finally:
            # a failed MERGE must not leak the temp view (the name is
            # derived from the ident, so a leaked view also shadows the
            # next merge's source)
            self.spark.catalog.dropTempView(view)
        self._tag(tag)
        return self._current_snapshot_id()

    def last_commit_tally(self) -> tuple[int, int]:
        """(inserted, updated) row counts of the latest commit from the
        current snapshot's native summary — the A6 tally without the
        emulation's precompute join. Copy-on-write MERGE rewrites whole
        files: ``deleted-records`` counts every row of the replaced
        files (updated rows AND unchanged rows carried over) and
        ``added-records`` counts the rewritten rows plus the genuinely
        new ones, so ``inserted = added - deleted`` is EXACT while
        ``updated = deleted-records`` is an upper bound (tight when the
        merge touches most rows of each rewritten file; with
        ``bucket(n, host)`` partitioning a wave's merge touches exactly
        its hosts' files, keeping the bound close). Exact per-row
        updated counts need the changelog procedure
        (``create_changelog_view``); callers that require exactness use
        the precompute join in operators/merge.py."""
        row = self.spark.sql(
            f"SELECT summary FROM {self.ident}.snapshots "
            f"WHERE snapshot_id = {self._current_snapshot_id()}"
        ).first()
        if row is None:
            raise ValueError(f"{self.ident} has no snapshots")
        summary = dict(row.summary)
        added = int(summary.get("added-records", 0))
        deleted = int(summary.get("deleted-records", 0))
        return max(0, added - deleted), deleted

    # -- reads -------------------------------------------------------------
    def read(self, snapshot_id: int | None = None, tag: str | None = None) -> DataFrame:
        try:
            if tag is not None:
                return self.spark.sql(f"SELECT * FROM {self.ident} VERSION AS OF '{tag}'")
            if snapshot_id is not None:
                return (
                    self.spark.read.option("snapshot-id", snapshot_id).table(self.ident)
                )
            return self.spark.table(self.ident)
        except Exception as e:
            # Contract error ONLY for the expired/unknown-snapshot cases;
            # genuine failures (permissions, network, bad SQL) propagate
            # untouched instead of masquerading as a missing snapshot.
            # Round 6 (advice): the previous blanket
            # isinstance(AnalysisException) test also caught dropped-
            # table / bad-column / permission AnalysisExceptions — only
            # the snapshot-specific message markers (and only when a
            # snapshot/tag was actually requested) qualify now.
            msg = str(e)
            snapshotish = (snapshot_id is not None or tag is not None) and any(
                marker in msg
                for marker in (
                    "Cannot find snapshot",
                    "Cannot find matching snapshot",
                    "snapshot-id",
                    "VERSION AS OF",
                )
            )
            if not snapshotish:
                raise
            raise KeyError(
                f"snapshot/tag not readable on {self.ident} "
                f"(expired or unknown): {e}"
            ) from e

    def is_empty(self) -> bool:
        return (not self._exists()) or self.spark.table(self.ident).head(1) == []

    def latest_tag(self, prefix: str) -> tuple[str, int] | None:
        rows = self.spark.sql(
            f"""
            SELECT r.name, r.snapshot_id
            FROM {self.ident}.refs r
            JOIN {self.ident}.snapshots s ON r.snapshot_id = s.snapshot_id
            WHERE r.type = 'TAG' AND r.name LIKE '{prefix}%'
            ORDER BY s.committed_at DESC, r.name DESC
            LIMIT 1
            """
        ).collect()
        if not rows:
            return None
        return rows[0].name, int(rows[0].snapshot_id)

    def snapshot_ids(self) -> list[int]:
        return [
            int(r.snapshot_id)
            for r in self.spark.sql(
                f"SELECT snapshot_id FROM {self.ident}.snapshots ORDER BY committed_at"
            ).collect()
        ]

    # -- maintenance -------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 10) -> list[str]:
        """``CALL catalog.system.expire_snapshots`` — retains the last
        ``keep_last`` snapshots, deletes data files no retained snapshot
        references (the emulation's disk-reclaim behavior). Returns the
        affected counts as strings (Iceberg reports counts, not dir
        names)."""
        out = self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self.namespace}.{self.table}', "
            f"older_than => current_timestamp(), "
            f"retain_last => {int(keep_last)})"
        ).collect()
        return [str(tuple(r)) for r in out]
