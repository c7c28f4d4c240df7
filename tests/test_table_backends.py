"""Backend-parameterized snapshot-table contract: the parquet emulation
(`SnapshotTable`, always) and the real Iceberg adapter (`IcebergTable`,
iff the runtime jar + a catalog are configured — skipped cleanly in the
jarless sandbox). Both must satisfy the same append / overwrite / merge
/ time-travel / tag / expire semantics the engine's storage layer
relies on (reference: src/storage.py:227-298)."""

import uuid

import pytest

from course_scraper_spark.storage.iceberg import IcebergTable, iceberg_available
from course_scraper_spark.storage.snaptable import SnapshotTable


def rows(df):
    return sorted(tuple(r) for r in df.collect())


class SnapBackend:
    name = "snaptable"

    def __init__(self, spark, tmp_path):
        self.spark, self.tmp = spark, tmp_path

    def make(self, name, bucket_col=None, n_buckets=16):
        return SnapshotTable.create(
            self.spark, str(self.tmp / name), bucket_col=bucket_col, n_buckets=n_buckets
        )

    def reopen(self, t):
        return SnapshotTable(self.spark, t.path)


class IcebergBackend:
    name = "iceberg"

    def __init__(self, spark):
        self.spark = spark
        confs = dict(spark.sparkContext.getConf().getAll())
        cats = sorted(
            k.split(".")[3]
            for k in confs
            if k.startswith("spark.sql.catalog.") and k.count(".") == 3
        )
        self.catalog = cats[0]
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.contract_db")

    def make(self, name, bucket_col=None, n_buckets=16):
        ident = f"{self.catalog}.contract_db.{name}_{uuid.uuid4().hex[:8]}"
        return IcebergTable.create(
            self.spark, ident, bucket_col=bucket_col, n_buckets=n_buckets
        )

    def reopen(self, t):
        return IcebergTable(self.spark, t.ident)


@pytest.fixture(params=["snaptable", "iceberg"])
def backend(request, spark, tmp_path):
    if request.param == "snaptable":
        return SnapBackend(spark, tmp_path)
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar / catalog not configured in this environment")
    return IcebergBackend(spark)


def test_append_time_travel_and_tags(backend, spark):
    t = backend.make("tt")
    s1 = t.append(spark.createDataFrame([(1, "a")], ["id", "v"]), tag="first")
    s2 = t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    assert s2 != s1
    assert rows(t.read()) == [(1, "a"), (2, "b")]
    assert rows(t.read(snapshot_id=s1)) == [(1, "a")]
    assert rows(t.read(tag="first")) == [(1, "a")]


def test_overwrite_replaces_everything(backend, spark):
    t = backend.make("ow")
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.overwrite(spark.createDataFrame([(9, "z")], ["id", "v"]))
    assert rows(t.read()) == [(9, "z")]


def test_merge_upsert(backend, spark):
    t = backend.make("up")
    t.append(spark.createDataFrame([(1, "a", "old"), (2, "b", "keep")], ["id", "k", "v"]))
    src = spark.createDataFrame([(1, "a", "new"), (3, "c", "ins")], ["id", "k", "v"])
    t.merge(src, on=["id"], update_cols=["v"], insert=True)
    assert rows(t.read()) == [(1, "a", "new"), (2, "b", "keep"), (3, "c", "ins")]


def test_merge_insert_only_K1(backend, spark):
    t = backend.make("k1")
    t.append(spark.createDataFrame([(1, "orig")], ["id", "v"]))
    t.merge(
        spark.createDataFrame([(1, "CHANGED"), (2, "new")], ["id", "v"]),
        on=["id"], update_cols=[], insert=True,
    )
    assert rows(t.read()) == [(1, "orig"), (2, "new")]


def test_merge_update_only_K2(backend, spark):
    t = backend.make("k2")
    t.append(spark.createDataFrame([(1, True), (2, True)], ["id", "flag"]))
    t.merge(
        spark.createDataFrame([(2, False), (99, False)], ["id", "flag"]),
        on=["id"], update_cols=["flag"], insert=False,
    )
    assert rows(t.read()) == [(1, True), (2, False)]


def test_bucketed_merge_correct(backend, spark):
    t = backend.make("bk", bucket_col="host", n_buckets=8)
    base = spark.createDataFrame(
        [(f"h{i}.edu", f"u{i}", 0) for i in range(40)], ["host", "url", "n"]
    )
    t.append(base)
    src = spark.createDataFrame(
        [("h3.edu", "u3", 99), ("h3.edu", "uNEW", 1)], ["host", "url", "n"]
    )
    t.merge(src, on=["host", "url"], update_cols=["n"], insert=True)
    out = {(r.host, r.url): r.n for r in t.read().collect()}
    assert out[("h3.edu", "u3")] == 99 and out[("h3.edu", "uNEW")] == 1
    assert len(out) == 41 and out[("h7.edu", "u7")] == 0


def test_persistence_across_handles(backend, spark):
    t = backend.make("ph")
    t.append(spark.createDataFrame([(1,)], ["id"]), tag="w0")
    t2 = backend.reopen(t)
    assert rows(t2.read()) == [(1,)]
    assert t2.latest_tag("w")[0] == "w0"


def test_expire_snapshots_contract(backend, spark):
    t = backend.make("exp", bucket_col="host", n_buckets=4)
    mk = lambda i: spark.createDataFrame([(f"h{i}.edu", f"u{i}")], ["host", "url"])
    early = t.append(mk(0), tag="s0")
    for i in range(1, 5):
        t.append(mk(i), tag=f"s{i}")
    t.overwrite(mk(99), tag="cut")
    t.append(mk(100), tag="tail")
    t.expire_snapshots(keep_last=2)
    # latest read unaffected; retained tag still travels; expired raises
    assert sorted(r.url for r in t.read().collect()) == ["u100", "u99"]
    assert sorted(r.url for r in t.read(tag="tail").collect()) == ["u100", "u99"]
    with pytest.raises(KeyError):
        t.read(snapshot_id=early)


def test_last_commit_tally(backend, spark):
    """A6 insert/update tally through the backend interface: the
    emulation computes exact counts from the merge join; on Iceberg the
    inserted count comes exactly from the snapshot summary
    (added-records − deleted-records) while updated is the
    copy-on-write file-level bound (≥ true updates) — both documented
    in last_commit_tally's contract."""
    t = backend.make("tally")
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"]))
    assert t.last_commit_tally() == (3, 0)

    # upsert: id 2,3 match (updated), id 4,5 new (inserted)
    src = spark.createDataFrame([(2, "B"), (3, "C"), (4, "d"), (5, "e")], ["id", "v"])
    t.merge(src, on=["id"])
    ins, upd = t.last_commit_tally()
    assert ins == 2
    if backend.name == "snaptable":
        assert upd == 2          # exact in the emulation
    else:
        assert upd >= 2          # CoW file-level upper bound

    # insert-only MERGE (K1): no WHEN MATCHED clause -> zero updates
    src2 = spark.createDataFrame([(5, "x"), (6, "f")], ["id", "v"])
    t.merge(src2, on=["id"], update_cols=[])
    ins2, upd2 = t.last_commit_tally()
    assert ins2 == 1
    if backend.name == "snaptable":
        assert upd2 == 0
