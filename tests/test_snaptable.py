"""Snapshot-table semantics: append/overwrite/merge commits, time travel,
tags, bucket-scoped merge rewrites."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.storage.snaptable import SnapshotTable


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t1"))
    s1 = t.append(spark.createDataFrame([(1, "a")], ["id", "v"]), tag="first")
    s2 = t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    assert rows(t.read()) == [(1, "a"), (2, "b")]
    assert rows(t.read(snapshot_id=s1)) == [(1, "a")]
    assert rows(t.read(tag="first")) == [(1, "a")]
    assert s2 > s1


def test_overwrite_replaces_everything(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t2"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.overwrite(spark.createDataFrame([(9, "z")], ["id", "v"]))
    assert rows(t.read()) == [(9, "z")]


def test_merge_upsert_semantics(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t3"))
    t.append(spark.createDataFrame([(1, "a", "old"), (2, "b", "keep")], ["id", "k", "v"]))
    src = spark.createDataFrame([(1, "a", "new"), (3, "c", "ins")], ["id", "k", "v"])
    t.merge(src, on=["id"], update_cols=["v"], insert=True)
    assert rows(t.read()) == [(1, "a", "new"), (2, "b", "keep"), (3, "c", "ins")]


def test_merge_insert_only(spark, tmp_path):
    # K1 semantics: WHEN NOT MATCHED INSERT, matched rows untouched
    t = SnapshotTable.create(spark, str(tmp_path / "t4"))
    t.append(spark.createDataFrame([(1, "orig")], ["id", "v"]))
    t.merge(spark.createDataFrame([(1, "CHANGED"), (2, "new")], ["id", "v"]), on=["id"], update_cols=[], insert=True)
    assert rows(t.read()) == [(1, "orig"), (2, "new")]


def test_merge_update_only(spark, tmp_path):
    # K2 semantics: WHEN MATCHED UPDATE, no inserts
    t = SnapshotTable.create(spark, str(tmp_path / "t5"))
    t.append(spark.createDataFrame([(1, True), (2, True)], ["id", "flag"]))
    t.merge(spark.createDataFrame([(2, False), (99, False)], ["id", "flag"]), on=["id"], update_cols=["flag"], insert=False)
    assert rows(t.read()) == [(1, True), (2, False)]


def test_bucketed_merge_touches_only_source_buckets(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t6"), bucket_col="host", n_buckets=8)
    base = spark.createDataFrame(
        [(f"h{i}.edu", f"u{i}", 0) for i in range(40)], ["host", "url", "n"]
    )
    t.append(base)
    src = spark.createDataFrame([("h3.edu", "u3", 99), ("h3.edu", "uNEW", 1)], ["host", "url", "n"])
    cid = t.merge(src, on=["host", "url"], update_cols=["n"], insert=True)
    commit = t.commits[cid]
    assert commit.op == "merge"
    assert commit.buckets is not None and len(commit.buckets) < 8  # scoped rewrite
    out = {(r.host, r.url): r.n for r in t.read().collect()}
    assert out[("h3.edu", "u3")] == 99
    assert out[("h3.edu", "uNEW")] == 1
    assert len(out) == 41
    assert out[("h7.edu", "u7")] == 0


def test_persistence_across_instances(spark, tmp_path):
    p = str(tmp_path / "t7")
    t = SnapshotTable.create(spark, p)
    t.append(spark.createDataFrame([(1,)], ["id"]), tag="w0")
    t2 = SnapshotTable(spark, p)
    assert rows(t2.read()) == [(1,)]
    assert t2.latest_tag("w")[0] == "w0"


def test_overwrite_then_scoped_merge_no_duplicates(spark, tmp_path):
    """Regression: a bucket-scoped merge after an overwrite must EXCLUDE
    the touched buckets from the overwrite dir at read time — otherwise
    those buckets' rows are read from both dirs and duplicated."""
    t = SnapshotTable.create(spark, str(tmp_path / "t8"), bucket_col="host", n_buckets=8)
    t.append(spark.createDataFrame([("seed.edu", "s", 0)], ["host", "url", "n"]))
    base = spark.createDataFrame(
        [(f"h{i}.edu", f"u{i}", 0) for i in range(40)], ["host", "url", "n"]
    )
    t.overwrite(base)
    src = spark.createDataFrame([("h3.edu", "u3", 99), ("h3.edu", "uNEW", 1)], ["host", "url", "n"])
    t.merge(src, on=["host", "url"], update_cols=["n"], insert=True)
    got = [(r.host, r.url, r.n) for r in t.read().collect()]
    assert len(got) == len(set(got)) == 41, "no duplicated rows after overwrite->merge"
    out = dict(((h, u), n) for h, u, n in got)
    assert out[("h3.edu", "u3")] == 99 and out[("h3.edu", "uNEW")] == 1
    assert ("seed.edu", "s") not in out
    # untouched buckets still served from the overwrite dir
    assert out[("h7.edu", "u7")] == 0


def test_overwrite_merge_time_travel_still_exact(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t9"), bucket_col="host", n_buckets=4)
    base = spark.createDataFrame([(f"h{i}.edu", i) for i in range(12)], ["host", "n"])
    cid_ow = t.overwrite(base)
    t.merge(
        spark.createDataFrame([("h1.edu", 100)], ["host", "n"]),
        on=["host"], update_cols=["n"], insert=True,
    )
    # snapshot at the overwrite still reads the pre-merge values, once each
    old = [(r.host, r.n) for r in t.read(snapshot_id=cid_ow).collect()]
    assert sorted(old) == sorted((f"h{i}.edu", i) for i in range(12))


def test_expire_snapshots(spark, tmp_path):
    """Iceberg-style maintenance: expired snapshots' unique data dirs are
    deleted from disk, their reads raise, retained history still works."""
    import os

    from course_scraper_spark.storage.snaptable import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "exp"), bucket_col="host", n_buckets=4)
    mk = lambda i: spark.createDataFrame([(f"h{i}.edu", f"u{i}")], ["host", "url"])
    ids = [t.append(mk(i), tag=f"s{i}") for i in range(5)]
    t.overwrite(mk(99), tag="cut")  # makes the first appends' dirs dead
    t.append(mk(100), tag="tail")
    n_dirs_before = len(os.listdir(os.path.join(t.path, "data")))

    deleted = t.expire_snapshots(keep_last=2)  # retain only cut+tail... last 2 commits
    assert deleted  # the pre-overwrite append dirs are gone from disk
    n_dirs_after = len(os.listdir(os.path.join(t.path, "data")))
    assert n_dirs_after < n_dirs_before

    # latest read unaffected
    rows = sorted((r.host, r.url) for r in t.read().collect())
    assert rows == [("h100.edu", "u100"), ("h99.edu", "u99")]
    # retained time travel works; expired raises
    assert sorted(r.url for r in t.read(tag="tail").collect()) == ["u100", "u99"]
    import pytest as _pytest

    with _pytest.raises(KeyError, match="expired"):
        t.read(snapshot_id=ids[0])
    with _pytest.raises(KeyError, match="expired"):
        t.read(tag="s0")
    # a reloaded handle enforces the same horizon (persisted in the log)
    t2 = SnapshotTable(spark, t.path)
    with _pytest.raises(KeyError, match="expired"):
        t2.read(tag="s2")
