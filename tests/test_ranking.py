"""Two-phase scalable ranking == naive global sort enumerate."""

from course_scraper_spark.operators.ranking import assign_seq


def test_assign_seq_matches_naive(spark):
    rows = [
        (g, ps, lp)
        for g in ("a", "b", "c")
        for ps in range(7)
        for lp in range(11)
        if (hash((g, ps, lp)) % 3) != 0
    ]
    df = spark.createDataFrame(rows, ["g", "parent_seq", "link_pos"])
    out = assign_seq(df, "g", ["parent_seq", "link_pos"], num_partitions=5)
    got = {(r.g, r.parent_seq, r.link_pos): r.seq for r in out.collect()}
    for g in ("a", "b", "c"):
        expected = sorted([(ps, lp) for (gg, ps, lp) in rows if gg == g])
        for i, (ps, lp) in enumerate(expected, start=1):
            assert got[(g, ps, lp)] == i


def test_assign_seq_big_path_pid_stable(spark):
    """Force the two-phase (big-input) path and verify seq is a dense
    permutation per group across repeated runs.

    Regression: repartitionByRange samples boundaries per ACTION, so without
    pinning the partitioning, the counts job and the ranking job could see
    different _pid assignments → duplicate/skipped seq values."""
    from course_scraper_spark.operators.ranking import assign_seq_with_totals

    rows = [
        (g, ps, lp)
        for g in ("a", "b")
        for ps in range(40)
        for lp in range(50)
    ]
    df = spark.createDataFrame(rows, ["g", "parent_seq", "link_pos"]).repartition(16)
    for _ in range(3):
        out, totals = assign_seq_with_totals(
            df, "g", ["parent_seq", "link_pos"], num_partitions=7, small_threshold=0
        )
        got = {}
        for r in out.collect():
            got.setdefault(r.g, []).append(((r.parent_seq, r.link_pos), r.seq))
        assert totals == {"a": 2000, "b": 2000}
        for g, pairs in got.items():
            pairs.sort()
            seqs = [s for _, s in pairs]
            assert seqs == list(range(1, len(pairs) + 1)), f"group {g} not dense"


def test_assign_seq_single_group_many_partitions(spark):
    rows = [("x", i, 0) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "parent_seq", "link_pos"])
    out = assign_seq(df, "g", ["parent_seq", "link_pos"], num_partitions=8)
    got = sorted((r.parent_seq, r.seq) for r in out.collect())
    assert got == [(i, i + 1) for i in range(500)]


def test_assign_seq_lazy_equals_with_totals(spark):
    """Round-5 fold: the lazy form must rank identically to the
    totals-collecting form on BOTH strategies (window small path and
    two-phase big path forced via est_rows), since the crawl loops now
    derive totals from the materialized delta instead."""
    from pyspark.sql import functions as F

    from course_scraper_spark.operators.ranking import (
        assign_seq_lazy,
        assign_seq_with_totals,
    )

    df = spark.range(3000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") * 37 % 1000).alias("k1"),
        F.col("id").alias("k2"),
    )
    want, totals = assign_seq_with_totals(df, "g", ["k1", "k2"], seq_col="s")
    want_rows = sorted(map(tuple, want.collect()))
    assert sum(totals.values()) == 3000

    small = assign_seq_lazy(df, "g", ["k1", "k2"], seq_col="s", est_rows=100)
    assert sorted(map(tuple, small.collect())) == want_rows

    big = assign_seq_lazy(df, "g", ["k1", "k2"], seq_col="s", est_rows=10**7)
    assert sorted(map(tuple, big.collect())) == want_rows
