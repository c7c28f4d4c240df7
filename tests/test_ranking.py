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


def test_assign_seq_single_group_many_partitions(spark):
    rows = [("x", i, 0) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "parent_seq", "link_pos"])
    out = assign_seq(df, "g", ["parent_seq", "link_pos"], num_partitions=8)
    got = sorted((r.parent_seq, r.seq) for r in out.collect())
    assert got == [(i, i + 1) for i in range(500)]
