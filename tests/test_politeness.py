"""Politeness scheduler: per-host spacing ≥ crawl_delay, budget deferral
preserves per-host seq order, scheduling never changes the URL set."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators.politeness import split_by_budget, with_schedule


@pytest.fixture()
def wave(spark):
    rows = [
        ("h0.edu", f"https://h0.edu/p{i}", i + 1) for i in range(10)
    ] + [("h1.edu", f"https://h1.edu/p{i}", 100 + i) for i in range(4)]
    return spark.createDataFrame(rows, ["host", "url", "seq"])


@pytest.fixture()
def robots(spark):
    return spark.createDataFrame([("h0.edu", 2.0), ("h1.edu", None)], "host string, crawl_delay double")


def test_spacing_at_least_crawl_delay(spark, wave, robots):
    sched = with_schedule(wave, robots).collect()
    by_host = {}
    for r in sched:
        by_host.setdefault(r.host, []).append((r.slot, r.sched_time))
    for host, delay in (("h0.edu", 2.0), ("h1.edu", 1.0)):
        times = sorted(t for _, t in by_host[host])
        gaps = [b - a for a, b in zip(times, times[1:])]
        assert all(abs(g - delay) < 1e-9 for g in gaps), (host, gaps)


def test_slots_follow_seq(spark, wave, robots):
    sched = with_schedule(wave, robots)
    rows = sorted(((r.host, r.seq, r.slot) for r in sched.collect()))
    for host in ("h0.edu", "h1.edu"):
        host_rows = [(s, sl) for h, s, sl in rows if h == host]
        assert [sl for _, sl in sorted(host_rows)] == list(range(1, len(host_rows) + 1))


def test_budget_split_is_partition(spark, wave, robots):
    sched = with_schedule(wave, robots)
    now, deferred = split_by_budget(sched, budget_s=6.0)
    n_now, n_def = now.count(), deferred.count()
    assert n_now + n_def == wave.count()
    # h0 delay=2.0 & budget 6 -> slots with sched_time {0,2,4} fetch now
    assert now.filter(F.col("host") == "h0.edu").count() == 3
    # h1 delay=1.0 -> all 4 sched_times {0,1,2,3} < 6
    assert now.filter(F.col("host") == "h1.edu").count() == 4
    # deferral keeps the earliest seqs in 'now'
    max_now = now.filter(F.col("host") == "h0.edu").agg(F.max("seq")).first()[0]
    min_def = deferred.filter(F.col("host") == "h0.edu").agg(F.min("seq")).first()[0]
    assert max_now < min_def


def test_schedule_deterministic_on_seq_ties(spark):
    """Two sources sharing a host collide on seq: the slot must be
    deterministic ((source_id, url) tiebreakers), not row-order luck."""
    from course_scraper_spark.operators.politeness import with_schedule

    rows = [
        ("srcB", "https://h.edu/b", "h.edu", 1, 1),
        ("srcA", "https://h.edu/a", "h.edu", 1, 1),
        ("srcA", "https://h.edu/a2", "h.edu", 1, 2),
    ]
    df = spark.createDataFrame(rows, "source_id string, url string, host string, depth int, seq long")
    outs = []
    for _ in range(3):
        sched = with_schedule(df.repartition(4))
        outs.append(sorted((r.source_id, r.url, r.slot) for r in sched.collect()))
    assert outs[0] == outs[1] == outs[2]
    slots = {(sid, url): slot for sid, url, slot in outs[0]}
    # seq ties break by source_id then url: srcA/a=1, srcB/b=2, then seq 2
    assert slots[("srcA", "https://h.edu/a")] == 1
    assert slots[("srcB", "https://h.edu/b")] == 2
    assert slots[("srcA", "https://h.edu/a2")] == 3


def test_host_budget_ceiling(spark):
    from course_scraper_spark.operators.politeness import host_budget

    robots = spark.createDataFrame(
        [("fast.edu", 0.5), ("slow.edu", 2.0), ("default.edu", None)],
        "host string, crawl_delay double",
    )
    got = {r.host: r.max_urls_per_wave for r in host_budget(robots, wave_seconds=10.0).collect()}
    assert got == {"fast.edu": 20, "slow.edu": 5, "default.edu": 10}
