"""Budgeted priority-frontier crawl: politeness budgets delay fetches but
never drop them — the final seen set equals the unbudgeted BFS crawl;
per-host per-round fetch counts respect floor(budget / crawl_delay)."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators.frontier import crawl_sources, crawl_sources_budgeted


@pytest.fixture(scope="module")
def robots(spark, sources):
    hosts = [(s.root_url.split("/")[2], 1.0) for s in sources]
    return spark.createDataFrame(hosts, "host string, crawl_delay double")


def test_budgeted_seen_set_equals_bfs(spark, sources, pages, robots):
    bfs = crawl_sources(spark, sources, pages)
    budgeted = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=8.0
    )
    for s in sources:
        assert sorted(budgeted.seen_urls(s.source_id)) == bfs.seen_urls(s.source_id), s.source_id
    # tight budget means more rounds than BFS depth waves
    assert len(budgeted.metrics) > len(bfs.metrics)


def test_budget_caps_per_round(spark, sources, pages, robots):
    budgeted = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=3.0, max_rounds=2
    )
    # after 2 rounds with delay 1.0 and budget 3.0, at most
    # 1 (root) + 3 fetches/host/round of expansion happened per host —
    # the frontier kept the rest
    visited = budgeted.seen.filter(F.col("visited")).count()
    full = crawl_sources(spark, sources, pages).seen.filter(F.col("visited")).count()
    assert visited < full


def test_budgeted_resume_equals_uninterrupted(spark, sources, pages, robots, tmp_path):
    """Kill after round k, resume from the round checkpoint: final seen
    set identical to the uninterrupted budgeted run (north rule:
    resumable from checkpoint)."""
    from course_scraper_spark.storage.crawl_state import BudgetedStateStore

    full = crawl_sources_budgeted(spark, sources, pages, robots=robots, round_budget_s=8.0)

    store = BudgetedStateStore(spark, str(tmp_path / "bstate"), n_buckets=8)
    crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=8.0,
        state_store=store, max_rounds=2,
    )
    n_partial = store.read_seen().count()

    resumed = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=8.0,
        state_store=store, resume=True,
    )
    want = sorted((r.source_id, r.url) for r in full.seen.select("source_id", "url").collect())
    got = sorted((r.source_id, r.url) for r in resumed.seen.select("source_id", "url").collect())
    assert got == want
    assert len(got) > n_partial  # the kill actually cut it short


def _mixed_delay_world(spark):
    """include_external + heterogeneous delays: URL x is reachable at
    depth 2 via a slow host but gets discovered first at depth 3 (= the
    horizon) via a fast chain — without min-depth re-admission its child
    y is never seen."""
    def page(links):
        return "<html><body>" + "".join(f'<a href="{u}">l</a>' for u in links) + "</body></html>"

    S, FA = "https://slow.edu", "https://fast.edu"
    rows = [
        (f"{S}/", "slow.edu", page([f"{S}/d.html", f"{S}/e.html", f"{S}/a.html", f"{FA}/b.html"]), 200, "static"),
        (f"{S}/d.html", "slow.edu", page([]), 200, "static"),
        (f"{S}/e.html", "slow.edu", page([]), 200, "static"),
        (f"{S}/a.html", "slow.edu", page([f"{FA}/x.html"]), 200, "static"),
        (f"{FA}/b.html", "fast.edu", page([f"{FA}/c.html"]), 200, "static"),
        (f"{FA}/c.html", "fast.edu", page([f"{FA}/x.html"]), 200, "static"),
        (f"{FA}/x.html", "fast.edu", page([f"{FA}/y.html"]), 200, "static"),
        (f"{FA}/y.html", "fast.edu", page([]), 200, "static"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, host string, html string, status_code int, fetch_mode string"
    )
    # slow delay 10 ≫ fast 1 and > the 5s round budget: with the
    # cross-round cadence carry-over, slow.edu legitimately skips every
    # other round (10s between its fetches spans two 5s rounds)
    robots = spark.createDataFrame(
        [("slow.edu", 10.0), ("fast.edu", 1.0)], "host string, crawl_delay double"
    )
    from course_scraper_spark.config import SourceConfig

    src = SourceConfig(
        source_id="LOCAL_mixed", name="mixed", root_url=f"{S}/",
        include_external=True, crawl_depth=3,
    )
    return src, pages, robots


def test_budgeted_readmission_multi_host(spark):
    """The one remaining reference-semantics divergence from rounds 1-2:
    budgeted == BFS seen set even with include_external=True and mixed
    per-host delays, via min-depth re-admission."""
    src, pages, robots = _mixed_delay_world(spark)
    bfs = crawl_sources(spark, [src], pages)
    budgeted = crawl_sources_budgeted(
        spark, [src], pages, robots=robots, round_budget_s=5.0
    )
    assert budgeted.seen_urls("LOCAL_mixed") == bfs.seen_urls("LOCAL_mixed")
    assert "https://fast.edu/y.html" in bfs.seen_urls("LOCAL_mixed")


def test_budgeted_divergence_without_readmission(spark):
    """Negative control: with re-admission off, the fixture actually
    loses the horizon subtree — proving the test exercises the gap."""
    src, pages, robots = _mixed_delay_world(spark)
    off = crawl_sources_budgeted(
        spark, [src], pages, robots=robots, round_budget_s=5.0, readmit_min_depth=False
    )
    urls = off.seen_urls("LOCAL_mixed")
    assert "https://fast.edu/x.html" in urls      # discovered (deep) ...
    assert "https://fast.edu/y.html" not in urls  # ... but never expanded


def test_politeness_spacing_across_rounds(spark, sources, pages, robots):
    """The reference invariant end-to-end (render_utils.py:58 — sleep
    crawl_delay after EVERY fetch, never reset between waves): per-host
    absolute fetch times (round_start + sched_time) must be spaced
    >= crawl_delay across the WHOLE crawl, including round boundaries
    and carry-over."""
    budget = 3.0
    log = []
    crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=budget, schedule_log=log
    )
    assert log, "schedule_log must capture the fetch schedule"
    delays = {r.host: r.crawl_delay for r in robots.collect()}
    by_host = {}
    for rounds, host, url, sched_time in log:
        assert sched_time < budget  # nothing fetches past its round budget
        by_host.setdefault(host, []).append((rounds - 1) * budget + sched_time)
    multi = 0
    for host, times in by_host.items():
        times.sort()
        gaps = [b - a for a, b in zip(times, times[1:])]
        if gaps:
            multi += 1
            assert min(gaps) >= delays.get(host, 1.0) - 1e-9, (host, min(gaps))
    assert multi > 0  # the fixture actually exercises multi-fetch hosts


def test_politeness_spacing_mixed_delay_carryover(spark):
    """Carry-over regime (crawl_delay > round budget): the slow host's
    cadence must hold across skipped rounds too."""
    src, pages, robots = _mixed_delay_world(spark)
    budget = 5.0
    log = []
    crawl_sources_budgeted(
        spark, [src], pages, robots=robots, round_budget_s=budget, schedule_log=log
    )
    delays = {r.host: r.crawl_delay for r in robots.collect()}
    by_host = {}
    for rounds, host, url, sched_time in log:
        by_host.setdefault(host, []).append((rounds - 1) * budget + sched_time)
    slow = sorted(by_host["slow.edu"])
    assert len(slow) >= 2  # root + at least one more slow fetch
    gaps = [b - a for a, b in zip(slow, slow[1:])]
    assert min(gaps) >= delays["slow.edu"] - 1e-9
    fast_gaps = [
        b - a for a, b in zip(sorted(by_host["fast.edu"]), sorted(by_host["fast.edu"])[1:])
    ]
    assert min(fast_gaps) >= delays["fast.edu"] - 1e-9


def test_budgeted_copartitioned_seen_equality(spark, sources, pages, robots):
    """Forcing the co-partitioned seen store in the budgeted loop must
    reproduce the default path's final seen set exactly."""
    base = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=8.0, copartition_seen=False
    )
    stored = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=8.0, copartition_seen=True
    )
    canon = lambda r: sorted(
        (x.source_id, x.url, x.depth, x.seq, x.visited)
        for x in r.seen.select("source_id", "url", "depth", "seq", "visited").collect()
    )
    assert canon(stored) == canon(base)


def test_compose_all_features_equality(spark, tmp_path):
    """Round-5 cross-feature interaction gate: seen store FORCED ON +
    salting + fused HTTP fetch + in-band metrics + cadence carry-over +
    min-depth re-admission, all SIMULTANEOUSLY, must still reproduce the
    unbudgeted BFS seen set exactly (features were previously only
    pairwise-tested; the AQE-checkpoint gotcha was exactly the kind of
    cross-feature bug this catches). A 100k-world variant runs in
    tools/compose_check.py for the scaling evidence."""
    from course_scraper_spark.operators.fetch import NO_SLEEP, world_transport_factory
    from course_scraper_spark.operators.metrics import MetricsStore
    from course_scraper_spark.synth.world import WorldSpec, build_pages, build_sources

    spec = WorldSpec(n_hosts=5, total_pages=400, branching=5, extra_links=2)
    pages = spark.createDataFrame(build_pages(spec)).cache()
    sources = build_sources(spec)
    hosts = [(s.root_url.split("/")[2], 1.0) for s in sources]
    robots = spark.createDataFrame(hosts, "host string, crawl_delay double")

    oracle = crawl_sources(spark, sources, pages, copartition_seen=False)

    mstore = MetricsStore(spark, str(tmp_path / "compose_metrics"))
    composed = crawl_sources_budgeted(
        spark,
        sources,
        pages,
        robots=robots,
        round_budget_s=4.0,
        copartition_seen=True,               # store forced on from round 0
        salt_hosts_threshold=10,             # salting engages on every host
        fetch="http",                        # fused ladder + in-band stats
        transport_factory=world_transport_factory(pages),
        fetch_kwargs={"sleep_fn": NO_SLEEP},
        metrics_store=mstore,
        run_id="compose",
        readmit_min_depth=True,
    )
    want = sorted((r.source_id, r.url) for r in oracle.seen.select("source_id", "url").collect())
    got = sorted((r.source_id, r.url) for r in composed.seen.select("source_id", "url").collect())
    assert got == want
    # the in-band stats really landed (exact per-host totals vs the
    # join-path mirror are pinned in test_fetch_http): rounds recorded,
    # hosts real, counters coherent
    stats = mstore.partition_metrics.read().filter(F.col("run_id") == "compose")
    assert stats.count() > 0
    world_hosts = {h for h, _ in hosts}
    assert {r.host for r in stats.select("host").distinct().collect()} <= world_hosts
    assert stats.filter(F.col("n_fetch_ok") > F.col("n_urls")).count() == 0
    assert stats.agg(F.sum("n_urls")).first()[0] >= len(sources)  # roots fetched
