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
