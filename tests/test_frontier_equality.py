"""Crawl-equality: the Spark wave-loop frontier reproduces the reference
BFS exactly — final sorted seen set (crawler.py:63), exact visit order,
per-URL depth — for every source in the fixture world, including the
Modern-Campus branch, fetch failures, depth guards and scope overrides."""

import pytest

from course_scraper_spark.operators.frontier import crawl_sources
from course_scraper_spark.oracle.crawl import PageStore, oracle_crawl


@pytest.fixture(scope="module")
def crawl_result(spark, sources, pages):
    return crawl_sources(spark, sources, pages)


@pytest.fixture(scope="module")
def store(pages_pdf):
    return PageStore(pages_pdf)


def test_no_failed_sources(crawl_result):
    assert crawl_result.failed_sources == []


def test_seen_set_equality(crawl_result, sources, store):
    for s in sources:
        oracle = oracle_crawl(s, store)
        assert crawl_result.seen_urls(s.source_id) == oracle.seen_sorted, s.source_id


def test_visit_order_equality(crawl_result, sources, store):
    for s in sources:
        oracle = oracle_crawl(s, store)
        assert crawl_result.visit_order(s.source_id) == oracle.visit_order, s.source_id


def test_mc_previews_not_visited(crawl_result, sources, store):
    mc = [s for s in sources if "mc-catalog" in s.root_url]
    assert mc, "fixture must include a Modern-Campus host"
    s = mc[0]
    oracle = oracle_crawl(s, store)
    visited = {u for u, _ in oracle.visit_order}
    previews = [u for u in oracle.seen_sorted if "preview_course_nopop.php" in u]
    assert previews, "MC host must yield preview URLs"
    assert not visited & set(previews)
    got_seen = set(crawl_result.seen_urls(s.source_id))
    assert set(previews) <= got_seen


def test_bloom_prefiltered_crawl_identical(spark, sources, pages, crawl_result):
    """The bloom sidecar is a pure prefilter: the crawl result is
    bit-identical with it on."""
    with_bloom = crawl_sources(spark, sources, pages, use_bloom=True, bloom_buckets=16)
    for s in sources:
        assert with_bloom.seen_urls(s.source_id) == crawl_result.seen_urls(s.source_id)
        assert with_bloom.visit_order(s.source_id) == crawl_result.visit_order(s.source_id)


def test_cuckoo_prefiltered_crawl_identical(spark, sources, pages, crawl_result):
    """Same contract with the deletable cuckoo sidecar swapped in."""
    with_cuckoo = crawl_sources(spark, sources, pages, use_filter="cuckoo", bloom_buckets=16)
    for s in sources:
        assert with_cuckoo.seen_urls(s.source_id) == crawl_result.seen_urls(s.source_id)
        assert with_cuckoo.visit_order(s.source_id) == crawl_result.visit_order(s.source_id)


def test_failed_fetches_stay_in_seen(crawl_result, sources, store):
    any_failed = False
    for s in sources:
        oracle = oracle_crawl(s, store)
        if oracle.failed:
            any_failed = True
            assert set(oracle.failed) <= set(crawl_result.seen_urls(s.source_id))
    assert any_failed, "fixture should exercise the fetch-failure path"


def test_copartitioned_seen_store_equality(spark, sources, pages):
    """Forcing the co-partitioned seen store from wave 0 must reproduce
    the default path exactly — seen set, depths, seqs, previews (the
    anti-join chain over partitioned deltas == anti-join vs the union)."""
    from course_scraper_spark.operators.frontier import crawl_sources

    base = crawl_sources(spark, sources, pages, copartition_seen=False)
    stored = crawl_sources(spark, sources, pages, copartition_seen=True)
    canon = lambda r: sorted(
        (x.source_id, x.url, x.depth, x.seq, x.visited)
        for x in r.seen.select("source_id", "url", "depth", "seq", "visited").collect()
    )
    assert canon(stored) == canon(base)
