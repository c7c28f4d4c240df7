"""Scope-flag branches: include_external=True (cross-host crawl,
crawler.py:206,254) and make_root_filter=False (host-wide scope,
crawler.py:154) — engine vs oracle equality on both."""

import pytest

from course_scraper_spark.config import SourceConfig
from course_scraper_spark.operators.frontier import crawl_sources
from course_scraper_spark.oracle.crawl import PageStore, oracle_crawl
from course_scraper_spark.synth.world import WorldSpec, build_pages, build_sources


@pytest.fixture(scope="module")
def small_world(spark):
    spec = WorldSpec(n_hosts=3, total_pages=80)
    pdf = build_pages(spec)
    return spec, pdf, spark.createDataFrame(pdf)


def test_include_external_crawls_other_hosts(spark, small_world):
    spec, pdf, pages = small_world
    base = build_sources(spec)[0]
    src = SourceConfig(
        source_id="EXT",
        name="ext",
        root_url=base.root_url,
        crawl_depth=3,
        include_external=True,
    )
    oracle = oracle_crawl(src, PageStore(pdf))
    got = crawl_sources(spark, [src], pages)
    assert got.seen_urls("EXT") == oracle.seen_sorted
    assert got.visit_order("EXT") == oracle.visit_order
    # external hosts actually reached (the outside-*.org decoys)
    assert any("outside-" in u for u in oracle.seen_sorted)


def test_make_root_filter_false(spark, small_world):
    spec, pdf, pages = small_world
    base = build_sources(spec)[0]
    src = SourceConfig(
        source_id="NRF", name="nrf", root_url=base.root_url, crawl_depth=3
    )
    oracle = oracle_crawl(src, PageStore(pdf), make_root_filter=False)
    got = crawl_sources(spark, [src], pages, make_root_filter=False)
    assert got.seen_urls("NRF") == oracle.seen_sorted
    assert got.visit_order("NRF") == oracle.visit_order
    # host-wide scope reaches /catalog/search (outside the /catalog/ root
    # path it would otherwise... search IS under /catalog; use archive)
    scoped = oracle_crawl(src, PageStore(pdf), make_root_filter=True)
    assert set(scoped.seen_sorted) <= set(oracle.seen_sorted)