"""Kill/resume: a crawl interrupted after wave k and resumed from the
snapshot store finishes with state identical to an uninterrupted run
(SURVEY.md §5.4)."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators.frontier import crawl_sources
from course_scraper_spark.storage.crawl_state import CrawlStateStore


def canon(df):
    return sorted(
        (r.source_id, r.url, r.depth, r.seq, r.visited)
        for r in df.select("source_id", "url", "depth", "seq", "visited").collect()
    )


def test_resume_equals_uninterrupted(spark, sources, pages, tmp_path):
    full = crawl_sources(spark, sources, pages)

    store = CrawlStateStore(spark, str(tmp_path / "state"), n_buckets=8)
    partial = crawl_sources(spark, sources, pages, state_store=store, max_waves=2)
    n_partial = store.read_seen().count()

    resumed = crawl_sources(spark, sources, pages, state_store=store, resume=True)
    assert canon(resumed.seen) == canon(full.seen)
    assert resumed.seen.count() > n_partial  # the kill actually cut it short


def test_resume_of_finished_crawl_is_noop(spark, sources, pages, tmp_path):
    store = CrawlStateStore(spark, str(tmp_path / "state2"), n_buckets=8)
    first = crawl_sources(spark, sources, pages, state_store=store)
    before = canon(store.read_seen())
    again = crawl_sources(spark, sources, pages, state_store=store, resume=True)
    assert canon(again.seen) == before
