"""End-to-end pipeline lifecycle: lock -> crawl -> scrape -> store, task
anti-join memoization on re-run, run-lock mutex."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.pipeline import run_pipeline
from course_scraper_spark.storage.runlock import RunLock


@pytest.fixture(scope="module")
def schemas(spark, schemas_pdf):
    return spark.createDataFrame(schemas_pdf)


def test_pipeline_end_to_end(spark, sources, pages, schemas, tmp_path):
    wd = str(tmp_path / "run1")
    res = run_pipeline(spark, sources, pages, schemas, wd)
    assert res.crawl.failed_sources == []
    # per-occurrence tally (reference semantics): duplicate keys WITHIN the
    # first batch count as self-updates, so updated is the dup count, not 0
    assert res.merge_stats.inserted > 0
    assert res.merge_stats.updated < res.merge_stats.inserted

    courses = res.tables["courses"].read()
    assert courses.filter(F.col("course_title").isNull()).count() == 0
    urls = res.tables["urls"].read()
    assert set(urls.columns) == {"source_id", "url", "is_target"}
    assert urls.filter(~F.col("is_target")).count() > 0  # bad URLs flagged
    docs = res.tables["docs"].read()
    assert docs.count() > 0
    log = res.tables["run_log"].read()
    assert log.filter(F.col("stage") == "STORE").count() == 1

    # second run: task anti-join skips everything (all sources have courses)
    res2 = run_pipeline(spark, sources, pages, schemas, wd)
    assert res2.merge_stats.inserted == 0
    assert res2.crawl.seen.count() == 0  # nothing to crawl


def test_run_lock_mutex(tmp_path):
    lock_dir = str(tmp_path / "lk")
    a, b = RunLock(lock_dir), RunLock(lock_dir)
    rid = a.begin_run()
    assert rid is not None
    assert b.begin_run() is None  # reference returns NULL when locked
    a.end_run()
    assert b.begin_run() is not None
    b.end_run()
