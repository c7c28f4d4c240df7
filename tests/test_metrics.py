"""Per-partition lineage: fetch/parse metrics per (wave, source, host),
run log, skew evidence rollup."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators.frontier import crawl_sources
from course_scraper_spark.operators.metrics import MetricsStore, skew_evidence


def test_crawl_records_partition_metrics(spark, sources, pages, tmp_path):
    store = MetricsStore(spark, str(tmp_path / "m"))
    res = crawl_sources(spark, sources[:2], pages, metrics_store=store, run_id="r1")
    pm = store.partition_metrics.read()
    assert set(pm.columns) >= {"run_id", "wave", "source_id", "host", "n_urls", "n_fetch_ok", "n_failed"}
    assert pm.filter(F.col("run_id") == "r1").count() > 0
    # totals line up: every fetched-or-failed URL appears exactly once
    tot = pm.agg(F.sum("n_urls")).first()[0]
    visited_expandable = res.seen.filter(F.col("visited")).count()
    assert tot <= visited_expandable  # depth-max rows are never expanded
    assert pm.filter(F.col("n_failed") > 0).count() > 0  # failure path seen

    ev = skew_evidence(pm).collect()
    assert ev and all(r.max_host_urls >= r.median_host_urls for r in ev)


def test_run_log_append(spark, tmp_path):
    store = MetricsStore(spark, str(tmp_path / "m2"))
    store.log("r9", "src_a", "CRAWL", "hello")
    rows = store.run_log.read().collect()
    assert len(rows) == 1 and rows[0].stage == "CRAWL" and rows[0].ts is not None
