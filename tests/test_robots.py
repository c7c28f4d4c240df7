"""robots.txt Disallow application (semantic superset behind the
obey_disallow flag; the reference reads only crawl_delay, so equality
paths stay delay-only)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from course_scraper_spark.operators.frontier import crawl_sources, crawl_sources_budgeted
from course_scraper_spark.operators.robots import filter_disallowed

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
        T.StructField("disallow", T.ArrayType(T.StringType())),
    ]
)


def test_filter_disallowed_prefix_match(spark):
    frontier = spark.createDataFrame(
        [
            ("a.edu", "https://a.edu/private/x.html"),
            ("a.edu", "https://a.edu/public/y.html"),
            ("a.edu", "https://a.edu/privateer.html"),  # prefix is on PATH, matches /private*? no: /privateer.html vs /private/
            ("b.edu", "https://b.edu/private/z.html"),  # b has no rules
            ("c.edu", "https://c.edu/anything"),  # null disallow
        ],
        ["host", "url"],
    )
    robots = spark.createDataFrame(
        [("a.edu", 1.0, ["/private/"]), ("c.edu", 1.0, None)], ROBOTS_SCHEMA
    )
    kept = {r.url for r in filter_disallowed(frontier, robots).collect()}
    assert kept == {
        "https://a.edu/public/y.html",
        "https://a.edu/privateer.html",
        "https://b.edu/private/z.html",
        "https://c.edu/anything",
    }


def test_budgeted_crawl_obeys_disallow(spark, sources, pages):
    hosts = sorted({s.root_url.split("/")[2] for s in sources})
    robots = spark.createDataFrame(
        [(h, 1.0, ["/catalog/sec0/"]) for h in hosts], ROBOTS_SCHEMA
    )
    full = crawl_sources(spark, sources, pages)
    gated = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=50.0, obey_disallow=True
    )
    full_urls = {r.url for r in full.seen.filter(F.col("visited")).collect()}
    gated_urls = {r.url for r in gated.seen.filter(F.col("visited")).collect()}
    assert any("/catalog/sec0/" in u for u in full_urls), "fixture must hit the prefix"
    assert not any("/catalog/sec0/" in u for u in gated_urls)
    assert gated_urls < full_urls
    # default (flag off) keeps reference delay-only semantics
    ungated = crawl_sources_budgeted(spark, sources, pages, robots=robots, round_budget_s=50.0)
    assert {r.url for r in ungated.seen.filter(F.col("visited")).collect()} == full_urls
