"""Distributed generation produces exactly the driver-side world."""

from course_scraper_spark.synth.spark_world import build_pages_spark
from course_scraper_spark.synth.world import WorldSpec, build_pages


def test_spark_world_equals_pandas_world(spark):
    spec = WorldSpec(n_hosts=5, total_pages=150, branching=4, extra_links=2, filler_paras=2)
    want = {
        r.url: (r.host, r.html, r.status_code, r.fetch_mode, r.template_id)
        for r in build_pages(spec).itertuples()
    }
    got = {
        r.url: (r.host, r.html, r.status_code, r.fetch_mode, r.template_id)
        for r in build_pages_spark(spark, spec, partitions=7).collect()
    }
    assert got == want
