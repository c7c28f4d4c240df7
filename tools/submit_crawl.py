"""spark-submit entry point (north rule: deployed via
``spark-submit --py-files`` on multi-executor clusters).

Build the package zip and submit:

    python tools/make_pyfiles_zip.py              # -> dist/course_scraper_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/course_scraper_spark.zip \\
        tools/submit_crawl.py --pages 2000 --hosts 8

On a real cluster swap the master URL; everything the job needs ships in
the zip (no repo checkout on executors).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    # imports resolve from --py-files on executors AND driver
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.operators.spans import scrape_targets
    from course_scraper_spark.synth.spark_world import build_pages_spark
    from course_scraper_spark.synth.world import WorldSpec, build_schemas, build_sources

    spark = SparkSession.builder.appName("submit-crawl").getOrCreate()
    spec = WorldSpec(n_hosts=args.hosts, total_pages=args.pages)
    pages = build_pages_spark(spark, spec).cache()
    pages.count()
    sources = build_sources(spec)
    schemas = spark.createDataFrame(build_schemas(spec))

    t0 = time.time()
    res = crawl_sources(spark, sources, pages)
    seen = res.seen.cache()
    n_seen = seen.count()
    out = scrape_targets(seen.select("source_id", "url"), pages, schemas)
    n_docs = out.docs.count()
    print(
        json.dumps(
            {
                "seen": n_seen,
                "docs": n_docs,
                "wall_sec": round(time.time() - t0, 2),
                "failed_sources": res.failed_sources,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
