"""Scaling-evidence harness (BASELINE.md protocol).

The north rule's two-cluster-size criterion (≥0.8 throughput efficiency
from N to 4N executors) is evidenced in-sandbox by running the SAME job
on the SAME input at local[8] and local[32] (4× cores), fresh JVM per
run (subprocess), 1 warm-up discarded, median of N reported.

Two stages are measured, matching the two regimes of the engine:

* ``parse``  — fetch+parse throughput over a 150k-page heavy synthetic
  web (the north-star metric: URLs fetched+parsed per second). This is
  the throughput-dominated regime a 10^10-URL frontier runs in; the
  ≥0.8 efficiency criterion applies here.
* ``loop``   — the full BFS crawl-extract-store loop on a 20k-page
  world. At sandbox scale this is latency-dominated (per-wave fixed
  scheduling cost), reported for completeness with that caveat.

Cluster-size levels: local[4] vs local[16] (N and 4N cores). Every
``local[c]`` level runs c JVM task threads PLUS c Python UDF workers,
so local[32] on this 32-core box oversubscribes 2:1 during UDF stages —
measured 3x per-page slowdown purely from thread contention, an
artifact a real multi-node cluster doesn't have. 4/16 keeps
threads+workers ≤ 32 at both levels so the comparison isolates the
engine's scaling, not the sandbox's core budget.

Usage:
  python tools/scaling_bench.py                # orchestrate, print JSON
  python tools/scaling_bench.py --worker --cpus 8 --stage parse
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PARSE_PAGES = 300_000
PARSE_HOSTS = 150
LOOP_PAGES = 20_000
LOOP_HOSTS = 40


def _heavy_spec(pages, hosts):
    from course_scraper_spark.synth.world import WorldSpec

    return WorldSpec(
        n_hosts=hosts,
        total_pages=pages,
        branching=8,
        extra_links=4,
        filler_paras=40,
        max_courses=15,
    )


def _sources_and_schemas(spark, spec):
    from course_scraper_spark.synth.world import build_schemas, build_sources

    sources = build_sources(spec)
    for s in sources:
        s.crawl_depth = max(s.crawl_depth, 10)
    return sources, spark.createDataFrame(build_schemas(spec))


def worker(cpus: int, stage: str) -> None:
    sys.path.insert(0, REPO)
    import time

    from pyspark.sql import functions as F

    from course_scraper_spark.session import get_spark
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.operators.spans import scrape_targets
    from course_scraper_spark.synth.spark_world import build_pages_spark
    from course_scraper_spark.synth.world import build_pages

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name=f"scaling-{stage}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # one scan split per world file (128 files): the parse UDF's
        # parallelism follows scan splits, and fine splits let stragglers
        # rebalance — with cores-count splits one heavy split gates the
        # stage (measured 3x wall inflation)
        extra_conf={"spark.sql.files.maxPartitionBytes": "2m"},
    )

    if stage == "parse":
        spec = _heavy_spec(PARSE_PAGES, PARSE_HOSTS)
        world_path = f"/tmp/scaling_world_{PARSE_PAGES}_{PARSE_HOSTS}_v2.parquet"
        if not os.path.exists(world_path):
            # many small files: parse parallelism follows scan splits,
            # so the store must carry enough of them for 4N cores
            build_pages_spark(spark, spec, partitions=128).write.mode("overwrite").parquet(world_path)
        pages_df = spark.read.parquet(world_path)
        sources, schemas = _sources_and_schemas(spark, spec)
        host_dim = F.broadcast(
            spark.createDataFrame(
                [(s.source_id, s.root_url.split("/")[2]) for s in sources],
                "source_id string, host string",
            )
        )
        targets = (
            pages_df.select("url", "host").join(host_dim, "host").select("source_id", "url").cache()
        )
        n_targets = targets.count()  # materialized outside the timed section

        t0 = time.time()
        out = scrape_targets(targets, pages_df, schemas)
        n_docs = out.docs.count()
        wall = time.time() - t0
        print(json.dumps({"cpus": cpus, "stage": stage, "wall": wall, "targets": n_targets,
                          "docs": n_docs, "throughput": n_targets / wall}))
    else:
        spec = _heavy_spec(LOOP_PAGES, LOOP_HOSTS)
        pages_df = spark.createDataFrame(build_pages(spec)).repartition(cpus).cache()
        pages_df.count()
        sources, schemas = _sources_and_schemas(spark, spec)
        t0 = time.time()
        res = crawl_sources(spark, sources, pages_df, candidate_partitions=cpus)
        seen = res.seen.cache()
        n_seen = seen.count()
        out = scrape_targets(seen.select("source_id", "url"), pages_df, schemas, parse_partitions=cpus)
        n_docs = out.docs.count()
        wall = time.time() - t0
        print(json.dumps({"cpus": cpus, "stage": stage, "wall": wall, "seen": n_seen,
                          "docs": n_docs, "throughput": (n_seen + n_docs) / wall}))
    spark.stop()


def run_once(cpus: int, stage: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", "--cpus", str(cpus), "--stage", stage],
        capture_output=True, text=True, cwd=REPO,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


LEVELS = (4, 16)  # N and 4N cores; see module docstring


def bench_stage(stage: str, runs: int) -> dict:
    lo, hi = LEVELS
    results = {}
    for cpus in LEVELS:
        run_once(cpus, stage)  # warm-up (JVM/codegen + world materialization)
        walls, tps = [], []
        for _ in range(runs):
            r = run_once(cpus, stage)
            walls.append(r["wall"])
            tps.append(r["throughput"])
        results[cpus] = {
            "median_wall_sec": round(statistics.median(walls), 2),
            "median_throughput": round(statistics.median(tps), 2),
            "runs": [round(w, 2) for w in walls],
        }
    eff = results[hi]["median_throughput"] / (4 * results[lo]["median_throughput"])
    return {
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        "speedup": round(results[hi]["median_throughput"] / results[lo]["median_throughput"], 3),
        "scaling_efficiency_4x": round(eff, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--stage", default="parse", choices=["parse", "loop"])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--stages", default="parse,loop")
    args = ap.parse_args()

    if args.worker:
        worker(args.cpus, args.stage)
        return

    report = {}
    for stage in args.stages.split(","):
        report[stage] = bench_stage(stage, args.runs)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
