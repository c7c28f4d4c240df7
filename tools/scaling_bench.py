"""Scaling-evidence harness (BASELINE.md protocol).

The north rule's two-cluster-size criterion (≥0.8 efficiency from N to 4N
executors) is evidenced in-sandbox by running the SAME crawl-extract-store
job on the SAME input at local[8] and local[32] (4× cores), fixed
shuffle partitions per run, fresh JVM per run (subprocess), 1 warm-up
discarded, median of N reported.

Usage:
  python tools/scaling_bench.py                 # orchestrate, print JSON
  python tools/scaling_bench.py --worker --cpus 8 --pages 4000   # one run
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import os


def worker(cpus: int, pages: int, hosts: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import time

    from course_scraper_spark.session import get_spark
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.operators.spans import scrape_targets
    from course_scraper_spark.synth.world import WorldSpec, build_pages, build_schemas, build_sources

    spark = get_spark(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spec = WorldSpec(n_hosts=hosts, total_pages=pages)
    pages_pdf = build_pages(spec)
    pages_df = spark.createDataFrame(pages_pdf).repartition(cpus).cache()
    pages_df.count()
    sources = build_sources(spec)
    # deep crawl so wave volumes (shuffle + UDF work) dominate the fixed
    # per-wave scheduling overhead — the regime a real cluster runs in
    for s in sources:
        s.crawl_depth = max(s.crawl_depth, 12)
    schemas = spark.createDataFrame(build_schemas(spec))

    t0 = time.time()
    res = crawl_sources(spark, sources, pages_df, candidate_partitions=cpus)
    seen = res.seen.cache()
    n_seen = seen.count()
    out = scrape_targets(seen.select("source_id", "url"), pages_df, schemas, parse_partitions=cpus)
    n_docs = out.docs.count()
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "wall": wall, "seen": n_seen, "docs": n_docs,
                      "throughput": (n_seen + n_docs) / wall}))
    spark.stop()


def run_once(cpus: int, pages: int, hosts: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", "--cpus", str(cpus),
         "--pages", str(pages), "--hosts", str(hosts)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pages", type=int, default=4000)
    ap.add_argument("--hosts", type=int, default=24)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    if args.worker:
        worker(args.cpus, args.pages, args.hosts)
        return

    results = {}
    for cpus in (8, 32):
        run_once(cpus, args.pages, args.hosts)  # warm-up (JVM/codegen), discarded
        walls, tps = [], []
        for _ in range(args.runs):
            r = run_once(cpus, args.pages, args.hosts)
            walls.append(r["wall"])
            tps.append(r["throughput"])
        results[cpus] = {
            "median_wall_sec": round(statistics.median(walls), 2),
            "median_throughput": round(statistics.median(tps), 2),
            "runs": [round(w, 2) for w in walls],
            "seen": r["seen"],
            "docs": r["docs"],
        }
    eff = results[32]["median_throughput"] / (4 * results[8]["median_throughput"])
    print(json.dumps({
        "pages": args.pages,
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(results[32]["median_throughput"] / results[8]["median_throughput"], 3),
        "scaling_efficiency_4x": round(eff, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
