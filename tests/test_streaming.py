"""Streaming semantics: stateful seen-dedup across micro-batches,
watermarked rollup, foreachBatch crawl trigger."""

import json
import os

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.streaming.waves import (
    crawl_on_new_seeds,
    streaming_event_rollup,
    streaming_seen_dedup,
)


def _write_json(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_seen_dedup(spark, tmp_path):
    d = str(tmp_path / "urls")
    _write_json(
        f"{d}/batch0.json",
        [
            {"url": "https://h.edu/a", "source_id": "s", "discovered_at": "2024-01-01T00:00:00Z"},
            {"url": "https://h.edu/a", "source_id": "s", "discovered_at": "2024-01-01T00:01:00Z"},
            {"url": "https://h.edu/b", "source_id": "s", "discovered_at": "2024-01-01T00:02:00Z"},
        ],
    )
    q = (
        streaming_seen_dedup(spark, d)
        .writeStream.format("memory")
        .queryName("seen_dedup")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r.url for r in spark.sql("SELECT url FROM seen_dedup").collect()}
    assert out == {"https://h.edu/a", "https://h.edu/b"}


def test_streaming_rollup(spark, tmp_path):
    d = str(tmp_path / "ev")
    _write_json(
        f"{d}/b0.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:05:00Z", "event_type": "x", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T10:55:00Z", "event_type": "x", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01T11:05:00Z", "event_type": "x", "value": 4.0},
        ],
    )
    # complete mode: append-mode emission waits for the watermark to pass
    # the window end, which a single availableNow batch never reaches —
    # complete shows the state-store contents (what a sink would get as
    # batches keep arriving)
    q = (
        streaming_event_rollup(spark, d)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (str(r.window_start), r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM rollup").collect()
    }
    assert any(n == 2 and sv == 3.0 for _, n, sv in rows)
    assert any(n == 1 and sv == 4.0 for _, n, sv in rows)


def test_foreach_batch_crawl_trigger(spark, tmp_path, sources, pages):
    d = str(tmp_path / "seeds")
    s0 = sources[0]
    _write_json(
        f"{d}/s.json",
        [{"source_id": s0.source_id, "name": s0.name, "root_url": s0.root_url, "crawl_depth": 2}],
    )
    seen_counts = []

    def process(batch_df, batch_id):
        from course_scraper_spark.config import SourceConfig
        from course_scraper_spark.operators.frontier import crawl_sources

        rows = batch_df.collect()
        srcs = [
            SourceConfig(source_id=r.source_id, name=r.name, root_url=r.root_url, crawl_depth=r.crawl_depth)
            for r in rows
        ]
        if srcs:
            res = crawl_sources(spark, srcs, pages)
            seen_counts.append(res.seen.count())

    q = crawl_on_new_seeds(spark, d, process, str(tmp_path / "ck3"))
    q.awaitTermination(240)
    assert seen_counts and seen_counts[0] > 0


def test_streaming_politeness_slots_state_continues(spark, tmp_path):
    """applyInPandasWithState: per-host slot numbers continue across
    micro-batches (slot counter in the state store) — the continuous
    politeness scheduler."""
    import time

    from course_scraper_spark.streaming.waves import streaming_politeness_slots

    d = str(tmp_path / "polite")
    _write_json(
        f"{d}/b0.json",
        [
            {"url": "https://a.edu/p1", "source_id": "s", "discovered_at": "2024-01-01T00:00:00Z"},
            {"url": "https://a.edu/p2", "source_id": "s", "discovered_at": "2024-01-01T00:01:00Z"},
            {"url": "https://b.edu/q1", "source_id": "s", "discovered_at": "2024-01-01T00:01:30Z"},
        ],
    )
    time.sleep(1.1)  # distinct mtime: file source orders b0 before b1
    _write_json(
        f"{d}/b1.json",
        [
            {"url": "https://a.edu/p3", "source_id": "s", "discovered_at": "2024-01-01T00:02:00Z"},
            {"url": "https://b.edu/q2", "source_id": "s", "discovered_at": "2024-01-01T00:02:30Z"},
        ],
    )
    q = (
        streaming_politeness_slots(
            spark, d, crawl_delays={"a.edu": 2.0}, max_files_per_trigger=1
        )
        .writeStream.format("memory")
        .queryName("polite_slots")
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r.url: (r.slot, r.sched_time) for r in spark.sql("SELECT * FROM polite_slots").collect()}
    # batch 1 assigned a.edu slots 1,2; batch 2 CONTINUED at 3 (not reset)
    assert rows["https://a.edu/p1"] == (1, 0.0)
    assert rows["https://a.edu/p2"] == (2, 2.0)
    assert rows["https://a.edu/p3"] == (3, 4.0)
    # independent per-host counters; default delay 1.0 for b.edu
    assert rows["https://b.edu/q1"] == (1, 0.0)
    assert rows["https://b.edu/q2"] == (2, 1.0)


def test_streaming_politeness_slots_multichunk_group_order(spark, tmp_path):
    """A host group larger than one Arrow batch must still get ONE
    global (discovered_at, url) order per micro-batch — the chunks are
    concatenated before sorting, so slot assignment is deterministic
    (regression for the chunk-local sort)."""
    from course_scraper_spark.streaming.waves import streaming_politeness_slots

    d = str(tmp_path / "mc_urls")
    # one host, 30 rows in one micro-batch, written in REVERSE time order
    # so a chunk-local sort would interleave slots across chunks
    rows = [
        {
            "url": f"https://h.edu/p{i:02d}",
            "source_id": "s",
            "discovered_at": f"2024-01-01T00:{59 - i:02d}:00Z",
        }
        for i in range(30)
    ]
    _write_json(f"{d}/b0.json", rows)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")  # force many chunks
    try:
        q = (
            streaming_politeness_slots(spark, d, crawl_delays={"h.edu": 2.0})
            .writeStream.format("memory")
            .queryName("mc_slots")
            .option("checkpointLocation", str(tmp_path / "ck_mc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    got = {r.url: (r.slot, r.sched_time) for r in spark.sql("SELECT * FROM mc_slots").collect()}
    assert len(got) == 30
    # global discovered_at order: p29 (00:30) first ... p00 (00:59) last
    for i in range(30):
        want_slot = 30 - i
        assert got[f"https://h.edu/p{i:02d}"] == (want_slot, (want_slot - 1) * 2.0), i
