"""Structured Streaming forms of the engine's stateful semantics.

The reference is batch-iterative (BFS waves — SURVEY.md §2.10), so the
core engine is a driver loop of batch jobs. These wrappers exist for the
continuous-ingest deployment shape:

* ``streaming_seen_dedup`` — the URL-seen set as a *streaming* stateful
  dedup: ``dropDuplicates(url)`` keeps the seen-state in the state store
  across micro-batches (the streaming analogue of the J1 anti-join).
  With a watermark on ``discovered_at`` the state is GC-able: URLs older
  than the horizon age out (acceptable when the batch seen-table is the
  source of truth and the stream is a front-line filter).
* ``streaming_event_rollup`` — watermarked tumbling-window aggregation
  (late data handled by the watermark), the streaming twin of
  ``q_windowed_rollup``.
* ``crawl_on_new_seeds`` — ``foreachBatch``: every micro-batch of newly
  arrived seed rows triggers one batch crawl into the same snapshot
  tables the batch pipeline uses — streams and batch share storage, so
  resume/lineage semantics are identical.
* ``streaming_politeness_slots`` — a CUSTOM stateful operator via
  ``applyInPandasWithState``: per-host fetch-slot numbers continue
  across micro-batches (the slot counter lives in the state store), so
  the politeness rate ceiling holds over the whole stream rather than
  resetting per batch. The batch twin is
  ``operators/politeness.with_schedule``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("root_url", T.StringType()),
        T.StructField("crawl_depth", T.IntegerType()),
    ]
)

URL_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("discovered_at", T.TimestampType()),
    ]
)


def streaming_seen_dedup(
    spark: SparkSession, input_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """First sighting of each (source_id, url) across all micro-batches."""
    stream = spark.readStream.schema(URL_STREAM_SCHEMA).json(input_dir)
    return stream.withWatermark("discovered_at", watermark).dropDuplicates(
        ["source_id", "url"]
    )


def streaming_event_rollup(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


POLITE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("slot", T.LongType()),
        T.StructField("sched_time", T.DoubleType()),
    ]
)

POLITE_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def streaming_politeness_slots(
    spark: SparkSession,
    input_dir: str,
    crawl_delays: dict[str, float] | None = None,
    default_delay: float = 1.0,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Per-host politeness slots as a custom stateful streaming operator.

    ``applyInPandasWithState`` keyed on host: each group's pandas batch
    gets slot numbers continuing from the host's state-store counter, so
    slot n fires at ``(n-1) * crawl_delay`` measured over the STREAM's
    lifetime — the continuous form of the batch scheduler
    (operators/politeness.with_schedule), and the shape a long-running
    ingest deployment needs (a per-batch window would reset every
    micro-batch and burst past the host's rate ceiling). Rows within a
    micro-batch order by (discovered_at, url) across the WHOLE group —
    the group's Arrow chunks are concatenated before sorting, so slot
    assignment is globally deterministic even when a host group spans
    multiple Arrow batches — like the batch form's (seq, tiebreak)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions import urls as U

    delays = dict(crawl_delays or {})
    reader = spark.readStream.schema(URL_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(input_dir).withColumn("host", U.host_of(F.col("url")))

    def assign(key, pdfs, state):
        import pandas as pd

        host = key[0]
        (n,) = state.get if state.exists else (0,)
        delay = float(delays.get(host, default_delay))
        # Concatenate the group's Arrow chunks BEFORE sorting: a host
        # group larger than one Arrow batch must still get one global
        # (discovered_at, url) order, not chunk-local orders.
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["discovered_at", "url"]).reset_index(drop=True)
            k = len(pdf)
            slots = list(range(n + 1, n + 1 + k))
            n += k
            yield pd.DataFrame(
                {
                    "host": [host] * k,
                    "url": pdf["url"],
                    "source_id": pdf["source_id"],
                    "slot": slots,
                    "sched_time": [(s - 1) * delay for s in slots],
                }
            )
        state.update((n,))

    return stream.groupBy("host").applyInPandasWithState(
        assign, POLITE_OUT_SCHEMA, POLITE_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def crawl_on_new_seeds(
    spark: SparkSession,
    seeds_dir: str,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """foreachBatch bridge: new seed rows -> one batch crawl per
    micro-batch. Caller supplies ``process_batch(seed_rows_df, batch_id)``
    (usually a closure over pipeline.run_pipeline)."""
    stream = spark.readStream.schema(SEED_STREAM_SCHEMA).json(seeds_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
