"""Salted repartitioning for skewed hosts (north-rule operator).

A web frontier is Zipf-distributed over hosts (the synthetic world uses
Zipf(1.2), synth/world.py) — a mega-host can own 10-30% of a wave. Any
stage whose partitioning follows the host key (the live-cluster fetch
stage, per-host metrics rollups) then pins that host's whole share to one
task: a straggler that caps scaling efficiency no matter how many
executors exist. The reference never hits this because it serializes
per-host anyway (one semaphore slot per source, crawler.py:168); a
parallel engine must *spread* the host instead.

``salted_repartition`` spreads only the hot keys: one tiny map-side-
combined count per key, broadcast the keys above ``threshold``, then
repartition on ``(key, salt)`` where salt is derived from a per-row
column (url by default — deterministic, no rand()) for hot keys and 0
for the rest. Cold hosts keep one partition's locality (politeness
bookkeeping stays cheap); hot hosts fan out across ``n_salts`` tasks.

Semantics-free by construction: only the physical partitioning changes —
asserted by the equality tests running the crawl with salting on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key_col: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` — one partial-agg job."""
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > threshold)
        .select(key_col)
    )


def salted_repartition(
    df: DataFrame,
    key_col: str,
    n_salts: int = 16,
    threshold: int = 50_000,
    num_partitions: int | None = None,
    salt_col: str | None = None,
) -> DataFrame:
    """Repartition on ``(key, salt)``: hot keys fan out over ``n_salts``
    salt values, cold keys keep salt 0 (single shard, locality preserved).

    ``salt_col``: per-row column the salt is hashed from (defaults to the
    first non-key column) — deterministic, so repeated actions see the
    same placement (no ``rand()``).
    """
    if salt_col is None:
        others = [c for c in df.columns if c != key_col]
        if not others:
            raise ValueError("need a non-key column to derive the salt from")
        salt_col = others[0]
    hot = hot_keys(df, key_col, threshold).withColumn("_hot", F.lit(True))
    salted = (
        df.join(F.broadcast(hot), key_col, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot"),
                F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return salted.repartition(parts, F.col(key_col), F.col("_salt")).drop("_salt")
