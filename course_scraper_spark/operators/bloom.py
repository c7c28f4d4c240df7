"""Partitioned bloom sidecar for the URL-seen set (north-rule custom op).

The exact seen-check is the (source_id, url) ``left_anti`` join in the
frontier — always. This module adds the scale path: a per-host-bucket
bloom filter sidecar that prunes *definitely-new* candidates before the
exact join, cutting the anti-join's probe side by the fraction of links
that point to genuinely new pages (the common case on a growing crawl).
False positives are harmless (the exact join catches them); false
negatives are impossible (bloom property), so correctness is untouched —
property-tested in tests/test_bloom.py.

Layout mirrors the seen table's explicit hash partitioning: one filter
blob per ``bucket = pmod(xxhash64(url), n_buckets)``, built wave-by-wave
as *delta* blooms (append-only, like the seen table itself) and OR-merged
by ``compact``. The sidecar lives as a bucket-aligned DataFrame end to
end — never collected to the driver, never captured in a task closure —
and the probe is a bucket-cogrouped ``applyInPandas`` so each task sees
only its own bucket's blobs. Blobs are numpy bitsets built/probed fully
vectorized inside Arrow-batched UDFs; double hashing h1 + i*h2 over the
64-bit xxhash64 url key gives k probe positions without per-row Python.

Catalyst has a BloomFilterAggregate for runtime join pruning, but this
sidecar is *persistent and incrementally updated* across waves — rebuilt
never, merged cheaply — which the built-in cannot do (SURVEY.md §4.1).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_K = 7  # probe positions; fp ≈ 0.9^7 ≈ 0.5% at 10 bits/key

SIDECAR_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)


def buckets_for_corpus(
    n_candidates: int, target_rows_per_bucket: int = 10_000_000, min_buckets: int = 64
) -> int:
    """Sidecar bucket count sized to the probe volume.

    The cogrouped probe materializes ONE bucket's candidate rows as a
    single pandas frame per task, so the per-group memory bound is
    candidates/n_buckets. A fixed n_buckets silently grows that bound
    with the corpus; deriving it keeps ~target_rows_per_bucket slim rows
    (≲1 GB) per task at any scale — 10^10 candidates ⇒ 1024 buckets.
    Same derive-don't-fix discipline as similarity.planes_for_corpus."""
    import math

    if n_candidates <= 0:
        return min_buckets
    return max(min_buckets, 1 << math.ceil(math.log2(max(n_candidates / target_rows_per_bucket, 1.0))))


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64-style second hash derived from the 64-bit key."""
    z = (h + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _positions(h: np.ndarray, m_bits: int) -> Iterator[np.ndarray]:
    h1 = h.astype(np.uint64)
    h2 = _mix(h1) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(_K):
        yield ((h1 + np.uint64(i) * h2) % m).astype(np.int64)


def _build_blob(hashes: np.ndarray, m_bits: int) -> bytes:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for pos in _positions(hashes, m_bits):
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits.tobytes()


def _probe_blob(hashes: np.ndarray, blob: bytes, m_bits: int) -> np.ndarray:
    bits = np.frombuffer(blob, dtype=np.uint8)
    maybe = np.ones(len(hashes), dtype=bool)
    for pos in _positions(hashes, m_bits):
        maybe &= (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return maybe


def _m_for(n: int, bits_per_key: int) -> int:
    m = max(1024, n * bits_per_key)
    return 1 << math.ceil(math.log2(m))  # pow2, byte-aligned


def build_delta(
    delta: DataFrame, url_col: str = "url", n_buckets: int = 64, bits_per_key: int = 12
) -> DataFrame:
    """One delta bloom row per bucket for a wave's new URLs."""
    keyed = delta.select(
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.xxhash64(F.col(url_col)).alias("h"),
    )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        h = pdf["h"].to_numpy().astype(np.uint64)
        m = _m_for(len(h), bits_per_key)
        return pd.DataFrame(
            {"bucket": [b], "m_bits": [m], "bits": [_build_blob(h, m)], "n_keys": [len(h)]}
        )

    return keyed.groupBy("bucket").applyInPandas(per_bucket, SIDECAR_SCHEMA)


def compact(sidecar: DataFrame) -> DataFrame:
    """OR-merge all delta blooms per bucket, TILING up to the largest m.

    Sound because every m is a power of two and probe positions are
    ``(h1 + i*h2) mod m`` ≡ ``x & (m-1)``: tiling a small filter
    m_large/m_small times gives tiled[x & (m_large-1)] ==
    small[x & (m_small-1)] — the tiled copy answers EXACTLY like the
    original (no false negatives, and each delta's false-positive rate is
    preserved, unlike folding down, which saturates when a big delta is
    crushed into a small one). The merged filter's fp rate is ~the sum of
    the deltas' rates — the same as probing them separately — while probe
    fan-out drops to one blob per bucket."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        m = int(pdf["m_bits"].max())
        acc = np.zeros(m // 8, dtype=np.uint8)
        total = 0
        for blob, mb, mb_keys in zip(pdf["bits"], pdf["m_bits"], pdf["n_keys"]):
            src = np.frombuffer(blob, dtype=np.uint8)
            if int(mb) == m:
                acc |= src
            else:  # tile the smaller filter up (exactness preserved)
                acc |= np.tile(src, m // int(mb))
            total += int(mb_keys)
        return pd.DataFrame({"bucket": [b], "m_bits": [m], "bits": [acc.tobytes()], "n_keys": [total]})

    return sidecar.groupBy("bucket").applyInPandas(merge, SIDECAR_SCHEMA)


def probe(
    candidates: DataFrame,
    sidecar: DataFrame,
    url_col: str = "url",
    n_buckets: int = 64,
    kind: str = "bloom",
) -> DataFrame:
    """Adds ``maybe_seen``: False ⇒ definitely not in the seen set.

    ``sidecar`` is the bucket-aligned filter TABLE (SIDECAR_SCHEMA, any
    number of delta rows per bucket; ``kind`` says how blobs decode —
    'bloom' bitsets or 'cuckoo' fingerprint tables, in which case
    ``m_bits`` carries the cuckoo-internal bucket count). The probe is a
    bucket-cogrouped ``applyInPandas``: candidates shuffle on the same
    ``pmod(xxhash64)`` bucket key the sidecar is partitioned by, and each
    task ORs only its own bucket's blobs — the filter NEVER rides the
    driver or a task closure, so a 10^10-key sidecar (~15 GB at
    12 bits/key) stays distributed. Matching Iceberg layout: sidecar
    table bucketed on ``bucket``, so this cogroup is a co-partitioned
    local join.

    Per-group memory bound: cogrouped ``applyInPandas`` materializes ONE
    bucket's candidate rows as a single pandas frame (unlike mapInPandas,
    which streams Arrow batches) — each task holds ~candidates/n_buckets
    rows plus that bucket's blobs. Size ``n_buckets`` with the corpus so
    one group fits executor memory: at 10^10 candidates keep
    candidates/n_buckets ≤ ~10M slim rows (≲1 GB), i.e. n_buckets ≥ ~1k;
    the bucket key is uniform (xxhash64), so groups stay balanced."""
    keyed = candidates.withColumn("_h", F.xxhash64(F.col(url_col))).withColumn(
        "_bucket", F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")
    )
    drop_cols = ["_h", "_bucket"]
    if kind == "cuckoo":
        from .cuckoo import CuckooFilter

        def blob_probe(h, blob, param):
            return CuckooFilter.from_bytes(bytes(blob), int(param)).contains_many(h)
    else:

        def blob_probe(h, blob, param):
            return _probe_blob(h, bytes(blob), int(param))

    def probe_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left.drop(columns=drop_cols)
        h = left["_h"].to_numpy().astype(np.uint64)
        maybe = np.zeros(len(left), dtype=bool)
        for blob, param in zip(right["bits"], right["m_bits"]):
            maybe |= blob_probe(h, blob, param)
        out["maybe_seen"] = maybe
        return out

    out_schema = T.StructType(
        [f for f in candidates.schema.fields] + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    return (
        keyed.groupBy("_bucket")
        .cogroup(sidecar.groupBy("bucket"))
        .applyInPandas(probe_group, out_schema)
    )


def dedup_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    sidecar: DataFrame,
    keys: list[str],
    url_col: str = "url",
    n_buckets: int = 64,
    kind: str = "bloom",
    anti_join_fn=None,
) -> DataFrame:
    """Exact new-URL set; the filter only shrinks the anti-join's left
    side. ``anti_join_fn`` (e.g. ``PartitionedSeenStore.anti_join``)
    replaces the union-seen anti-join for the bloom-positive suspects so
    the exact verify also avoids reshuffling the seen side."""
    probed = probe(candidates, sidecar, url_col=url_col, n_buckets=n_buckets, kind=kind)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    if anti_join_fn is not None:
        confirmed_new = anti_join_fn(suspects)
    else:
        confirmed_new = suspects.join(seen.select(*keys), keys, "left_anti")
    return definitely_new.unionByName(confirmed_new)
