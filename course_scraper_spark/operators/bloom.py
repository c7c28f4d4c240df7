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
by ``compact``. Blobs are numpy bitsets built/probed fully vectorized
inside Arrow-batched UDFs; double hashing h1 + i*h2 over the 64-bit
xxhash64 url key gives k probe positions without per-row Python.

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
    """OR-merge all delta blooms per bucket (resizing to the max m)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        m = int(pdf["m_bits"].max())
        acc = np.zeros(m // 8, dtype=np.uint8)
        total = 0
        for blob, mb in zip(pdf["bits"], pdf["m_bits"]):
            src = np.frombuffer(blob, dtype=np.uint8)
            if int(mb) == m:
                acc |= src
            else:
                # different size: tile smaller filter across the larger one
                # is NOT sound; rebuild marker instead — callers keep
                # bits_per_key fixed so sizes differ only with n; we upcast
                # by re-hashing is impossible here, so we fall back to
                # treating every key as maybe-present (all-ones) — safe.
                acc[:] = 0xFF
            total += int(pdf["n_keys"].iloc[0])
        return pd.DataFrame({"bucket": [b], "m_bits": [m], "bits": [acc.tobytes()], "n_keys": [total]})

    return sidecar.groupBy("bucket").applyInPandas(merge, SIDECAR_SCHEMA)


def probe(
    candidates: DataFrame,
    sidecar_rows: list,
    url_col: str = "url",
    n_buckets: int = 64,
) -> DataFrame:
    """Adds ``maybe_seen``: False ⇒ definitely not in the seen set.

    ``sidecar_rows`` is the collected sidecar (one compacted row per
    bucket) — broadcast via task closure; blobs are shared read-only."""
    blobs: dict[int, list[tuple[bytes, int]]] = {}
    for r in sidecar_rows:
        blobs.setdefault(int(r["bucket"]), []).append((bytes(r["bits"]), int(r["m_bits"])))

    keyed = candidates.withColumn("_h", F.xxhash64(F.col(url_col))).withColumn(
        "_bucket", F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")
    )

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = pdf["_h"].to_numpy().astype(np.uint64)
            bk = pdf["_bucket"].to_numpy()
            maybe = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(bk):
                mask = bk == b
                sub = h[mask]
                acc = np.zeros(mask.sum(), dtype=bool)
                for blob, m_bits in blobs.get(int(b), []):
                    acc |= _probe_blob(sub, blob, m_bits)
                maybe[mask] = acc
            out = pdf.copy()
            out["maybe_seen"] = maybe
            return_cols = [c for c in out.columns if c not in ("_h", "_bucket")]
            yield out[return_cols]

    out_schema = T.StructType(
        [f for f in candidates.schema.fields] + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    return keyed.mapInPandas(probe_batches, out_schema)


def dedup_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    sidecar_rows: list,
    keys: list[str],
    url_col: str = "url",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact new-URL set; bloom only shrinks the anti-join's left side."""
    probed = probe(candidates, sidecar_rows, url_col=url_col, n_buckets=n_buckets)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = suspects.join(seen.select(*keys), keys, "left_anti")
    return definitely_new.unionByName(confirmed_new)
