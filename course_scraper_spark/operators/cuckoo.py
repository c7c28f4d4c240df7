"""Cuckoo-filter sidecar — the deletable twin of the bloom sidecar.

The north-star design calls for a "partitioned bloom+cuckoo URL-seen
filter": bloom (operators/bloom.py) is the cheap append-only prefilter;
the cuckoo filter (Fan et al., CoNEXT'14: partial-key cuckoo hashing,
4-slot buckets, 16-bit fingerprints) adds *deletion* — needed when a
seen-entry must be retired (recrawl windows, TTL'd URLs) without
rebuilding the filter.

Same layout contract as the bloom sidecar: one blob per host bucket,
aligned with the seen table's hash partitioning; exactness still comes
from the anti-join — the filter only prunes.

Build: mostly-vectorized numpy. Primary/alternate bucket placement is
resolved in vector passes; only the overflow remainder (a few % at 0.7
load) falls into the bounded eviction loop. Probe: fully vectorized
(gather both candidate buckets, compare fingerprints).
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 200


def _fingerprint(h: np.ndarray) -> np.ndarray:
    fp = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _remix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer. The sidecar layout buckets keys by
    pmod(xxhash64, n_host_buckets) — the LOW bits of the same hash — so
    within one blob every key shares those bits; using h directly for the
    internal (power-of-two) bucket would leave only 1/n_host_buckets of
    the table reachable and overflow it. Remixing decorrelates."""
    z = (h + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_remix(h) % np.uint64(n_buckets)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    # partial-key cuckoo: alt = b XOR hash(fp)
    fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFFFFFF)
    return ((b.astype(np.uint64) ^ fph) % np.uint64(n_buckets)).astype(np.int64)


class CuckooFilter:
    def __init__(self, n_keys: int, load: float = 0.7):
        n_buckets = max(8, int(n_keys / (_SLOTS * load)))
        # power of two for cheap masking behavior of XOR-alt
        self.n_buckets = 1 << int(np.ceil(np.log2(n_buckets)))
        self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)

    # -- build ---------------------------------------------------------
    def insert_many(self, hashes: np.ndarray) -> int:
        """Insert 64-bit key hashes; returns number that failed (filter
        too full — callers size by n_keys so this is ~0)."""
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        b1 = _bucket1(h, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)

        pending_fp, pending_b = fp, b1
        alt = b2
        # vector passes: try to place everyone in their current bucket;
        # those that don't fit switch to the alternate; repeat
        for _pass in range(8):
            if len(pending_fp) == 0:
                return 0
            placed = np.zeros(len(pending_fp), dtype=bool)
            order = np.argsort(pending_b, kind="stable")
            for idx in order:  # grouped by bucket: cheap slot assignment
                b = pending_b[idx]
                row = self.table[b]
                free = np.flatnonzero(row == 0)
                if free.size:
                    row[free[0]] = pending_fp[idx]
                    placed[idx] = True
            pending_fp = pending_fp[~placed]
            new_b = alt[~placed]
            alt = pending_b[~placed]
            pending_b = new_b

        # bounded eviction loop for the stragglers
        fails = 0
        for i in range(len(pending_fp)):
            f, b = int(pending_fp[i]), int(pending_b[i])
            ok = False
            for _ in range(_MAX_KICKS):
                row = self.table[b]
                free = np.flatnonzero(row == 0)
                if free.size:
                    row[free[0]] = f
                    ok = True
                    break
                j = int((f * 2654435761 + b) % _SLOTS)  # deterministic victim
                f, self.table[b, j] = int(self.table[b, j]), f
                b = int(
                    _alt_bucket(np.array([b], dtype=np.int64), np.array([f], dtype=np.uint16), self.n_buckets)[0]
                )
            if not ok:
                fails += 1
        return fails

    # -- probe ----------------------------------------------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        b1 = _bucket1(h, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    # -- delete ----------------------------------------------------------
    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per key; returns mask of keys
        actually deleted (the capability blooms lack)."""
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        b1 = _bucket1(h, self.n_buckets)
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        out = np.zeros(len(h), dtype=bool)
        for i in range(len(h)):  # deletes are rare control-plane ops
            for b in (b1[i], b2[i]):
                row = self.table[b]
                hit = np.flatnonzero(row == fp[i])
                if hit.size:
                    row[hit[0]] = 0
                    out[i] = True
                    break
        return out

    # -- (de)serialization ------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, n_buckets: int) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.n_buckets = n_buckets
        obj.table = np.frombuffer(bytearray(blob), dtype=np.uint16).reshape(n_buckets, _SLOTS).copy()
        return obj


# -- DataFrame-level sidecar (same layout contract as operators/bloom.py) --
#
# One cuckoo blob per host bucket; the ``m_bits`` column of
# bloom.SIDECAR_SCHEMA carries the cuckoo-internal bucket count instead of
# a bit length. Probing goes through bloom.probe(kind='cuckoo') — the
# bucket-cogrouped path, never the driver.


def build_filter(h: np.ndarray, filter_cls=None) -> "CuckooFilter":
    """Build a filter holding EVERY key in ``h`` — or raise.

    A key silently dropped here would later probe 'definitely new' and
    bypass the exact anti-join (bloom.dedup_with_bloom) — a false
    NEGATIVE, breaking the module's exactness contract. So the build must
    converge: double capacity until every insert lands (the 0.7-load
    sizing means the first attempt virtually always succeeds) and raise
    loudly rather than return a lossy filter."""
    cls = filter_cls or CuckooFilter
    n_keys = max(64, len(h))
    for attempt in range(8):
        cf = cls(n_keys=n_keys << attempt)
        if cf.insert_many(h) == 0:
            return cf
    raise RuntimeError(
        f"cuckoo build_filter: {len(h)} keys failed to place even at "
        f"{n_keys << 7} capacity"
    )


def build_delta(delta, url_col: str = "url", n_buckets: int = 64):
    """One delta cuckoo-filter row per bucket for a wave's new URLs."""
    import pandas as pd
    from pyspark.sql import functions as F

    from .bloom import SIDECAR_SCHEMA

    keyed = delta.select(
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.xxhash64(F.col(url_col)).alias("h"),
    )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        h = pdf["h"].to_numpy().astype(np.uint64)
        cf = build_filter(h)
        return pd.DataFrame(
            {
                "bucket": [b],
                "m_bits": [cf.n_buckets],
                "bits": [cf.to_bytes()],
                "n_keys": [len(h)],
            }
        )

    return keyed.groupBy("bucket").applyInPandas(per_bucket, SIDECAR_SCHEMA)


def delete_keys(sidecar, keys, url_col: str = "url", n_buckets: int = 64):
    """Retire previously-inserted keys from the sidecar (TTL / recrawl).

    The deletion capability blooms lack (Fan et al. §3.3): cogroup the
    keys-to-delete with the sidecar on bucket; each task removes one
    matching fingerprint per key, trying successive delta blobs until one
    yields. Only keys that were actually inserted may be deleted (the
    standard cuckoo-filter contract — deleting a never-inserted key could
    evict a sibling's fingerprint). Returns the updated sidecar."""
    import pandas as pd
    from pyspark.sql import functions as F

    from .bloom import SIDECAR_SCHEMA

    keyed = keys.select(
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.xxhash64(F.col(url_col)).alias("h"),
    )

    def per_bucket(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right) == 0:
            return pd.DataFrame({c: [] for c in ("bucket", "m_bits", "bits", "n_keys")}).astype(
                {"bucket": "int32", "m_bits": "int64", "n_keys": "int64", "bits": object}
            )
        filters = [
            CuckooFilter.from_bytes(bytes(blob), int(nb))
            for blob, nb in zip(right["bits"], right["m_bits"])
        ]
        remaining = left["h"].to_numpy().astype(np.uint64)
        deleted_per = [0] * len(filters)
        for i, cf in enumerate(filters):
            if len(remaining) == 0:
                break
            done = cf.delete_many(remaining)
            deleted_per[i] = int(done.sum())
            remaining = remaining[~done]
        return pd.DataFrame(
            {
                "bucket": right["bucket"].tolist(),
                "m_bits": right["m_bits"].tolist(),
                "bits": [cf.to_bytes() for cf in filters],
                "n_keys": [int(k) - d for k, d in zip(right["n_keys"], deleted_per)],
            }
        )

    return (
        keyed.groupBy("bucket")
        .cogroup(sidecar.groupBy("bucket"))
        .applyInPandas(per_bucket, SIDECAR_SCHEMA)
    )
