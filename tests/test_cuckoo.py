"""Cuckoo filter: no false negatives, low FP rate, delete works (the
capability the bloom sidecar lacks), serialization round-trip."""

import numpy as np
import pytest

from course_scraper_spark.operators.cuckoo import CuckooFilter


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives():
    keys = _hashes(20000, 1)
    cf = CuckooFilter(len(keys))
    fails = cf.insert_many(keys)
    assert fails == 0
    assert cf.contains_many(keys).all()


def test_false_positive_rate():
    keys = _hashes(20000, 2)
    cf = CuckooFilter(len(keys))
    cf.insert_many(keys)
    probe = _hashes(20000, 3)
    fp = cf.contains_many(probe).mean()
    assert fp < 0.01, fp  # 16-bit fingerprints -> ~2*4/2^16 ≈ 0.012% per bucket pair


def test_delete_then_absent():
    keys = _hashes(5000, 4)
    cf = CuckooFilter(len(keys))
    cf.insert_many(keys)
    victims = keys[:100]
    deleted = cf.delete_many(victims)
    assert deleted.all()
    # victims now absent (their fingerprints were unique w.h.p.)
    assert cf.contains_many(victims).mean() < 0.05
    # everyone else still present
    assert cf.contains_many(keys[100:]).all()


def test_serialization_roundtrip():
    keys = _hashes(1000, 5)
    cf = CuckooFilter(len(keys))
    cf.insert_many(keys)
    clone = CuckooFilter.from_bytes(cf.to_bytes(), cf.n_buckets)
    assert clone.contains_many(keys).all()


# -- DataFrame-level sidecar (bucket-cogrouped, shared layout with bloom) --


def test_sidecar_build_probe_no_false_negatives(spark):
    from course_scraper_spark.operators import cuckoo
    from course_scraper_spark.operators.bloom import probe

    seen = spark.createDataFrame(
        [("s", f"https://h{i % 7}.edu/p{i}") for i in range(3000)], ["source_id", "url"]
    )
    sidecar = cuckoo.build_delta(seen, n_buckets=8)
    probed = probe(seen, sidecar, n_buckets=8, kind="cuckoo")
    assert probed.filter("NOT maybe_seen").count() == 0


def test_sidecar_delete_roundtrip_ttl_recrawl(spark):
    """TTL/recrawl: retire URLs from the sidecar so they probe as new again
    — the deletion capability the bloom sidecar lacks."""
    from pyspark.sql import functions as F

    from course_scraper_spark.operators import cuckoo
    from course_scraper_spark.operators.bloom import probe

    seen = spark.createDataFrame(
        [("s", f"https://h.edu/p{i}") for i in range(2000)], ["source_id", "url"]
    )
    sidecar = cuckoo.build_delta(seen, n_buckets=8).cache()
    expired = seen.filter(F.col("url").rlike("p1[0-9]{2}$"))  # p100..p199
    n_expired = expired.count()
    assert n_expired == 100
    updated = cuckoo.delete_keys(sidecar, expired, n_buckets=8).cache()
    # expired keys now (w.h.p.) probe as definitely-new → eligible for recrawl
    re_probed = probe(expired, updated, n_buckets=8, kind="cuckoo")
    assert re_probed.filter("maybe_seen").count() < 0.05 * n_expired
    # everyone else still has no false negatives
    kept = seen.join(expired, ["source_id", "url"], "left_anti")
    assert probe(kept, updated, n_buckets=8, kind="cuckoo").filter("NOT maybe_seen").count() == 0
