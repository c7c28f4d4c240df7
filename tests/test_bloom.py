"""Bloom sidecar: no false negatives ever (correctness), useful prune
rate (performance), exact dedup unchanged with the prefilter on."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators.bloom import build_delta, compact, dedup_with_bloom, probe


@pytest.fixture(scope="module")
def seen_df(spark):
    return spark.createDataFrame(
        [(f"s{i % 3}", f"https://h{i % 5}.edu/p{i}.html") for i in range(2000)],
        ["source_id", "url"],
    ).cache()


@pytest.fixture(scope="module")
def sidecar(spark, seen_df):
    return compact(build_delta(seen_df, n_buckets=16)).cache()


def test_no_false_negatives(spark, seen_df, sidecar):
    probed = probe(seen_df, sidecar, n_buckets=16)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_prune_rate_on_new_urls(spark, sidecar):
    new = spark.createDataFrame(
        [("sX", f"https://new{i}.org/q{i}") for i in range(2000)], ["source_id", "url"]
    )
    probed = probe(new, sidecar, n_buckets=16)
    fp = probed.filter(F.col("maybe_seen")).count() / 2000
    assert fp < 0.05, f"false-positive rate too high: {fp}"


def test_dedup_with_bloom_is_exact(spark, seen_df, sidecar):
    half_old = spark.createDataFrame(
        [(f"s{i % 3}", f"https://h{i % 5}.edu/p{i}.html") for i in range(0, 2000, 2)]
        + [("s0", f"https://brand-new.org/x{i}") for i in range(500)],
        ["source_id", "url"],
    )
    got = dedup_with_bloom(half_old, seen_df, sidecar, keys=["source_id", "url"], n_buckets=16)
    naive = half_old.join(seen_df, ["source_id", "url"], "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_incremental_deltas_union(spark):
    a = spark.createDataFrame([("s", f"u{i}") for i in range(300)], ["source_id", "url"])
    b = spark.createDataFrame([("s", f"v{i}") for i in range(300)], ["source_id", "url"])
    sidecar = build_delta(a, n_buckets=4).unionByName(build_delta(b, n_buckets=4))
    both = a.unionByName(b)
    assert probe(both, sidecar, n_buckets=4).filter(~F.col("maybe_seen")).count() == 0


def test_probe_plan_is_cogrouped_not_collected(spark, seen_df, sidecar):
    """The sidecar must reach tasks via the bucket cogroup (shuffle), not a
    driver collect + closure capture — the north-rule scale contract."""
    plan = probe(seen_df, sidecar, n_buckets=16)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_compact_folds_mixed_sizes_no_false_negatives(spark):
    """Deltas of different sizes (300 vs 30000 keys -> different pow2 m)
    fold to the smallest m with zero false negatives."""
    small = spark.createDataFrame([("s", f"u{i}") for i in range(300)], ["source_id", "url"])
    big = spark.createDataFrame([("s", f"v{i}") for i in range(30000)], ["source_id", "url"])
    sidecar = build_delta(small, n_buckets=4).unionByName(build_delta(big, n_buckets=4))
    ms = {r.m_bits for r in sidecar.select("m_bits").distinct().collect()}
    assert len(ms) > 1, "fixture must produce mixed filter sizes"
    folded = compact(sidecar).cache()
    assert folded.count() == 4  # one blob per bucket
    both = small.unionByName(big)
    assert probe(both, folded, n_buckets=4).filter("NOT maybe_seen").count() == 0
    # and it still prunes: fresh keys mostly probe as definitely-new
    fresh = spark.createDataFrame([("s", f"w{i}") for i in range(5000)], ["source_id", "url"])
    fp = probe(fresh, folded, n_buckets=4).filter("maybe_seen").count() / 5000
    assert fp < 0.2, fp


def test_buckets_for_corpus_scales():
    from course_scraper_spark.operators.bloom import buckets_for_corpus

    assert buckets_for_corpus(1_000_000) == 64          # floor
    assert buckets_for_corpus(10 ** 10) == 1024          # 10^10/10M -> 2^10
    assert buckets_for_corpus(10 ** 11) > buckets_for_corpus(10 ** 10)
    # power of two (aligns with the splitmix-remixed internal hashing)
    n = buckets_for_corpus(3 * 10 ** 9)
    assert n & (n - 1) == 0
