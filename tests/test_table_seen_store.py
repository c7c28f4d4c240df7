"""TableSeenStore: the durable (Iceberg-able) twin of the in-memory
co-partitioned seen store. Backend-parameterized like
test_table_backends.py — the parquet emulation always runs, the Iceberg
backend skips cleanly without the runtime jar. Pins:

* contract — anti_join / semi_rows / union equal the in-memory store's
  over the same deltas;
* durability — every wave delta is committed; a `load` from the table
  after a 'restart' rebuilds the same seen set and keeps anti-joining
  correctly;
* plan shape (emulated) — after load, the per-wave anti-join still
  exchanges ONLY the candidate side (one Exchange however many deltas);
  on real Iceberg the same shape comes from the bucketed scan itself
  (seen_store.SPJ_CONFS, storage-partitioned joins);
* loop wiring — crawl_sources(seen_store_factory=...) produces the
  identical seen set AND leaves the full seen set in the table.
"""

import uuid

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators.seen_store import (
    SPJ_CONFS,
    PartitionedSeenStore,
    TableSeenStore,
)
from course_scraper_spark.storage.iceberg import IcebergTable, iceberg_available
from course_scraper_spark.storage.snaptable import SnapshotTable

from course_scraper_spark.plans import audit


def _delta(spark, k, n=400):
    return spark.range(k * n, (k + 1) * n).select(
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
    )


@pytest.fixture(params=["snaptable", "iceberg"])
def make_table(request, spark, tmp_path):
    if request.param == "snaptable":
        def make(name):
            return SnapshotTable.create(spark, str(tmp_path / name), bucket_col="url")
        return make
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar / catalog not configured in this environment")
    confs = dict(spark.sparkContext.getConf().getAll())
    catalog = sorted(
        k.split(".")[3]
        for k in confs
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3
    )[0]
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.seen_db")
    for k, v in SPJ_CONFS.items():
        spark.conf.set(k, v)

    def make(name):
        ident = f"{catalog}.seen_db.{name}_{uuid.uuid4().hex[:8]}"
        return IcebergTable.create(spark, ident, bucket_col="url", n_buckets=8)

    return make


def test_contract_matches_inmemory_store(spark, make_table):
    table = make_table("contract")
    ts = TableSeenStore(spark, table, n_partitions=8)
    mem = PartitionedSeenStore(spark, ("source_id", "url"), n_partitions=8)
    for k in range(3):
        ts.add_delta(_delta(spark, k))
        mem.add_delta(_delta(spark, k))

    cand = spark.range(900).select(
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source_id"),
        F.concat(F.lit("u"), (F.col("id") * 2).cast("string")).alias("url"),
    )
    got = sorted(map(tuple, ts.anti_join(cand).collect()))
    want = sorted(map(tuple, mem.anti_join(cand).collect()))
    assert got == want and got  # non-trivial

    keys = cand.limit(100)
    got_s = sorted(map(tuple, ts.semi_rows(keys, ["source_id", "url"]).collect()))
    want_s = sorted(map(tuple, mem.semi_rows(keys, ["source_id", "url"]).collect()))
    assert got_s == want_s

    assert ts.union().count() == mem.union().count() == 1200


def test_durable_load_after_restart(spark, make_table):
    table = make_table("resume")
    ts = TableSeenStore(spark, table, n_partitions=8)
    for k in range(3):
        ts.add_delta(_delta(spark, k))

    # 'restart': a fresh store rebuilt from the table alone
    reloaded = TableSeenStore.load(spark, table, n_partitions=8)
    assert sorted(map(tuple, reloaded.union().collect())) == sorted(
        map(tuple, ts.union().collect())
    )
    # and it keeps working: a post-restart wave anti-joins + commits
    cand = _delta(spark, 1).unionByName(_delta(spark, 5))
    fresh = reloaded.anti_join(cand)
    assert fresh.count() == 400  # delta-1 rows are seen, delta-5 rows new
    reloaded.add_delta(fresh)
    assert reloaded.union().count() == 1600
    assert TableSeenStore.load(spark, table).union().count() == 1600


def test_loaded_store_single_candidate_exchange(spark, tmp_path):
    """Emulated plan pin: the parquet scan can't carry partitioning
    metadata, so load() re-partitions ONCE at load — after that, the
    anti-join chain exchanges only the candidate side, exactly the
    in-memory store's plan (on Iceberg the scan itself reports
    KeyGroupedPartitioning and even the load repartition disappears)."""
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        table = SnapshotTable.create(spark, str(tmp_path / "plan"), bucket_col="url")
        ts = TableSeenStore(spark, table, n_partitions=8)
        for k in range(2):
            ts.add_delta(_delta(spark, k))
        reloaded = TableSeenStore.load(spark, table, n_partitions=8)
        reloaded.add_delta(_delta(spark, 2))  # post-restart wave delta

        # single-scan candidate frame (a unioned candidate side would
        # legitimately split the chain into per-branch joins)
        cand = (
            spark.range(2400)
            .filter((F.col("id") < 400) | (F.col("id") >= 1600))
            .select(
                F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source_id"),
                F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            )
        )
        out = reloaded.anti_join(cand)
        out.count()  # finalize adaptive plan
        plan = audit.plan_string(out, "simple")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert plan.count("SortMergeJoin") == 2, plan  # loaded-fold + new delta
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)


def test_crawl_loop_with_table_store(spark, tmp_path):
    """seen_store_factory wiring: the BFS loop over a synthetic world
    with a table-backed store yields the identical seen set as the
    default in-memory store, and the table ends up holding the full
    seen set (durable per-wave commits)."""
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.synth.world import WorldSpec, build_pages, build_sources

    spec = WorldSpec(n_hosts=3, total_pages=150)
    pages = spark.createDataFrame(build_pages(spec)).cache()
    sources = build_sources(spec)

    table = SnapshotTable.create(spark, str(tmp_path / "crawlseen"), bucket_col="url")
    res_tbl = crawl_sources(
        spark,
        sources,
        pages,
        copartition_seen=True,
        seen_store_factory=lambda: TableSeenStore(
            spark, table, ("source_id", "url"), n_partitions=4
        ),
    )
    res_mem = crawl_sources(spark, sources, pages, copartition_seen=True)
    got = sorted(map(tuple, res_tbl.seen.collect()))
    assert got == sorted(map(tuple, res_mem.seen.collect()))
    # durable: the table alone reconstructs the same seen set
    assert sorted(
        map(tuple, TableSeenStore.load(spark, table).union().collect())
    ) == got


def test_budgeted_loop_with_table_store(spark, tmp_path):
    """The budgeted loop accepts the same seen_store_factory: identical
    seen set vs the in-memory store, and the table reconstructs it."""
    from course_scraper_spark.operators.frontier import crawl_sources_budgeted
    from course_scraper_spark.synth.world import WorldSpec, build_pages, build_sources

    spec = WorldSpec(n_hosts=3, total_pages=150)
    pages = spark.createDataFrame(build_pages(spec)).cache()
    sources = build_sources(spec)
    hosts = [(s.root_url.split("/")[2], 0.5) for s in sources]
    robots = spark.createDataFrame(hosts, "host string, crawl_delay double")

    table = SnapshotTable.create(spark, str(tmp_path / "bseen"), bucket_col="url")
    res_tbl = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=5.0,
        copartition_seen=True,
        seen_store_factory=lambda: TableSeenStore(
            spark, table, ("source_id", "url"), n_partitions=4
        ),
    )
    res_mem = crawl_sources_budgeted(
        spark, sources, pages, robots=robots, round_budget_s=5.0,
        copartition_seen=True,
    )
    got = sorted((r.source_id, r.url) for r in res_tbl.seen.select("source_id", "url").collect())
    want = sorted((r.source_id, r.url) for r in res_mem.seen.select("source_id", "url").collect())
    assert got == want
    durable = sorted(
        (r.source_id, r.url)
        for r in TableSeenStore.load(spark, table).union().select("source_id", "url").collect()
    )
    assert durable == got
