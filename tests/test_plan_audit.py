"""Plan contracts: pushdown reaches the parquet scan, column pruning
works, small dims broadcast, no accidental cartesian products."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from course_scraper_spark.plans import audit

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("n_chars") > 300).select("doc_id")
    pf = audit.pushed_filters(df)
    assert "GreaterThan(n_chars" in pf, pf


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    n = audit.scan_column_count(df)
    assert 0 < n <= 2, audit.read_schema(df)


def test_anti_join_query_broadcasts(spark):
    df = entrymod.q_task_anti_join(spark, SF)
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_no_cartesian_in_contract_queries(spark):
    qs = entrymod.queries()
    for name in ("q_merge_upsert", "q_first_occurrence_dedup", "q_exact_dedup", "q_token_stats"):
        df = qs[name](spark, SF)
        assert not audit.has_cartesian(df), name


def test_codegen_present_in_builtin_pipeline(spark):
    df = entrymod.q_token_stats(spark, SF)
    assert audit.codegen_stage_count(df) >= 1


def test_robots_disallow_is_pure_codegen(spark):
    """The Disallow filter is Column algebra — no Python UDF node may
    appear in its plan (BatchEvalPython / ArrowEvalPython / mapInPandas)."""
    from course_scraper_spark.operators.robots import filter_disallowed

    frontier = spark.createDataFrame(
        [("a.edu", f"https://a.edu/p{i}") for i in range(100)], ["host", "url"]
    )
    robots = spark.createDataFrame(
        [("a.edu", 1.0, ["/private/"])], "host string, crawl_delay double, disallow array<string>"
    )
    plan = audit.plan_string(filter_disallowed(frontier, robots), "simple")
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas", "MapInPandas"):
        assert node not in plan, node
    assert audit.has_broadcast_join(filter_disallowed(frontier, robots))


def test_salted_repartition_single_shuffle(spark):
    """salting = hot-key count + ONE repartition exchange; the data path
    must not pick up extra exchanges."""
    from course_scraper_spark.operators.salting import salted_repartition

    df = spark.createDataFrame(
        [("h.edu", f"https://h.edu/p{i}") for i in range(1000)], ["host", "url"]
    )
    out = salted_repartition(df, "host", n_salts=4, threshold=10, num_partitions=8)
    plan = audit.plan_string(out, "simple")
    # exactly one REPARTITION exchange on the data path; the only other
    # exchange allowed is the hot-key count's partial-agg shuffle (tiny,
    # separate subtree feeding the broadcast)
    import re

    repartitions = re.findall(r"REPARTITION_BY_NUM", plan)
    assert len(repartitions) == 1, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan


def test_fused_fetch_is_single_python_stage(spark, spec, pages):
    """The fusion contract: fetch_extract_http is ONE MapInPandas node —
    page html never crosses the Arrow boundary — while the two-step form
    pays two Python stages with the html column between them."""
    from course_scraper_spark.operators.fetch import NO_SLEEP, fetch_extract_http, fetch_http
    from course_scraper_spark.operators.frontier import _LINKS_SCHEMA, _extract_links
    from course_scraper_spark.synth.transport import spec_transport_factory

    wave = (
        pages.select("url")
        .withColumn("source_id", F.lit("s"))
        .withColumn("seq", F.monotonically_increasing_id())
        .withColumn("depth", F.lit(0))
        .withColumn("is_mc", F.col("url").contains("mc-catalog"))
    )
    factory = spec_transport_factory(spec)
    fused_plan = audit.plan_string(fetch_extract_http(wave, factory, sleep_fn=NO_SLEEP), "simple")
    assert fused_plan.count("MapInPandas") == 1, fused_plan
    two_step = (
        fetch_http(wave, factory, sleep_fn=NO_SLEEP)
        .filter(F.col("ok"))
        .select(
            "source_id", F.col("url").alias("page_url"), F.col("seq").alias("parent_seq"),
            "depth", "html", "is_mc",
        )
        .mapInPandas(_extract_links, _LINKS_SCHEMA)
    )
    assert audit.plan_string(two_step, "simple").count("MapInPandas") == 2


def test_seen_store_anti_join_single_exchange(spark):
    """The co-partitioned seen store's contract: however many deltas the
    seen set spans, the per-wave anti-join exchanges ONLY the candidate
    side — the checkpointed deltas' hash partitioning satisfies the
    join's required distribution (zero Exchange, zero Sort on the seen
    side), with AQE enabled for the join itself."""
    from course_scraper_spark.operators.seen_store import PartitionedSeenStore

    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ (the at-scale shape)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        store = PartitionedSeenStore(spark, ("source_id", "url"), n_partitions=8)
        for k in range(3):
            store.add_delta(
                spark.range(k * 1000, (k + 1) * 1000).select(
                    F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source_id"),
                    F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
                )
            )
        cand = spark.range(500).select(
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source_id"),
            F.concat(F.lit("u"), (F.col("id") * 7).cast("string")).alias("url"),
        )
        out = store.anti_join(cand)
        n = out.count()  # finalize the adaptive plan
        plan = audit.plan_string(out, "simple")
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert plan.count("SortMergeJoin") == 3, plan
        # correctness: chain == anti-join against the union
        want = cand.join(store.union().select("source_id", "url"), ["source_id", "url"], "left_anti")
        assert n == want.count()
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_seen_store_semi_rows_no_delta_exchange(spark):
    """The store's lookup primitive (re-admission overlay): per-delta
    left-semi joins keep the delta sides exchange-free — only the
    candidate keys move — and the result equals a plain semi-join
    against the union."""
    from course_scraper_spark.operators.seen_store import PartitionedSeenStore

    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        store = PartitionedSeenStore(spark, ("source_id", "url"), n_partitions=8)
        for k in range(3):
            store.add_delta(
                spark.range(k * 1000, (k + 1) * 1000).select(
                    F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source_id"),
                    F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
                    (F.col("id") % 7).cast("int").alias("depth"),
                )
            )
        keys = spark.range(300).select(
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source_id"),
            F.concat(F.lit("u"), (F.col("id") * 5).cast("string")).alias("url"),
        ).localCheckpoint(eager=True)
        got = store.semi_rows(keys, ["source_id", "url", "depth"])
        got.count()
        plan = audit.plan_string(got, "simple")
        # one exchange per delta for the KEY side only; the three delta
        # legs contribute none (their checkpointed partitioning holds)
        n_joins = plan.count("SortMergeJoin")
        n_exch = plan.count("Exchange hashpartitioning")
        assert n_joins == 3 and n_exch <= 3, plan
        want = store.union().select("source_id", "url", "depth").join(
            keys, ["source_id", "url"], "left_semi"
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
