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
