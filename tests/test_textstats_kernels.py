"""Round-6 kernel equality: every Arrow textstats kernel must produce
exactly the rows its Column-algebra reference form (`*_column`) does —
including null text, empty text, whitespace-only text, U+00A0 (must NOT
split: ASCII \\s contract) and short-token edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators import textstats as TS

EDGE_TEXTS = [
    ("a", None),
    ("b", ""),
    ("c", "   \t \n "),
    ("d", "one"),
    ("e", "one two"),
    ("f", "one two three four five"),
    ("g", "The THE the AND of to in la le der die und das nicht"),
    ("h", "word glued stays together here right"),
    ("i", "punct..,;;::!!?? heavy!!! text? with, lots; of: marks."),
    ("j", "extraordinarily incomprehensible internationalization tokens"),
    ("k", "  leading and trailing   "),
    ("l", "el la de que y el la de que y"),
    ("m", "UPPER CASE SHOUTING TEXT WITH THE AND OF"),
    ("n", "nbsp\u00a0stays one token the and of"),
]

PAIRS = [
    (TS.token_count, TS.token_count_column),
    (TS.subword_estimate, TS.subword_estimate_column),
    (TS.stopword_ratio, TS.stopword_ratio_column),
    (TS.punct_ratio, TS.punct_ratio_column),
    (TS.upper_ratio, TS.upper_ratio_column),
    (TS.quality_score, TS.quality_score_column),
    (TS.lang_id, TS.lang_id_column),
    (TS.fingerprint, TS.fingerprint_column),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id string, text string").cache()


@pytest.mark.parametrize("kernel,column", PAIRS, ids=[k.__name__ for k, _ in PAIRS])
def test_kernel_equals_column_on_edges(spark, edge_df, kernel, column):
    got = {
        r["doc_id"]: r["v"]
        for r in edge_df.select("doc_id", kernel(F.col("text")).alias("v")).collect()
    }
    want = {
        r["doc_id"]: r["v"]
        for r in edge_df.select("doc_id", column(F.col("text")).alias("v")).collect()
    }
    assert got == want


def test_kernels_equal_columns_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()
    for kernel, column in PAIRS:
        got = [
            r["v"]
            for r in docs.select(kernel(F.col("text")).alias("v"))
            .orderBy("v")
            .collect()
        ]
        want = [
            r["v"]
            for r in docs.select(column(F.col("text")).alias("v"))
            .orderBy("v")
            .collect()
        ]
        assert got == want, kernel.__name__
    docs.unpersist()
