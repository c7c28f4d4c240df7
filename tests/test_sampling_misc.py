"""Stratified sampling (O2 deterministic variant), F9 catalog filter,
S8 prefilter, reporting (O5), YAML source loading (S1)."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.config import load_sources_yaml
from course_scraper_spark.functions.urls import catalog_url_filter
from course_scraper_spark.operators.prefilter import head_prefilter
from course_scraper_spark.operators.sampling import stratified_sample
from course_scraper_spark.reporting import run_summary


def test_stratified_sample_quota(spark):
    # one page, 2 strata x 6 candidates, budget 6 -> quota 3 each
    rows = [("p", f"https://h.edu/sec{s}/x{i}.html") for s in (1, 2) for i in range(6)]
    cand = spark.createDataFrame(rows, ["page_url", "full_url"])
    out = stratified_sample(cand, max_links_per_page=6)
    got = [r.full_url for r in out.collect()]
    assert len(got) == 6
    assert sum("sec1" in u for u in got) == 3 and sum("sec2" in u for u in got) == 3
    # deterministic across runs
    again = [r.full_url for r in stratified_sample(cand, max_links_per_page=6).collect()]
    assert sorted(got) == sorted(again)


def test_stratified_sample_budget_smaller_than_strata(spark):
    rows = [("p", f"https://h.edu/s{s}/x.html") for s in range(5)]
    cand = spark.createDataFrame(rows, ["page_url", "full_url"])
    # K // S = 0 -> nothing survives (reference quota arithmetic,
    # crawler.py:109-110)
    assert stratified_sample(cand, max_links_per_page=4).count() == 0


def test_catalog_url_filter(spark):
    rows = [
        ("https://x.edu/catalog/courses", True),
        ("https://x.edu/about", False),
        ("https://x.com/catalog", False),  # no .edu
        ("https://x.edu/catalog/file.pdf", False),  # pdf
        ("https://y.edu/bulletin/current", True),
    ]
    df = spark.createDataFrame(rows, ["url", "want"])
    for r in df.select("want", catalog_url_filter(F.col("url")).alias("got")).collect():
        assert r.got == r.want


def test_head_prefilter(spark):
    pages = spark.createDataFrame(
        [("u1", 200), ("u2", 404), ("u3", 200)], ["url", "status_code"]
    )
    targets = spark.createDataFrame([("s", "u1"), ("s", "u2"), ("s", "u4")], ["source_id", "url"])
    got = {r.url for r in head_prefilter(targets, pages).collect()}
    assert got == {"u1"}


def test_run_summary_sorted(spark):
    urls = spark.createDataFrame(
        [("b", "u1", True), ("b", "u2", False), ("a", "u3", True)],
        ["source_id", "url", "is_target"],
    )
    courses = spark.createDataFrame([("b", "c1")], ["source_id", "course_id"])
    sources_df = spark.createDataFrame([("a", "alpha"), ("b", "beta")], ["source_id", "name"])
    rows = run_summary(urls, courses, sources_df).collect()
    assert [r.name for r in rows] == ["alpha", "beta"]
    assert rows[1].n_urls == 2 and rows[1].n_targets == 1 and rows[1].n_courses == 1
    assert rows[0].n_courses == 0


def test_load_sources_yaml(tmp_path):
    p = tmp_path / "sources.yaml"
    p.write_text(
        """
sources:
  - name: demo
    root_url: https://h.edu/catalog/
    schema_url: https://h.edu/catalog/p1.html
    crawl_depth: 3
    url_exclude_patterns: ["archive"]
"""
    )
    srcs = load_sources_yaml(str(p))
    assert len(srcs) == 1
    s = srcs[0]
    assert s.source_id == "LOCAL_demo"  # config.py:48 default
    assert s.crawl_depth == 3 and s.url_exclude_patterns == ["archive"]
    assert s.max_concurrency == 1 and s.include_external is False  # defaults


def test_write_json_debug_roundtrip(spark, tmp_path):
    """K8 JSON debug sink (storage.py:320-333): rows round-trip through
    the JSON dump."""
    import json, glob

    from course_scraper_spark.reporting import write_json_debug

    df = spark.createDataFrame(
        [(1, "Intro to Data", 3.0), (2, "Calculus", 4.0)], ["course_id", "title", "credits"]
    )
    out = str(tmp_path / "debug_json")
    write_json_debug(df, out)
    rows = []
    for f in glob.glob(f"{out}/part-*.json"):
        with open(f) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert sorted((r["course_id"], r["title"], r["credits"]) for r in rows) == [
        (1, "Intro to Data", 3.0),
        (2, "Calculus", 4.0),
    ]


def test_replicate_documents_preserves_dup_structure(spark):
    """Large-world bench corpus (synth/docs.py): factor-x blow-up keeps
    variant 0 byte-identical, scales exact-dup surplus by exactly the
    factor (intra-variant structure preserved), and never collides ids."""
    from pyspark.sql import functions as F

    from course_scraper_spark.operators import dedup as D
    from course_scraper_spark.synth.docs import replicate_documents, replicate_embeddings

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40),  # dup of 1
            (3, "totally different words in this other document here now", "en", "s", 50),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    big = replicate_documents(docs, 4).cache()
    assert big.count() == 12
    assert big.select("doc_id").distinct().count() == 12
    v0 = {r.doc_id: r.text for r in big.filter(F.col("doc_id") < 10**9).collect()}
    assert v0 == {r.doc_id: r.text for r in docs.collect()}
    d0 = D.exact_dedup(docs).agg(F.sum(F.col("n_dups") - 1)).first()[0]
    dN = D.exact_dedup(big).agg(F.sum(F.col("n_dups") - 1)).first()[0]
    assert dN == 4 * d0

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.5, 0.25], 0), (2, [0.0, 1.0, 0.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    bige = replicate_embeddings(emb, 3).cache()
    assert bige.count() == 6
    rows = {r.vec_id: list(r.embedding) for r in bige.collect()}
    assert rows[1] == [1.0, 0.0, 0.5, 0.25]          # variant 0 untouched
    assert rows[1 + 10**9] == [0.0, 0.5, 0.25, 1.0]  # rotated by 1
