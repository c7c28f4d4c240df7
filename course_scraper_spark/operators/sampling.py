"""Stratified per-page link sampling (O2/A3/A4).

The reference's ``DynamicSampler`` (crawler.py:96-124) caps fan-out when
``max_links_per_page`` is set: candidates from one page are bucketed by
``section_key`` (path minus last segment, crawler.py:77-82), the budget K
is split evenly across the S strata present on that page (``quota =
K // S``, crawler.py:109-110), and each stratum is reservoir-sampled to
the quota with ``random.randint`` (Algorithm R, crawler.py:84-94).

Reservoir randomness is unreproducible, so equality paths keep the
reference default ``max_links_per_page=None`` (config.py:27 — the
equality contract never samples). This operator is the *deterministic*
replacement for the scale path: rank within each (page, stratum) by a
seeded hash and keep ``rank <= quota`` — same quota arithmetic, stable
across reruns and partitionings (SURVEY.md §2.5/§2.6 O2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import section_key


def stratified_sample(
    candidates: DataFrame,
    max_links_per_page: int,
    page_col: str = "page_url",
    url_col: str = "full_url",
    seed: int = 42,
) -> DataFrame:
    """Keep ≤ quota candidates per (page, section stratum), quota =
    max_links_per_page // n_strata_on_page."""
    df = candidates.withColumn("_sec", section_key(F.col(url_col)))
    strata = Window.partitionBy(page_col)
    df = df.withColumn("_n_strata", F.size(F.collect_set("_sec").over(strata)))
    quota = F.greatest(
        F.floor(F.lit(max_links_per_page) / F.col("_n_strata")).cast("int"), F.lit(0)
    )
    rank_w = Window.partitionBy(page_col, "_sec").orderBy(
        F.xxhash64(F.col(url_col), F.lit(seed)), F.col(url_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(rank_w))
        .filter(F.col("_rk") <= quota)
        .drop("_sec", "_n_strata", "_rk")
    )
