"""Run summary reporting (reference ``src/reporting.py``: per-source
counts sorted by source name — O5, reporting.py:31)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_summary(urls: DataFrame, courses: DataFrame, sources_df: DataFrame) -> DataFrame:
    """(source_id, name, n_urls, n_targets, n_courses) ordered by name."""
    url_stats = urls.groupBy("source_id").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("n_targets"),
    )
    course_stats = courses.groupBy("source_id").agg(F.count(F.lit(1)).alias("n_courses"))
    return (
        sources_df.select("source_id", "name")
        .join(url_stats, "source_id", "left")
        .join(course_stats, "source_id", "left")
        .fillna(0, ["n_urls", "n_targets", "n_courses"])
        .orderBy("name")
    )


def write_json_debug(df: DataFrame, path: str) -> None:
    """K8 (storage.py:320-333): dev-only JSON dump of a table."""
    df.coalesce(1).write.mode("overwrite").json(path)
