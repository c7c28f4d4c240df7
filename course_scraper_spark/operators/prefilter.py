"""HEAD-check prefilter (S8 — reference ``src/prefilter.py:28-57``,
wired but disabled at main.py:168-169).

The reference issues concurrent HEAD requests (GET on 405) and keeps
URLs answering 200 before scraping. Against the synthetic web this is a
semi-join on the alive set; on a live cluster the status column comes
from a lightweight HEAD pass inside a mapInPandas fetch UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def head_prefilter(targets: DataFrame, pages: DataFrame) -> DataFrame:
    """Keep target URLs whose page answers 200 (left_semi on alive)."""
    alive = pages.filter(F.col("status_code") == 200).select("url")
    return targets.join(alive, "url", "left_semi")
