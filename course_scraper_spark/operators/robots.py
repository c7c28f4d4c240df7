"""robots.txt rule application (north-star: "robots.txt rules +
crawl-delay budgets").

The reference parses robots.txt but reads ONLY the crawl delay
(``src/crawler.py:144-150`` — ``rp.crawl_delay("*") or 1.0``); Disallow
lines never gate its frontier. The equality paths therefore stay
delay-only; :func:`filter_disallowed` is the semantic superset behind the
``obey_disallow`` flag on the budgeted crawl: URLs whose path starts with
any of the host's Disallow prefixes are dropped from the frontier before
scheduling — never fetched, never expanded.

Pure Column algebra (broadcast dim join + ``exists`` over the prefix
array): whole-stage codegen, no UDF, scales with the frontier scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import urls as U

# Above this many robots rows the per-host dim stops being force-broadcast:
# a web-scale robots table (millions of hosts x multi-KB disallow prefix
# arrays) can run multi-GB — past any safe broadcast size — so the join
# falls back to the planner's choice (shuffle join at real scale, where
# stats are accurate). Same pattern as frontier.BROADCAST_WAVE_THRESHOLD.
ROBOTS_BROADCAST_THRESHOLD = 1_000_000


def robots_dim_side(
    rules: DataFrame, n_rows: int | None, threshold: int | None = None
) -> DataFrame:
    """Broadcast-hint the robots dim only below the row threshold
    (``None`` = the module's ROBOTS_BROADCAST_THRESHOLD, read at call
    time). ``n_rows=None`` counts once (callers in a loop should count
    the static dim up front and pass it through)."""
    if threshold is None:
        threshold = ROBOTS_BROADCAST_THRESHOLD
    if n_rows is None:
        n_rows = rules.count()
    return F.broadcast(rules) if n_rows <= threshold else rules


def filter_disallowed(
    frontier: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    robots_rows: int | None = None,
    broadcast_threshold: int | None = None,
) -> DataFrame:
    """Remove frontier rows matching a robots Disallow prefix of their host.

    ``robots``: (host, ..., disallow: array<string> of path prefixes) —
    a per-host dim table, broadcast below ``broadcast_threshold`` rows
    (guarded — see :data:`ROBOTS_BROADCAST_THRESHOLD`). Hosts absent from
    robots (or with an empty/null disallow list) pass through:
    everything-allowed default, matching urllib.robotparser's behavior
    for a missing file.
    """
    rules = robots.select(F.col("host").alias("_r_host"), F.col("disallow").alias("_disallow"))
    path = U.path_of(F.col(url_col))
    blocked = F.exists("_disallow", lambda p: path.startswith(p))
    rules = robots_dim_side(rules, robots_rows, broadcast_threshold)
    return (
        frontier.join(rules, frontier[host_col] == F.col("_r_host"), "left")
        .filter(~F.coalesce(blocked, F.lit(False)))
        .drop("_r_host", "_disallow")
    )
