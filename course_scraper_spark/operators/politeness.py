"""Per-host politeness scheduling.

The reference serializes fetches per source (semaphore ``max_concurrency=1``)
and sleeps ``crawl_delay + random()`` after every fetch
(``src/crawler.py:150,168``, ``src/render_utils.py:58``) — an implicit
~1 URL/s/host ceiling. In a parallel engine that becomes an explicit
*schedule*: within a wave, every URL gets a per-host slot
(``row_number() over (partition by host order by seq)``) and a start time
``(slot-1) * crawl_delay``; URLs whose start time exceeds the wave's time
budget are **deferred** — they stay in the frontier with their original
sequence (priority carried over), exactly like the reference's queue
backlog behind a slow host.

Scheduling never changes WHAT gets crawled, only WHEN — the equality
invariants (seen set, visit order) are unaffected because deferral
preserves seq order per host and the anti-join happens before
scheduling. Used by the throughput path (bench) and exported as the
``q_politeness_schedule`` oracle-checked query; the streaming form is
``streaming/waves.streaming_politeness_slots``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import assign_seq

DEFAULT_CRAWL_DELAY = 1.0  # crawler.py:150: rp.crawl_delay("*") or 1.0


def with_schedule(
    wave: DataFrame,
    robots: DataFrame | None = None,
    robots_rows: int | None = None,
) -> DataFrame:
    """Add ``slot`` (1-based per-host fetch ordinal) and ``sched_time``
    (seconds after wave start). ``robots``: (host, crawl_delay) — a
    per-host dim, broadcast only below ROBOTS_BROADCAST_THRESHOLD rows
    (pass ``robots_rows`` from the loop to skip the count job).

    The slot rank routes through the adaptive two-phase ranking
    (operators/ranking.py): small waves take one per-host window; big
    waves range-partition so a Zipf mega-host never funnels its whole
    frontier share through a single window task. (source_id, url)
    tiebreakers keep the slot deterministic when two sources sharing a
    host collide on seq."""
    if robots is not None:
        from .robots import robots_dim_side

        wave = wave.join(
            robots_dim_side(robots.select("host", "crawl_delay"), robots_rows), "host", "left"
        )
    else:
        wave = wave.withColumn("crawl_delay", F.lit(None).cast("double"))
    delay = F.coalesce(F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY))
    tiebreak = [c for c in ("source_id", "url") if c in wave.columns]
    ranked = assign_seq(wave, "host", ["seq", *tiebreak], seq_col="slot")
    return (
        ranked.withColumn("slot", F.col("slot").cast("int"))
        .withColumn("sched_time", (F.col("slot") - 1) * delay)
        .drop("crawl_delay")
    )


def split_by_budget(
    scheduled: DataFrame, budget_s: float
) -> tuple[DataFrame, DataFrame]:
    """(fetch_now, deferred): rows whose sched_time fits the wave budget
    vs the carry-over that stays in the frontier."""
    now = scheduled.filter(F.col("sched_time") < F.lit(budget_s))
    deferred = scheduled.filter(F.col("sched_time") >= F.lit(budget_s)).drop(
        "slot", "sched_time"
    )
    return now, deferred


def host_budget(robots: DataFrame | None, wave_seconds: float) -> DataFrame | None:
    """URLs/wave ceiling per host = floor(wave_seconds / crawl_delay)."""
    if robots is None:
        return None
    delay = F.coalesce(F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY))
    return robots.select(
        "host", F.floor(F.lit(wave_seconds) / delay).cast("int").alias("max_urls_per_wave")
    )
