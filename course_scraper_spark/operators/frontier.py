"""The URL frontier: BFS wave loop as DataFrame jobs.

Re-creates the reference's single-process BFS (``src/crawler.py:126-272``)
as one Catalyst job per depth wave over ALL sources simultaneously:

    wave_d  --join pages-->  fetch  --mapInPandas-->  links
      --strip/filter F1-F5-->  candidates  --left_anti seen-->
      --first-occurrence dedup-->  wave_{d+1}  --assign_seq-->  seen ∪=

Design notes for the 10^10-URL case:

* ALL sources ride one DataFrame per wave — job count is O(depth), not
  O(sources × depth).
* the seen-set anti-join is keyed (source_id, url): exact, and the only
  correctness-bearing dedup. The bloom sidecar (operators/bloom.py) is a
  pure prefilter in front of it.
* per-source FIFO visit order is reconstructed with the two-phase ranking
  in operators/ranking.py — no global-window single-partition sort.
* per-wave ``localCheckpoint`` truncates the iterative lineage; with a
  snapshot table (storage/snaptable.py) the checkpoint doubles as the
  resumable Iceberg-style snapshot.
* mega-host skew: candidate link extraction partitions by input file
  splits; the explicit ``repartition`` before the UDF spreads a skewed
  host by url hash (salting); AQE skew-join handles the rest.

Reference-semantics invariants (tests/test_frontier_equality.py):

* generic branch: seen-then-stop at ``depth == max_depth``
  (crawler.py:232-236) — depth-max URLs ARE visited, never expanded.
* Modern-Campus branch: ``depth >= max_depth`` skips before marking seen
  (crawler.py:186-189); ``preview_course_nopop.php`` URLs enter the seen
  set without being visited (crawler.py:211-212); only
  ``tr>td[colspan=2]>a`` hrefs containing ``content.php`` are enqueued
  (crawler.py:214-226).
* candidates are checked against seen at extraction time; in-wave
  duplicates resolve at pop — equivalent to anti-join against
  (seen ∪ current wave) + first-occurrence dedup (proof in module tests).
* fetch failures keep the URL in seen but yield no links
  (crawler.py:191-196,238-243).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import SourceConfig
from ..functions import urls as U
from ..functions.htmlmini import extract_hrefs, extract_mc_listing_hrefs
from .ranking import assign_seq_lazy

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("visited", T.BooleanType(), False),
    ]
)

_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("page_url", T.StringType(), False),
        T.StructField("parent_seq", T.LongType(), False),
        T.StructField("parent_depth", T.IntegerType(), False),
        T.StructField("link_pos", T.IntegerType(), False),
        T.StructField("stream", T.StringType(), False),
        T.StructField("href", T.StringType(), False),
    ]
)


def _extract_links(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: page HTML -> exploded hrefs with document positions.

    Streams: 'anchor' = every <a href> (crawler.py:200,248);
    'mc_listing' = tr>td[colspan=2]>a (crawler.py:214), emitted only for
    Modern-Campus sources.
    """
    cols = ("source_id", "page_url", "parent_seq", "parent_depth", "link_pos", "stream", "href")
    for pdf in batches:
        out = {k: [] for k in cols}
        for sid, url, seq, dep, html, is_mc in zip(
            pdf["source_id"], pdf["page_url"], pdf["parent_seq"], pdf["depth"], pdf["html"], pdf["is_mc"]
        ):
            for pos, href in enumerate(extract_hrefs(html)):
                out["source_id"].append(sid)
                out["page_url"].append(url)
                out["parent_seq"].append(seq)
                out["parent_depth"].append(dep)
                out["link_pos"].append(pos)
                out["stream"].append("anchor")
                out["href"].append(href)
            if is_mc:
                for pos, href in enumerate(extract_mc_listing_hrefs(html)):
                    out["source_id"].append(sid)
                    out["page_url"].append(url)
                    out["parent_seq"].append(seq)
                    out["parent_depth"].append(dep)
                    out["link_pos"].append(pos)
                    out["stream"].append("mc_listing")
                    out["href"].append(href)
        yield pd.DataFrame(out)


@dataclass
class SourceRuntime:
    """Per-source crawl parameters resolved at start (root fetch)."""

    source: SourceConfig
    is_mc: bool
    scope_domain: str
    root_path: str

    @property
    def excl_regex(self) -> str:
        return "|".join(f"(?:{p})" for p in self.source.effective_exclude_patterns)


@dataclass
class WaveMetrics:
    depth: int
    wave_size: int
    new_urls: int


@dataclass
class CrawlResult:
    seen: DataFrame  # SEEN_SCHEMA; visited=False rows are MC previews
    failed_sources: list[str] = field(default_factory=list)
    metrics: list[WaveMetrics] = field(default_factory=list)

    def seen_urls(self, source_id: str) -> list[str]:
        """Sorted final seen set, as the reference returns it (crawler.py:63)."""
        return [
            r.url
            for r in self.seen.filter(F.col("source_id") == source_id)
            .select("url")
            .orderBy("url")
            .collect()
        ]

    def visit_order(self, source_id: str) -> list[tuple[str, int]]:
        return [
            (r.url, r.depth)
            for r in self.seen.filter((F.col("source_id") == source_id) & F.col("visited"))
            .select("url", "depth", "seq")
            .orderBy("seq")
            .collect()
        ]


def _root_probe(pages: DataFrame, root_urls: list[str]) -> DataFrame:
    """The root-fetch projection: (url, status_code, is_mc) ONLY.

    The Modern-Campus substring check runs executor-side inside the scan
    (``contains``), so the collect ships one boolean per source — never
    the html column. At O(100k sources) x ~100 KB pages, collecting html
    would be ~10 GB on the driver for one bit per row."""
    return pages.filter(F.col("url").isin(root_urls)).select(
        "url",
        "status_code",
        F.col("html").contains("Modern Campus Catalog").alias("is_mc"),
    )


def _build_runtimes(
    sources: list[SourceConfig], by_url: dict
) -> tuple[list[SourceRuntime], list[str]]:
    runtimes, failed = [], []
    for s in sources:
        r = by_url.get(s.root_url)
        if r is None or r.status_code >= 400:
            failed.append(s.source_id)
            continue
        domain, root_path = U.scope_root(s.root_url, s.url_base_exclude)
        runtimes.append(
            SourceRuntime(
                source=s,
                is_mc=bool(r.is_mc),
                scope_domain=domain,
                root_path=root_path,
            )
        )
    return runtimes, failed


def resolve_sources(
    spark: SparkSession, sources: list[SourceConfig], pages: DataFrame
) -> tuple[list[SourceRuntime], list[str]]:
    """Root fetch + Modern-Campus detection (crawler.py:179-184).

    The reference's root fetch has no retry/fallback and aborts the
    source on any HTTP error (``raise_for_status``, crawler.py:180).
    One tiny job: semi-join pages to the root URL list, collecting only
    (url, status_code, is_mc) — see :func:`_root_probe`.
    """
    roots = {s.root_url: s for s in sources}
    by_url = {r.url: r for r in _root_probe(pages, list(roots)).collect()}
    return _build_runtimes(sources, by_url)


def resolve_sources_transport(
    spark: SparkSession, sources: list[SourceConfig], transport_factory
) -> tuple[list[SourceRuntime], list[str]]:
    """Root fetch over a live transport (the ``fetch='http'`` twin of
    :func:`resolve_sources`): distributed single-GET probe, boolean-only
    collect — same crawler.py:179-184 semantics."""
    from .fetch import http_root_probe

    roots = list({s.root_url for s in sources})
    by_url = {r.url: r for r in http_root_probe(spark, roots, transport_factory).collect()}
    return _build_runtimes(sources, by_url)


def _dim_df(spark: SparkSession, runtimes: list[SourceRuntime]) -> DataFrame:
    rows = [
        (
            rt.source.source_id,
            rt.is_mc,
            rt.scope_domain,
            rt.root_path,
            bool(rt.source.include_external),
            rt.excl_regex,
            int(rt.source.crawl_depth),
        )
        for rt in runtimes
    ]
    return spark.createDataFrame(
        rows,
        "source_id string, is_mc boolean, scope_domain string, root_path string, "
        "include_external boolean, excl_regex string, max_depth int",
    )


def fetch_ok_col() -> F.Column:
    """The render_utils.py:43-102 ladder as a Column predicate: static
    success, or retry-then-Playwright fallback for 403/404/429 when the
    page is dynamic-renderable. 5xx and static-only error pages fail."""
    return (F.col("status_code") < 400) | (
        F.col("status_code").isin(403, 404, 429) & (F.col("fetch_mode") == "dynamic")
    )


# Above this many frontier rows the fetch join stops broadcasting the wave
# side: a multi-million-URL wave shipped to every executor OOMs the driver.
# Below it, broadcasting keeps the page-body table from shuffling (html is
# the heavy column). The join only exists in the synthetic harness — a live
# cluster fetches over HTTP inside the UDF — but the budgeted/scale loop
# shares the code path, so the guard is enforced (tests/test_plan_audit.py).
BROADCAST_WAVE_THRESHOLD = 1_000_000

# 'auto' co-partitioned seen store kicks in above this many seen rows:
# below it, per-wave delta repartition + chained joins cost more fixed
# overhead than the seen reshuffle they avoid (measured +1.5-2.5 s/wave
# at a 1.1k-URL world); above it, the per-wave reshuffle of the growing
# seen side dominates and the store wins. The big-world scaling bench
# (tools/scaling_bench.py, >=100k URLs) crosses it; the toy bench does
# not.
COPARTITION_SEEN_THRESHOLD = 50_000
# Frontier-growth estimate that routes a wave's seq ranking onto the
# two-phase range path (ranking.assign_seq_lazy) BEFORE the new-URL
# count is known. The ranked set is new_urls AFTER seen-anti-join and
# first-occurrence dedup — empirically ≤ ~1.3× the previous wave even
# in the exponential phase (measured: 27k→51k→65k→70k on the heavy
# 200k world), so prev × 2 is a safe routing bound; the raw
# links-per-page fan-out (12-16×) is the wrong quantity and measured
# −11 s/crawl at the 200k world by pushing every mid-size wave through
# the two-phase checkpoint+counts jobs. Mis-routing is benign in both
# directions: overestimate = two extra small jobs; underestimate = one
# window task per SOURCE carries that source's wave (only a mega-wave
# in a SINGLE source actually funnels, and the two-phase path re-engages
# the next wave once prev × 2 crosses the threshold).
EST_WAVE_BRANCHING = 2


def _fetch_join(wave_slim: DataFrame, pages_slim: DataFrame, wave_rows: int | None,
                broadcast_threshold: int) -> DataFrame:
    left = (
        F.broadcast(wave_slim)
        if wave_rows is not None and wave_rows <= broadcast_threshold
        else wave_slim
    )
    return left.join(pages_slim, wave_slim.url == pages_slim.p_url, "inner")


def _filter_builder(kind: str):
    """Delta-builder for the seen-filter sidecar ('bloom' | 'cuckoo')."""
    if kind == "cuckoo":
        from .cuckoo import build_delta as bd
    elif kind == "bloom":
        from .bloom import build_delta as bd
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown seen-filter kind: {kind!r}")
    return bd


def crawl_sources(
    spark: SparkSession,
    sources: list[SourceConfig],
    pages: DataFrame,
    make_root_filter: bool = True,
    candidate_partitions: int | None = None,
    checkpoint: bool = True,
    state_store=None,
    resume: bool = False,
    max_waves: int | None = None,
    use_bloom: bool = False,
    use_filter: str | None = None,
    bloom_buckets: int = 64,
    metrics_store=None,
    run_id: str = "run",
    salt_hosts_threshold: int | None = None,
    broadcast_wave_threshold: int = BROADCAST_WAVE_THRESHOLD,
    fetch: str = "join",
    transport_factory=None,
    fetch_kwargs: dict | None = None,
    copartition_seen: bool | str = "auto",
    seen_store_factory=None,
) -> CrawlResult:
    """Run the full BFS to fixpoint for every source in one wave loop.

    ``fetch='http'`` swaps the synthetic lookup join for the live
    mapInPandas HTTP ladder (operators/fetch.py) driven by
    ``transport_factory`` — the deployment path; ``fetch='join'`` (the
    default) resolves against the ``pages`` table. Both produce identical
    fetched sets for a transport serving the same world
    (tests/test_fetch_http.py). ``fetch_kwargs`` passes through to
    :func:`~course_scraper_spark.operators.fetch.fetch_http`
    (e.g. ``{'sleep_fn': NO_SLEEP}`` for synthetic transports; the default backs off with real time.sleep).

    With ``state_store`` (a :class:`~course_scraper_spark.storage.crawl_state
    .CrawlStateStore`) every wave commits its seen-set delta as a tagged
    snapshot; ``resume=True`` continues from the last committed wave.
    ``max_waves`` stops early after N committed waves (kill/resume tests).

    ``use_filter`` ('bloom' or 'cuckoo'; ``use_bloom=True`` is the
    back-compat spelling of 'bloom') maintains the per-bucket seen-filter
    sidecar as a bucket-aligned DataFrame across waves — built as deltas,
    probed via the bucket-cogrouped path in operators/bloom.py, NEVER
    collected to the driver — and prefilters candidates before the exact
    anti-join. Identical results (the filters have no false negatives;
    positives hit the exact join), fewer anti-join probes.

    ``copartition_seen``: route the seen anti-join through the
    co-partitioned delta store (operators/seen_store.py) so the growing
    seen side never reshuffles. ``'auto'`` (default) switches on above
    ``COPARTITION_SEEN_THRESHOLD`` accumulated rows; ``True`` forces it
    from wave 0 (equality tests); ``False`` disables. Results identical
    either way (anti-join distributes over the delta union).

    ``seen_store_factory``: zero-arg callable returning the store to use
    when the co-partitioned path engages — pass
    ``lambda: TableSeenStore(spark, table)`` (operators/seen_store.py)
    to persist every wave delta to a bucketed Iceberg/snapshot table
    (durable, resumable seen set) while keeping the identical join plan.
    """
    if fetch not in ("join", "http"):
        raise ValueError(f"fetch must be 'join' or 'http', got {fetch!r}")
    if fetch == "http":
        if transport_factory is None:
            raise ValueError("fetch='http' requires a transport_factory")
        runtimes, failed = resolve_sources_transport(spark, sources, transport_factory)
    else:
        runtimes, failed = resolve_sources(spark, sources, pages)
    result = CrawlResult(seen=spark.createDataFrame([], SEEN_SCHEMA), failed_sources=failed)
    if not runtimes:
        return result
    dim = F.broadcast(_dim_df(spark, runtimes))
    parts = candidate_partitions or spark.sparkContext.defaultParallelism

    pages_slim = pages.select(
        F.col("url").alias("p_url"), "host", "html", "status_code", "fetch_mode"
    )

    # co-partitioned seen store (in-memory path only): per-wave deltas are
    # hash-partitioned ONCE on the anti-join keys, so the growing seen
    # side never reshuffles — the anti-join chains over the deltas and
    # only the candidate side is exchanged (operators/seen_store.py).
    # ADAPTIVE like the other thresholds in this engine (broadcast
    # guards, CC branches): below COPARTITION_SEEN_THRESHOLD rows the
    # per-wave fixed cost of delta repartition + chained joins exceeds
    # the reshuffle it saves (measured: +1.5-2.5 s/wave at a 1.1k-URL
    # world), so 'auto' switches the loop onto the store only once the
    # accumulated seen crosses the threshold (the switch repartitions
    # the current seen once, then deltas chain). The snapshot-store path
    # reads seen back from storage instead; its co-partitioned form is
    # the bucketed Iceberg table (storage/iceberg.py).
    store = None
    store_eligible = state_store is None and checkpoint and copartition_seen is not False

    def _make_store():
        if seen_store_factory is not None:
            return seen_store_factory()
        from .seen_store import PartitionedSeenStore

        return PartitionedSeenStore(spark, ("source_id", "url"), n_partitions=parts)

    if store_eligible and copartition_seen is True:
        store = _make_store()

    resumed = None
    if state_store is not None and resume:
        resumed = state_store.latest_wave()
    if resumed is not None:
        depth, seq_base, snap = resumed
        seen = state_store.read_seen(snap)
        wave = seen.filter(F.col("visited") & (F.col("depth") == depth)).select(
            "source_id", "url", "host", "depth", "seq"
        )
        wave_rows = wave.count()
    else:
        # wave 0: roots, seq 1 per source
        wave = spark.createDataFrame(
            [(rt.source.source_id, rt.source.root_url, rt.scope_domain, 0, 1) for rt in runtimes],
            "source_id string, url string, host string, depth int, seq long",
        )
        seen = wave.withColumn("visited", F.lit(True))
        seq_base = {rt.source.source_id: 1 for rt in runtimes}
        depth = 0
        wave_rows = len(runtimes)
        if state_store is not None:
            state_store.save_wave(0, seen, seq_base)
            seen = state_store.read_seen()
        elif store is not None:
            seen = store.add_delta(seen)
            wave = seen.drop("visited")
            seen = store.union()
        elif checkpoint:
            seen = seen.localCheckpoint(eager=True)
            wave = seen.drop("visited")
    max_depth_overall = max(rt.source.crawl_depth for rt in runtimes)
    waves_run = 0
    seen_rows_est = wave_rows  # tracks accumulated seen for the 'auto' switch

    bloom_key = F.concat_ws("|", F.col("source_id"), F.col("url"))
    filter_kind = use_filter or ("bloom" if use_bloom else None)
    sidecar: DataFrame | None = None
    if filter_kind is not None:
        build_delta = _filter_builder(filter_kind)
        # the sidecar stays a bucket-aligned TABLE for its whole life:
        # checkpointed per delta (same discipline as the seen set), probed
        # via bucket-cogrouped applyInPandas — no driver collect, no task-
        # closure capture, so a 10^10-key filter never converges on one node.
        sidecar = build_delta(
            seen.withColumn("_k", bloom_key), url_col="_k", n_buckets=bloom_buckets
        ).localCheckpoint(eager=True)

    while depth < max_depth_overall:
        if max_waves is not None and waves_run >= max_waves:
            break
        # -- expand filter: generic never expands AT max depth
        #    (crawler.py:235); MC waves are already < max by construction.
        expandable = (
            wave.join(dim, "source_id")
            .filter(F.col("is_mc") | (F.col("depth") < F.col("max_depth")))
        )

        # Fetch = lookup into the synthetic web. Broadcast the WAVE side:
        # the page-body table must never shuffle (2GB of html through the
        # exchange per wave measured 20-50s of IO noise). Inner join ==
        # left join here: URLs without a page row have null status and
        # are dropped by fetch_ok anyway (they stay in seen — the
        # dead-fetch path). On a live cluster pass fetch='http' — the
        # ladder in operators/fetch.py runs inside the UDF and no join
        # exists at all; the broadcast is a synthetic-harness artifact,
        # not the scale design.
        if metrics_store is not None and fetch != "http":
            # per-host-bucket lineage (north rule): fetched/failed per
            # host per wave, including URLs with no page row at all
            from .metrics import fetch_stats_per_host

            joined_m = expandable.select("source_id", "url", "host").join(
                pages_slim.select("p_url", "status_code", "fetch_mode"),
                F.col("url") == F.col("p_url"),
                "left",
            )
            metrics_store.record_wave(run_id, depth, fetch_stats_per_host(joined_m))

        wave_slim = expandable.select("source_id", "url", "host", "seq", "depth", "is_mc")
        if salt_hosts_threshold is not None:
            # the fetch runs INSIDE the UDF over the wave's own
            # partitioning — spread Zipf mega-hosts before that stage
            from .salting import salted_repartition

            wave_slim = salted_repartition(
                wave_slim, "host", threshold=salt_hosts_threshold, salt_col="url"
            )
        fetched_raw = None
        links_pre = None
        if fetch == "http":
            # live path: the HTTP ladder runs inside the UDF over the
            # wave's partitioning — no join with a pages table exists.
            # Fused fetch+extract either way: page html never crosses
            # Arrow. With metrics, the fused UDF emits in-band per-host
            # aggregates (split back out below) so the production path
            # feeds partition_metrics without un-fusing.
            #
            # The wave is EXPLICITLY spread before the UDF (unless the
            # salting stage already did): the wave inherits the delta
            # checkpoint's partitioning, which AQE's size-based
            # coalescing shrinks to 1-2 partitions for a few-MB delta —
            # measured at the 200k world: a 70k-URL fetch stage ran as
            # TWO tasks on local[8] (16 s on 2 cores, 6 idle), the
            # dominant loop-scaling killer. An explicit numbered
            # repartition is exempt from AQE coalescing; the shuffle
            # moves only slim (source_id,url,host,seq,depth,is_mc)
            # rows, never page bodies.
            if salt_hosts_threshold is None and wave_rows and wave_rows > 1000:
                # size-gated: a toy wave's extra shuffle costs more
                # latency than the spread buys (measured +0.5 s/wave on
                # the 1.5k-page bench world); coalescing starvation only
                # matters once a wave carries real CPU work
                wave_slim = wave_slim.repartition(parts * 2)
            from .fetch import fetch_extract_http, split_fused_output

            if metrics_store is not None:
                # persist: the stats append AND the link pipeline both
                # consume the fused output — fetch each URL once
                fetched_raw = fetch_extract_http(
                    wave_slim, transport_factory, with_stats=True,
                    **(fetch_kwargs or {}),
                ).persist()
                links_pre, wave_stats = split_fused_output(fetched_raw)
                metrics_store.record_wave(run_id, depth, wave_stats)
            else:
                links_pre = fetch_extract_http(
                    wave_slim, transport_factory, **(fetch_kwargs or {})
                )
        else:
            fetched = (
                _fetch_join(
                    wave_slim.drop("host"), pages_slim, wave_rows, broadcast_wave_threshold
                )
                .filter(fetch_ok_col())
                .select(
                    "source_id",
                    F.col("url").alias("page_url"),
                    F.col("seq").alias("parent_seq"),
                    "depth",
                    "html",
                    "is_mc",
                )
            )
            # In broadcast mode the scan partitioning of pages carries to
            # the UDF stage — page html never shuffles; above the
            # threshold the join shuffles both sides on url hash
            # (uniform, skew-free).

        links = (
            links_pre
            if links_pre is not None
            else fetched.mapInPandas(_extract_links, _LINKS_SCHEMA)
        ).join(dim, "source_id")

        href2 = U.strip_fragment(F.col("href"))
        cand = (
            links.withColumn("href2", href2)
            .filter(U.is_followable(F.col("href2")))
            .withColumn("full_url", U.absolutize(F.col("page_url"), F.col("href2")))
        )
        scope_ok = F.col("include_external") | (
            (U.host_of(F.col("full_url")) == F.col("scope_domain"))
            & (
                U.path_of(F.col("full_url")).startswith(F.col("root_path"))
                if make_root_filter
                else F.lit(True)
            )
        )
        cand = cand.filter(scope_ok & ~F.rlike(F.col("full_url"), F.col("excl_regex")))
        # one wave = one pass through fetch+extract: the candidate set
        # feeds previews, the anti-join AND the ranking collect, so pin it
        cand = cand.persist()

        # MC side-channel: previews -> seen without visiting
        # (crawler.py:211-212). Skipped entirely when NO source is
        # Modern-Campus (resolve time knows): the subplan is a
        # dedup + anti-join chain per wave, i.e. several scheduler
        # barriers that an all-generic crawl pays for nothing.
        if any(rt.is_mc for rt in runtimes):
            previews = (
                cand.filter(
                    F.col("is_mc")
                    & (F.col("stream") == "anchor")
                    & F.col("full_url").contains("preview_course_nopop.php")
                )
                .select("source_id", F.col("full_url").alias("url"))
                .dropDuplicates(["source_id", "url"])
                .transform(
                    lambda d: store.anti_join(d)
                    if store is not None
                    else d.join(seen.select("source_id", "url"), ["source_id", "url"], "left_anti")
                )
                .select(
                    "source_id",
                    "url",
                    U.host_of(F.col("url")).alias("host"),
                    F.lit(None).cast("int").alias("depth"),
                    F.lit(None).cast("long").alias("seq"),
                    F.lit(False).alias("visited"),
                )
            )
        else:
            previews = spark.createDataFrame([], SEEN_SCHEMA)

        # queue candidates: generic = every anchor; MC = listing links to
        # content.php. Depth gate differs per branch (crawler.py:187 vs 235).
        next_depth = depth + 1
        queue_cand = cand.filter(
            F.when(
                F.col("is_mc"),
                (F.col("stream") == "mc_listing")
                & F.col("full_url").contains("content.php")
                & (F.lit(next_depth) < F.col("max_depth")),
            ).otherwise(
                (F.col("stream") == "anchor") & (F.lit(next_depth) <= F.col("max_depth"))
            )
        ).select("source_id", F.col("full_url").alias("url"), "parent_seq", "link_pos")

        if filter_kind is not None:
            from .bloom import dedup_with_bloom

            new_urls = dedup_with_bloom(
                queue_cand.withColumn("_k", bloom_key),
                seen,
                sidecar,
                keys=["source_id", "url"],
                url_col="_k",
                n_buckets=bloom_buckets,
                kind=filter_kind,
                anti_join_fn=store.anti_join if store is not None else None,
            ).drop("_k")
        elif store is not None:
            new_urls = store.anti_join(queue_cand)
        else:
            new_urls = queue_cand.join(
                seen.select("source_id", "url"), ["source_id", "url"], "left_anti"
            )
        # first-occurrence dedup inside the wave: earliest (parent_seq,
        # link_pos) wins — the queue-insertion order of the reference.
        first = (
            new_urls.groupBy("source_id", "url")
            .agg(F.min(F.struct("parent_seq", "link_pos")).alias("k"))
            .select("source_id", "url", F.col("k.parent_seq").alias("parent_seq"), F.col("k.link_pos").alias("link_pos"))
        )
        # jobs/wave fold (round 5): rank LAZILY, materialize the delta
        # ONCE, then read the per-source totals back from the
        # materialized delta at block-read cost. The old shape
        # (assign_seq_with_totals) collected totals in a pre-job that
        # ran the whole candidate pipeline, then the delta checkpoint
        # ran the anti-join/agg/window AGAIN — two executions and two
        # driver actions per wave where one of each suffices.
        ranked = assign_seq_lazy(
            first,
            "source_id",
            ["parent_seq", "link_pos"],
            seq_col="rel_seq",
            est_rows=wave_rows * EST_WAVE_BRANCHING if wave_rows else None,
            num_partitions=parts,
        )
        base_df = F.broadcast(
            spark.createDataFrame(
                sorted(seq_base.items()), "source_id string, base long"
            )
        )
        # LEFT join + coalesce(base, 0) (round 6, advice): an inner join
        # would silently DROP any ranked row whose source_id is missing
        # from seq_base (reachable via a state-store resume whose saved
        # seq_base predates an added source); the coalesce reproduces
        # the historical `seq_base.get(sid, 0)` fallback instead.
        new_wave = (
            ranked.join(base_df, "source_id", "left")
            .select(
                "source_id",
                "url",
                U.host_of(F.col("url")).alias("host"),
                F.lit(next_depth).alias("depth"),
                (F.col("rel_seq") + F.coalesce(F.col("base"), F.lit(0))).alias("seq"),
            )
        )
        delta = new_wave.withColumn("visited", F.lit(True)).unionByName(previews)

        if (
            store is None
            and store_eligible
            and copartition_seen == "auto"
            and seen_rows_est > COPARTITION_SEEN_THRESHOLD
        ):
            # 'auto' switch: seed the store with the accumulated seen
            # (one repartition, once) — every later delta chains with
            # zero reshuffles of the seen side. Decided on the PRE-wave
            # estimate (this wave's n_new isn't known until the delta
            # materializes below), so the store engages one wave after
            # the threshold crossing — a heuristic either way.
            store = _make_store()
            seen = store.add_delta(seen)
            seen = store.union()

        # the wave's single materialization point. Round 6: the
        # checkpoint is LAZY — the totals collect right below is the
        # first action on it, so ONE job materializes the checkpoint
        # (truncating the iterative lineage exactly as before) AND
        # returns the per-source counts, where the old eager+collect
        # pair ran two jobs and two passes per wave.
        if store is not None:
            delta = store.add_delta(delta)
        elif checkpoint or state_store is not None:
            delta = delta.localCheckpoint(eager=False)
        totals_rows = (
            delta.filter(F.col("visited"))
            .groupBy("source_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        totals = {r["source_id"]: r["n"] for r in totals_rows}
        n_new = sum(totals.values())
        for sid, n in totals.items():
            seq_base[sid] = seq_base.get(sid, 0) + n
        seen_rows_est += n_new

        if filter_kind is not None:
            sidecar = sidecar.unionByName(
                _filter_builder(filter_kind)(
                    delta.withColumn("_k", bloom_key), url_col="_k", n_buckets=bloom_buckets
                ).localCheckpoint(eager=True)
            )
            if filter_kind == "bloom" and (waves_run + 1) % 8 == 0:
                # bound probe fan-out: one blob per wave accumulates, so
                # fold the deltas every 8 waves (bloom only — cuckoo
                # fingerprint tables don't OR-merge)
                from .bloom import compact

                sidecar = compact(sidecar).localCheckpoint(eager=True)
        if state_store is not None:
            state_store.save_wave(next_depth, delta, seq_base)
            seen = state_store.read_seen()
            wave = seen.filter(F.col("visited") & (F.col("depth") == next_depth)).select(
                "source_id", "url", "host", "depth", "seq"
            )
        elif store is not None:
            # the delta was partitioned on the anti-join keys ONCE, at
            # birth (seen_store.add_delta above) — the next waves'
            # anti-joins chain over the checkpointed deltas with zero
            # exchanges on the seen side. seen stays a union view.
            seen = store.union()
            wave = delta.filter(F.col("visited")).select(
                "source_id", "url", "host", "depth", "seq"
            )
        else:
            # non-co-partitioned path: the delta checkpoint above
            # truncates the iterative lineage to a leaf; with
            # checkpoint=False (debug) seen stays a raw union of plans
            seen = seen.unionByName(delta)
            wave = delta.filter(F.col("visited")).select(
                "source_id", "url", "host", "depth", "seq"
            )
        cand.unpersist()
        if fetched_raw is not None and fetched_raw.is_cached:
            fetched_raw.unpersist()
        result.metrics.append(WaveMetrics(depth=next_depth, wave_size=n_new, new_urls=n_new))
        depth = next_depth
        wave_rows = n_new
        waves_run += 1
        if n_new == 0:
            break

    result.seen = seen
    return result


def crawl_source(
    spark: SparkSession, source: SourceConfig, pages: DataFrame, **kw
) -> CrawlResult:
    return crawl_sources(spark, [source], pages, **kw)


def crawl_sources_budgeted(
    spark: SparkSession,
    sources: list[SourceConfig],
    pages: DataFrame,
    robots: DataFrame | None = None,
    round_budget_s: float = 60.0,
    make_root_filter: bool = True,
    max_rounds: int | None = None,
    salt_hosts_threshold: int | None = None,
    broadcast_wave_threshold: int = BROADCAST_WAVE_THRESHOLD,
    obey_disallow: bool = False,
    state_store=None,
    resume: bool = False,
    metrics_store=None,
    run_id: str = "run",
    fetch: str = "join",
    transport_factory=None,
    fetch_kwargs: dict | None = None,
    readmit_min_depth: bool = True,
    schedule_log: list | None = None,
    copartition_seen: bool | str = "auto",
    seen_store_factory=None,
) -> CrawlResult:
    """Priority-frontier crawl with per-host politeness budgets.

    The scale-mode loop (north-star "politeness scheduler + priority
    frontier queue"): instead of fetching a whole BFS wave, each ROUND
    schedules pending URLs per host (slot n fires at (n-1)·crawl_delay,
    operators/politeness.py) and fetches only those whose start time fits
    ``round_budget_s``; the excess stays in the frontier with its
    original priority (seq) and is scheduled first next round — the
    parallel form of the reference's serial crawl-delay sleeps
    (crawler.py:150,168, render_utils.py:58).

    The final seen SET equals the unbudgeted crawl exactly — budgets
    delay fetches, never drop them (tests/test_budgeted_crawl.py). The
    subtle case is ``include_external=True`` with heterogeneous per-host
    crawl delays: a URL first discovered via a DEEPER parent on a fast
    host (while its shallow parent waits behind a slow host) gets the
    deeper depth, and its subtree would be pruned at the depth horizon.
    ``readmit_min_depth`` (default on) closes that gap: when a seen URL
    is rediscovered via a shallower parent, it re-enters the frontier at
    the improved depth and its subtree is re-expanded — depths only
    decrease, so the loop terminates, and by induction on BFS depth the
    final set equals BFS (test_budgeted_readmission_multi_host). Visit
    ORDER always follows the schedule instead of strict BFS FIFO, so
    order-equality paths use :func:`crawl_sources`.

    ``salt_hosts_threshold``: spread hosts holding more than this many
    frontier rows across salt shards before the fetch stage
    (operators/salting.py). ``obey_disallow``: apply robots Disallow
    prefixes to the frontier (operators/robots.py; default off — the
    reference reads only crawl_delay). ``fetch='http'`` routes fetches
    through the live mapInPandas ladder (see :func:`crawl_sources`).

    Per-host fetch spacing holds ACROSS rounds, not just within one:
    ``politeness.next_round_offsets`` carries each host's cadence
    remainder over the round boundary (and decays it through rounds the
    host sits out entirely — the crawl_delay > budget regime), matching
    the reference's serial sleep-after-every-fetch
    (render_utils.py:58). ``schedule_log`` (test/debug introspection):
    a list that receives ``(round, host, url, sched_time)`` per fetched
    row — drives the spacing contract tests; leave None in production
    (it collects the schedule to the driver every round).
    """
    if fetch not in ("join", "http"):
        raise ValueError(f"fetch must be 'join' or 'http', got {fetch!r}")
    if fetch == "http":
        if transport_factory is None:
            raise ValueError("fetch='http' requires a transport_factory")
        runtimes, failed = resolve_sources_transport(spark, sources, transport_factory)
    else:
        runtimes, failed = resolve_sources(spark, sources, pages)
    result = CrawlResult(seen=spark.createDataFrame([], SEEN_SCHEMA), failed_sources=failed)
    if not runtimes:
        return result
    dim = F.broadcast(_dim_df(spark, runtimes))
    pages_slim = pages.select(
        F.col("url").alias("p_url"), "host", "html", "status_code", "fetch_mode"
    )

    # static dim: count once, so every schedule/robots join in the loop
    # can gate its broadcast without re-counting
    robots_rows = robots.count() if robots is not None else None

    pending = spark.createDataFrame(
        [(rt.source.source_id, rt.source.root_url, rt.scope_domain, 0, 1) for rt in runtimes],
        "source_id string, url string, host string, depth int, seq long",
    )
    if obey_disallow and robots is not None:
        # north-star "robots.txt rules": disallowed URLs never fetch, never
        # expand, never enter seen. Semantic FLAG, default off: the
        # reference reads only crawl_delay (crawler.py:144-150), so the
        # equality paths keep delay-only behavior.
        from .robots import filter_disallowed

        pending = filter_disallowed(pending, robots, robots_rows=robots_rows)
    resumed = state_store.latest_round() if (state_store is not None and resume) else None
    if resumed is not None:
        rounds, seq_base, snap = resumed
        seen = state_store.read_seen(snap)
        pending = state_store.read_pending(rounds)
        pending_rows_est = pending.count()  # once, at resume
    else:
        pending_rows_est = len(runtimes)
        seen = pending.withColumn("visited", F.lit(True)).localCheckpoint(eager=True)
        seq_base = {rt.source.source_id: 1 for rt in runtimes}
        rounds = 0
        if state_store is not None:
            # round 0 = the root set: without it, a resume would replay
            # only the per-round deltas and lose the roots from seen
            state_store.save_round(0, seen, pending, seq_base)

    # co-partitioned seen store, same adaptive contract as crawl_sources
    # (seen here is append-only too — re-admission improves expansion
    # state in `improvements`, never rewrites seen rows). The anti-joins
    # route through the delta chain once active; seen stays a union view
    # for the re-admission overlay and the final result.
    seen_store = None
    seen_rows_est = seen.count() if copartition_seen == "auto" else 0

    def _make_seen_store():
        if seen_store_factory is not None:
            return seen_store_factory()
        from .seen_store import PartitionedSeenStore

        return PartitionedSeenStore(
            spark, ("source_id", "url"),
            n_partitions=spark.sparkContext.defaultParallelism,
        )

    if copartition_seen is True:
        seen_store = _make_seen_store()
        seen = seen_store.add_delta(seen)
        seen = seen_store.union()

    from .politeness import next_round_offsets, split_by_budget, with_schedule

    # depth-improvement overlay for min-depth re-admission; in-memory
    # only — after a resume it rebuilds from seen's first-discovery
    # depths (an already-applied improvement may re-trigger one redundant
    # refetch, never a wrong set)
    improvements: DataFrame | None = None
    # per-host cadence carry-over: a host's last fetch near the round
    # boundary pushes its first slot next round, so per-host spacing
    # stays >= crawl_delay ACROSS rounds (render_utils.py:58 — the
    # reference's serial sleep never resets between waves)
    host_offsets: DataFrame | None = None

    while rounds < (max_rounds if max_rounds is not None else 10_000):
        rounds += 1
        # slot by seq = priority; host_offsets carries last round's
        # cadence. wave_rows: tracked frontier-size OVERESTIMATE so the
        # lazy ranking picks two-phase before a Zipf host could funnel
        # a mega-frontier through one window task (round 6 — the eager
        # assign_seq totals pre-job is gone, see politeness.py).
        sched = with_schedule(
            pending, robots, robots_rows=robots_rows, host_offsets=host_offsets,
            wave_rows=pending_rows_est,
        )
        now, deferred = split_by_budget(sched, round_budget_s)
        if salt_hosts_threshold is not None:
            # the fetch stage runs over `now`'s own partitioning on a live
            # cluster — spread Zipf mega-hosts across salt shards first
            from .salting import salted_repartition

            now = salted_repartition(now, "host", threshold=salt_hosts_threshold, salt_col="url")
        # jobs/round fold (round 5): persist + count materializes the
        # schedule in ONE job where the old eager-checkpoint + count
        # pair took two. `now`'s lineage is a single window over the
        # checkpointed pending, so caching instead of checkpointing
        # adds no lineage depth; the offsets agg, the schedule_log
        # collect and the fetch pipeline all read the cache. Unpersisted
        # at end of round.
        now = now.persist()
        now_cached = now  # unpersist handle (`now` is re-derived below)
        n_now = now.count()
        if n_now == 0:
            now_cached.unpersist()
            # Distinguish "done" from "idle": with cadence carry-over a
            # round can fetch NOTHING while URLs still pend (every
            # pending host owes more than one whole budget —
            # crawl_delay > budget). The round still elapses, so offsets
            # decay by one budget; they strictly decrease, so the loop
            # always reaches a fetchable round or drains.
            if host_offsets is None or not pending.head(1):
                break
            host_offsets = (
                host_offsets.select(
                    "host",
                    F.greatest(F.lit(0.0), F.col("t0") - F.lit(round_budget_s)).alias("t0"),
                )
                .filter(F.col("t0") > 0)
                .localCheckpoint(eager=True)
            )
            continue
        host_offsets = next_round_offsets(
            now, host_offsets, robots, round_budget_s, robots_rows
        ).localCheckpoint(eager=True)
        if schedule_log is not None:
            schedule_log.extend(
                (rounds, r.host, r.url, r.sched_time)
                for r in now.select("host", "url", "sched_time").collect()
            )
        now = now.drop("slot", "sched_time")
        # deferred stays LAZY (fold: its old per-round checkpoint was a
        # whole extra job): the end-of-round pending checkpoint
        # materializes the same window-over-pending work once, inside
        # the job it already runs.

        if metrics_store is not None and fetch != "http":
            # per-host-bucket lineage (north rule), same shape as the BFS
            # loop: fetched/failed per host per round
            from .metrics import fetch_stats_per_host

            joined_m = now.select("source_id", "url", "host").join(
                pages_slim.select("p_url", "status_code", "fetch_mode"),
                F.col("url") == F.col("p_url"),
                "left",
            )
            metrics_store.record_wave(run_id, rounds, fetch_stats_per_host(joined_m))

        expandable = now.join(dim, "source_id").filter(
            F.col("is_mc") | (F.col("depth") < F.col("max_depth"))
        )
        fetched_raw = None
        links_pre = None
        if fetch == "http":
            wave_slim = expandable.select("source_id", "url", "host", "seq", "depth", "is_mc")
            # explicit spread before the CPU-heavy fused UDF unless the
            # salting stage already repartitioned — the round's frontier
            # inherits checkpoint partitioning that AQE may have
            # coalesced to 1-2 partitions (see crawl_sources)
            if salt_hosts_threshold is None and n_now > 1000:
                wave_slim = wave_slim.repartition(
                    spark.sparkContext.defaultParallelism * 2
                )
            # fused fetch+extract either way (html never crosses Arrow);
            # with metrics the UDF emits in-band per-host aggregates
            from .fetch import fetch_extract_http, split_fused_output

            if metrics_store is not None:
                fetched_raw = fetch_extract_http(
                    wave_slim, transport_factory, with_stats=True,
                    **(fetch_kwargs or {}),
                ).persist()
                links_pre, round_stats = split_fused_output(fetched_raw)
                metrics_store.record_wave(run_id, rounds, round_stats)
            else:
                links_pre = fetch_extract_http(
                    wave_slim, transport_factory, **(fetch_kwargs or {})
                )
        else:
            wave_slim = expandable.select("source_id", "url", "seq", "depth", "is_mc")
            fetched = (
                _fetch_join(wave_slim, pages_slim, n_now, broadcast_wave_threshold)
                .filter(fetch_ok_col())
                .select(
                    "source_id",
                    F.col("url").alias("page_url"),
                    F.col("seq").alias("parent_seq"),
                    "depth",
                    "html",
                    "is_mc",
                )
            )
        links = (
            links_pre
            if links_pre is not None
            else fetched.mapInPandas(_extract_links, _LINKS_SCHEMA)
        ).join(dim, "source_id")
        cand = (
            links.withColumn("href2", U.strip_fragment(F.col("href")))
            .filter(U.is_followable(F.col("href2")))
            .withColumn("full_url", U.absolutize(F.col("page_url"), F.col("href2")))
        )
        scope_ok = F.col("include_external") | (
            (U.host_of(F.col("full_url")) == F.col("scope_domain"))
            & (
                U.path_of(F.col("full_url")).startswith(F.col("root_path"))
                if make_root_filter
                else F.lit(True)
            )
        )
        cand = cand.filter(scope_ok & ~F.rlike(F.col("full_url"), F.col("excl_regex"))).persist()

        # MC previews side-channel — skipped when no source is MC (same
        # rationale as crawl_sources: several per-round barriers saved)
        if any(rt.is_mc for rt in runtimes):
            previews = (
                cand.filter(
                    F.col("is_mc")
                    & (F.col("stream") == "anchor")
                    & F.col("full_url").contains("preview_course_nopop.php")
                )
                .select("source_id", F.col("full_url").alias("url"))
                .dropDuplicates(["source_id", "url"])
                .transform(
                    lambda d: seen_store.anti_join(d)
                    if seen_store is not None
                    else d.join(seen.select("source_id", "url"), ["source_id", "url"], "left_anti")
                )
                .select(
                    "source_id",
                    "url",
                    U.host_of(F.col("url")).alias("host"),
                    F.lit(None).cast("int").alias("depth"),
                    F.lit(None).cast("long").alias("seq"),
                    F.lit(False).alias("visited"),
                )
            )
        else:
            previews = spark.createDataFrame([], SEEN_SCHEMA)

        # row-level depth gates (mixed depths within one round)
        child_depth = F.col("parent_depth") + 1
        queue_cand = cand.filter(
            F.when(
                F.col("is_mc"),
                (F.col("stream") == "mc_listing")
                & F.col("full_url").contains("content.php")
                & (child_depth < F.col("max_depth")),
            ).otherwise((F.col("stream") == "anchor") & (child_depth <= F.col("max_depth")))
        ).select(
            "source_id",
            F.col("full_url").alias("url"),
            "parent_seq",
            "link_pos",
            child_depth.cast("int").alias("depth"),
            "max_depth",
            "is_mc",
        )
        if obey_disallow and robots is not None:
            from .robots import filter_disallowed

            queue_cand = filter_disallowed(
                queue_cand.withColumn("host", U.host_of(F.col("url"))), robots,
                robots_rows=robots_rows,
            ).drop("host")
        if seen_store is not None:
            new_urls = seen_store.anti_join(queue_cand)
        else:
            new_urls = queue_cand.join(
                seen.select("source_id", "url"), ["source_id", "url"], "left_anti"
            )
        first = (
            new_urls.groupBy("source_id", "url")
            .agg(F.min(F.struct("parent_seq", "link_pos", "depth", "max_depth", "is_mc")).alias("k"))
            .select("source_id", "url", "k.parent_seq", "k.link_pos", "k.depth", "k.max_depth", "k.is_mc")
        )
        # jobs/round fold: rank lazily, materialize the delta once (at
        # the store/checkpoint below), read totals back from the
        # materialized delta — see the crawl_sources twin for the shape.
        ranked = assign_seq_lazy(
            first,
            "source_id",
            ["parent_seq", "link_pos"],
            seq_col="rel_seq",
            est_rows=n_now * EST_WAVE_BRANCHING if n_now else None,
            num_partitions=spark.sparkContext.defaultParallelism,
        )
        base_df = F.broadcast(
            spark.createDataFrame(
                sorted(seq_base.items()), "source_id string, base long"
            )
        )
        # left + coalesce(base, 0): see the crawl_sources twin (a
        # resume-added source must not silently lose its URLs)
        new_rows = ranked.join(base_df, "source_id", "left").select(
            "source_id",
            "url",
            U.host_of(F.col("url")).alias("host"),
            "depth",
            (F.col("rel_seq") + F.coalesce(F.col("base"), F.lit(0))).alias("seq"),
            "max_depth",
            "is_mc",
        )

        # generic rows AT max depth are seen-but-never-fetched
        # (crawler.py:232-236): they enter seen, not the frontier
        fetchable_new = new_rows.filter(
            F.col("is_mc") | (F.col("depth") < F.col("max_depth"))
        ).select("source_id", "url", "host", "depth", "seq")

        n_readmit = 0
        readmit = None
        qkeys = seen_cand = None  # unpersist handles (store-path lookups)
        if readmit_min_depth:
            # min-depth re-admission: a seen URL rediscovered via a
            # SHALLOWER parent re-enters the frontier at the improved
            # depth (keeping its original seq/priority) so its subtree
            # is re-expanded — restores BFS-set equality near the depth
            # horizon under include_external + mixed delays. `known` =
            # first-discovery depths (in seen) overlaid with prior
            # improvements; a key's best depth strictly decreases, so
            # re-admissions terminate. Seen itself is never rewritten —
            # set membership is already correct, only expansion state
            # improves.
            if seen_store is not None:
                # candidate-scoped lookup via the store: a plain
                # known/redisc join against `seen` reshuffles the whole
                # seen side EVERY round (the same O(|seen|) cost the
                # anti-join chain eliminates). semi_rows pulls only the
                # seen rows whose key this round's candidates touch —
                # candidate-scale — with zero exchanges on the delta
                # sides. known_min over that subset is equivalent: keys
                # outside the candidate set never join redisc anyway.
                # persist (not checkpoint): both caches materialize
                # lazily inside the readmit count job below — the old
                # two eager checkpoints were two extra jobs per round
                qkeys = (
                    queue_cand.select("source_id", "url")
                    .dropDuplicates()
                    .persist()
                )
                seen_cand = seen_store.semi_rows(
                    qkeys, ["source_id", "url", "host", "depth", "seq", "visited"]
                ).persist()
                known = seen_cand.filter(
                    F.col("visited") & F.col("depth").isNotNull()
                ).select("source_id", "url", "depth")
                if improvements is not None:
                    known = known.unionByName(
                        improvements.join(qkeys, ["source_id", "url"], "left_semi")
                    )
                seen_keys = seen_cand.select("source_id", "url").distinct()
                seen_visited = seen_cand.filter(F.col("visited")).select(
                    "source_id", "url", "host", "seq"
                )
            else:
                known = seen.filter(F.col("visited") & F.col("depth").isNotNull()).select(
                    "source_id", "url", "depth"
                )
                if improvements is not None:
                    known = known.unionByName(improvements)
                seen_keys = seen.select("source_id", "url")
                seen_visited = seen.filter(F.col("visited")).select(
                    "source_id", "url", "host", "seq"
                )
            known_min = known.groupBy("source_id", "url").agg(
                F.min("depth").alias("known_depth")
            )
            redisc = (
                queue_cand.join(seen_keys, ["source_id", "url"], "left_semi")
                .groupBy("source_id", "url")
                .agg(F.min(F.struct("depth", "max_depth", "is_mc")).alias("k"))
                .select("source_id", "url", "k.depth", "k.max_depth", "k.is_mc")
            )
            improved = redisc.join(known_min, ["source_id", "url"]).filter(
                F.col("depth") < F.col("known_depth")
            )
            readmit = (
                improved.filter(F.col("is_mc") | (F.col("depth") < F.col("max_depth")))
                .select("source_id", "url", "depth")
                .join(seen_visited, ["source_id", "url"])
                .select("source_id", "url", "host", "depth", "seq")
                .persist()  # fold: one count job materializes the cache
            )
            n_readmit = readmit.count()
            if n_readmit:
                imp_delta = improved.select("source_id", "url", "depth").localCheckpoint(
                    eager=True
                )
                improvements = (
                    imp_delta if improvements is None else improvements.unionByName(imp_delta)
                )

        delta = (
            new_rows.select("source_id", "url", "host", "depth", "seq")
            .withColumn("visited", F.lit(True))
            .unionByName(previews)
        )
        if (
            seen_store is None
            and copartition_seen == "auto"
            and seen_rows_est > COPARTITION_SEEN_THRESHOLD
        ):
            # decided on the pre-round estimate (this round's n_new isn't
            # known until the delta materializes below) — the store
            # engages one round after the crossing, a heuristic either way
            seen_store = _make_seen_store()
            seen = seen_store.add_delta(seen)  # one-time seed repartition
        # the round's single materialization of the delta; totals read
        # back from the materialized blocks (jobs/round fold)
        if seen_store is not None:
            delta = seen_store.add_delta(delta)
            seen = seen_store.union()
        else:
            # LAZY checkpoint (round 6): the totals collect below is the
            # first action — one job materializes + counts (jobs/round fold)
            delta = delta.localCheckpoint(eager=False)
            seen = seen.unionByName(delta)
        totals_rows = (
            delta.filter(F.col("visited"))
            .groupBy("source_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        totals = {r["source_id"]: r["n"] for r in totals_rows}
        n_new = sum(totals.values())
        for sid, n in totals.items():
            seq_base[sid] = seq_base.get(sid, 0) + n
        seen_rows_est += n_new
        # frontier estimate for next round's ranking-strategy pick:
        # deferred (≤ pending - n_now) + new + readmitted — kept as an
        # overestimate (never subtract fetched-and-dropped rows)
        pending_rows_est = max(0, pending_rows_est - n_now) + n_new + n_readmit
        pending = deferred.unionByName(fetchable_new)
        if readmit is not None and n_readmit:
            pending = pending.unionByName(readmit)
        pending = pending.localCheckpoint(eager=True)
        if state_store is not None:
            state_store.save_round(rounds, delta, pending, seq_base)
        cand.unpersist()
        now_cached.unpersist()
        if readmit is not None:
            readmit.unpersist()
        if qkeys is not None:
            qkeys.unpersist()
        if seen_cand is not None:
            seen_cand.unpersist()
        if fetched_raw is not None and fetched_raw.is_cached:
            fetched_raw.unpersist()
        result.metrics.append(WaveMetrics(depth=rounds, wave_size=n_new, new_urls=n_new))
        if n_new == 0 and n_readmit == 0 and deferred.isEmpty():
            break

    result.seen = seen
    return result
