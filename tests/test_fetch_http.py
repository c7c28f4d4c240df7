"""The live HTTP fetch operator: ladder semantics (retry/backoff/render
fallback, reference render_utils.py:43-102), and end-to-end equality of
fetch='http' vs the fetch-join path over the same synthetic world."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators import fetch as FX
from course_scraper_spark.operators.fetch import FetchResponse, run_ladder


class ScriptedTransport:
    def __init__(self, status, mode, html="<html><a href='/x'>x</a></html>"):
        self.status, self.mode, self.html = status, mode, html
        self.get_calls = 0
        self.render_calls = 0

    def get(self, url, headers=None):
        self.get_calls += 1
        assert headers and "User-Agent" in headers  # UA always sent
        if self.status is None:
            return FetchResponse(None, None, None)
        return FetchResponse(self.status, self.html if self.status < 400 else None, self.mode)

    def render(self, url):
        self.render_calls += 1
        if self.mode == "dynamic":
            return FetchResponse(200, self.html, "dynamic")
        return FetchResponse(self.status, None, self.mode)


# -- ladder unit semantics ----------------------------------------------------


def test_ladder_success_first_try():
    t = ScriptedTransport(200, "static")
    ok, status, mode, html, attempts = run_ladder(t, "https://a.edu/")
    assert (ok, status, attempts) == (True, 200, 1)
    assert html == t.html and t.render_calls == 0


def test_ladder_403_retries_then_render_fallback():
    t = ScriptedTransport(403, "dynamic")
    sleeps = []
    ok, status, mode, html, attempts = run_ladder(t, "https://a.edu/p", sleep_fn=sleeps.append)
    assert ok and status == 200 and mode == "dynamic" and html == t.html
    assert t.get_calls == 6 and t.render_calls == 1 and attempts == 7
    # exponential 1->16s backoff with deterministic [0,1) jitter
    assert len(sleeps) == 5
    for i, s in enumerate(sleeps):
        assert 2 ** i <= s < 2 ** i + 1.0


def test_ladder_404_skips_retries_renders_immediately():
    t = ScriptedTransport(404, "dynamic")
    sleeps = []
    ok, status, _, html, attempts = run_ladder(t, "https://a.edu/q", sleep_fn=sleeps.append)
    assert ok and status == 200 and attempts == 2 and not sleeps
    assert t.get_calls == 1 and t.render_calls == 1


def test_ladder_429_static_fails_after_render_attempt():
    t = ScriptedTransport(429, "static")
    ok, status, mode, html, attempts = run_ladder(t, "https://a.edu/r", sleep_fn=FX.NO_SLEEP)
    assert not ok and status == 429 and html is None and attempts == 7
    assert t.render_calls == 1  # fallback tried, no JS payload -> fail


def test_ladder_5xx_no_render_branch():
    t = ScriptedTransport(503, "static")
    ok, status, _, _, attempts = run_ladder(t, "https://a.edu/s", sleep_fn=FX.NO_SLEEP)
    assert not ok and status == 503 and attempts == 6 and t.render_calls == 0


def test_ladder_connection_error_retries_then_renders():
    """Connection errors retry, then take the render branch — a page
    recoverable only via dynamic render still gets its render attempt
    after transient network errors (deviation from the reference's
    render-immediately documented in the module docstring)."""
    t = ScriptedTransport(None, None)
    ok, status, _, _, attempts = run_ladder(t, "https://nope.example/", sleep_fn=FX.NO_SLEEP)
    assert not ok and status is None and attempts == 7
    assert t.get_calls == 6 and t.render_calls == 1

    class FlakyThenRenderable(ScriptedTransport):
        def render(self, url):
            self.render_calls += 1
            return FetchResponse(200, self.html, "dynamic")

    t2 = FlakyThenRenderable(None, None)
    ok2, status2, mode2, html2, attempts2 = run_ladder(
        t2, "https://flaky.example/", sleep_fn=FX.NO_SLEEP
    )
    assert ok2 and status2 == 200 and mode2 == "dynamic" and html2 == t2.html
    assert attempts2 == 7 and t2.render_calls == 1


def test_default_sleep_is_real_time_sleep(monkeypatch):
    """The REAL_SLEEP default must back off for real — the production
    contract; NO_SLEEP is the explicit test/bench opt-out."""
    import course_scraper_spark.operators.fetch as fetch_mod

    slept = []
    monkeypatch.setattr(fetch_mod.time, "sleep", slept.append)
    t = ScriptedTransport(503, "static")
    run_ladder(t, "https://a.edu/s")  # default sleep_fn
    assert len(slept) == 5 and slept[0] >= 1.0


def test_sleep_fn_none_raises():
    """Literal sleep_fn=None is rejected loudly: under the pre-round-4
    API it meant 'no backoff', so silently treating it as real
    time.sleep would block old callers for up to ~31 s per failing URL.
    The error points at NO_SLEEP."""
    import pytest

    t = ScriptedTransport(503, "static")
    with pytest.raises(TypeError, match="NO_SLEEP"):
        run_ladder(t, "https://a.edu/s", sleep_fn=None)


# -- attempt-count Column mirror ----------------------------------------------


def test_attempts_col_matches_ladder(spark, pages):
    """The join path's attempts_col must equal the real ladder's counts
    for every page in the world."""
    factory = FX.world_transport_factory(pages)
    fetched = FX.fetch_http(pages.select("url"), factory, sleep_fn=FX.NO_SLEEP)
    got = {r.url: r.n_attempts for r in fetched.collect()}
    mirrored = {
        r.url: r.a
        for r in pages.select("url", FX.attempts_col().alias("a")).collect()
    }
    assert got == mirrored
    # and ok mirrors fetch_ok_col
    from course_scraper_spark.operators.frontier import fetch_ok_col

    ok_http = {r.url: r.ok for r in fetched.collect()}
    ok_join = {r.url: r.ok for r in pages.select("url", fetch_ok_col().alias("ok")).collect()}
    assert ok_http == ok_join


# -- end-to-end equality: http path == join path ------------------------------


def canon(df):
    return sorted(
        (r.source_id, r.url, r.depth, r.seq, r.visited)
        for r in df.select("source_id", "url", "depth", "seq", "visited").collect()
    )


def test_crawl_http_equals_join(spark, sources, pages):
    from course_scraper_spark.operators.frontier import crawl_sources

    base = crawl_sources(spark, sources, pages)
    http = crawl_sources(
        spark,
        sources,
        pages,
        fetch="http",
        transport_factory=FX.world_transport_factory(pages),
        fetch_kwargs={"sleep_fn": FX.NO_SLEEP},
    )
    assert canon(http.seen) == canon(base.seen)
    assert http.failed_sources == base.failed_sources


def test_budgeted_crawl_http_equals_join(spark, sources, pages):
    from course_scraper_spark.operators.frontier import crawl_sources_budgeted

    kw = dict(round_budget_s=7.0, max_rounds=40)
    base = crawl_sources_budgeted(spark, sources, pages, **kw)
    http = crawl_sources_budgeted(
        spark,
        sources,
        pages,
        fetch="http",
        transport_factory=FX.world_transport_factory(pages),
        fetch_kwargs={"sleep_fn": FX.NO_SLEEP},
        **kw,
    )
    assert sorted((r.source_id, r.url) for r in http.seen.collect()) == sorted(
        (r.source_id, r.url) for r in base.seen.collect()
    )


def test_http_metrics_record_attempts(spark, sources, pages, tmp_path):
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.operators.metrics import MetricsStore

    store = MetricsStore(spark, str(tmp_path / "metrics"))
    crawl_sources(
        spark,
        sources,
        pages,
        fetch="http",
        transport_factory=FX.world_transport_factory(pages),
        fetch_kwargs={"sleep_fn": FX.NO_SLEEP},
        metrics_store=store,
        run_id="http-run",
    )
    pm = store.partition_metrics.read()
    assert "n_attempts" in pm.columns
    row = pm.agg(
        F.sum("n_urls").alias("u"), F.sum("n_attempts").alias("a"), F.sum("n_fetch_ok").alias("ok")
    ).first()
    assert row.u > 0 and row.ok > 0
    assert row.a >= row.u  # every URL costs >= 1 attempt; failures cost more


def test_http_root_probe_failed_sources(spark, sources, pages):
    """A root the transport can't resolve aborts its source, like the
    reference's raise_for_status on the root fetch."""
    from course_scraper_spark.config import SourceConfig
    from course_scraper_spark.operators.frontier import resolve_sources_transport

    bad = SourceConfig(
        source_id="LOCAL_bad",
        name="bad",
        root_url="https://missing.example.edu/catalog/",
        schema_url="https://missing.example.edu/catalog/x.html",
        crawl_depth=2,
    )
    runtimes, failed = resolve_sources_transport(
        spark, list(sources) + [bad], FX.world_transport_factory(pages)
    )
    assert "LOCAL_bad" in failed
    assert {rt.source.source_id for rt in runtimes} == {s.source_id for s in sources}
    assert any(rt.is_mc for rt in runtimes)


# -- spec-based transport (regenerates the world executor-side) --------------


def test_spec_transport_equals_world(spec, pages_pdf):
    """SpecTransport must serve byte-identical (status, mode, html) for
    every URL the generator emits — it's the zero-driver-memory transport
    the scaling bench uses at 300k pages."""
    from course_scraper_spark.synth.transport import SpecTransport

    t = SpecTransport(spec)
    for r in pages_pdf.itertuples():
        resolved = t._resolve(r.url)
        assert resolved is not None, r.url
        status, mode, html = resolved
        assert (status, mode, html) == (r.status_code, r.fetch_mode, r.html), r.url
    # dead links (no generator row) resolve to a connection error
    assert t._resolve("https://h000.example.edu/catalog/missing7.html") is None
    assert t._resolve("https://www.outside-3.org/catalog/") is None


def test_crawl_http_spec_transport_equals_join(spark, sources, pages, spec):
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.synth.transport import spec_transport_factory

    base = crawl_sources(spark, sources, pages)
    http = crawl_sources(
        spark,
        sources,
        pages,
        fetch="http",
        transport_factory=spec_transport_factory(spec),
        fetch_kwargs={"sleep_fn": FX.NO_SLEEP},
    )
    assert canon(http.seen) == canon(base.seen)


def test_fused_fetch_extract_equals_two_step(spark, pages, spec):
    """fetch_extract_http (html never crosses Arrow) emits exactly the
    rows of fetch_http(...).filter(ok) -> extract_links."""
    from course_scraper_spark.operators.frontier import _LINKS_SCHEMA, _extract_links
    from course_scraper_spark.operators.fetch import fetch_extract_http, fetch_http
    from course_scraper_spark.synth.transport import spec_transport_factory

    wave = (
        pages.select("url")
        .withColumn("source_id", F.lit("s"))
        .withColumn("seq", F.monotonically_increasing_id())
        .withColumn("depth", F.lit(0))
        .withColumn("is_mc", F.col("url").contains("mc-catalog"))
    ).cache()
    factory = spec_transport_factory(spec)
    fused = fetch_extract_http(wave, factory, sleep_fn=FX.NO_SLEEP)
    two_step = (
        fetch_http(wave, factory, sleep_fn=FX.NO_SLEEP)
        .filter(F.col("ok"))
        .select(
            "source_id",
            F.col("url").alias("page_url"),
            F.col("seq").alias("parent_seq"),
            F.col("depth").alias("parent_depth"),
            "html",
            F.col("is_mc").alias("is_mc"),
        )
        .withColumnRenamed("parent_depth", "depth")
        .mapInPandas(_extract_links, _LINKS_SCHEMA)
    )
    cols = ["source_id", "page_url", "parent_seq", "link_pos", "stream", "href"]
    a = sorted(tuple(r) for r in fused.select(*cols).collect())
    b = sorted(tuple(r) for r in two_step.select(*cols).collect())
    assert a == b and len(a) > 0


def test_crawl_http_with_salting_equals_join(spark, sources, pages, spec):
    """Salted repartition composes with the fused HTTP fetch (the
    live-cluster shape: spread Zipf hosts, then ladder inside the UDF)."""
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.synth.transport import spec_transport_factory

    base = crawl_sources(spark, sources, pages)
    http = crawl_sources(
        spark,
        sources,
        pages,
        fetch="http",
        transport_factory=spec_transport_factory(spec),
        fetch_kwargs={"sleep_fn": FX.NO_SLEEP},
        salt_hosts_threshold=10,
    )
    assert canon(http.seen) == canon(base.seen)


def test_fused_stats_equal_join_path_metrics(spark, sources, pages, tmp_path):
    """The fused HTTP path's in-band per-host aggregates must reproduce
    the join path's Column-mirror stats EXACTLY — per (wave, source_id,
    host): n_urls, n_fetch_ok, n_failed, n_attempts."""
    from course_scraper_spark.operators.frontier import crawl_sources
    from course_scraper_spark.operators.metrics import MetricsStore

    def per_host(store):
        return sorted(
            (r.wave, r.source_id, r.host, r.n_urls, r.n_fetch_ok, r.n_failed, r.n_attempts)
            for r in store.partition_metrics.read().collect()
        )

    join_store = MetricsStore(spark, str(tmp_path / "m_join"))
    crawl_sources(spark, sources, pages, metrics_store=join_store, run_id="r")

    http_store = MetricsStore(spark, str(tmp_path / "m_http"))
    crawl_sources(
        spark,
        sources,
        pages,
        fetch="http",
        transport_factory=FX.world_transport_factory(pages),
        fetch_kwargs={"sleep_fn": FX.NO_SLEEP},
        metrics_store=http_store,
        run_id="r",
    )
    assert per_host(http_store) == per_host(join_store)


def test_split_fused_output_roundtrip(spark, pages, spec):
    """with_stats=True adds ONLY stats rows: the link half equals the
    stats-free fused output; the stats half sums to the wave totals."""
    from course_scraper_spark.operators.fetch import (
        FETCH_STATS_STREAM,
        fetch_extract_http,
        split_fused_output,
    )
    from course_scraper_spark.functions import urls as U
    from course_scraper_spark.synth.transport import spec_transport_factory

    wave = (
        pages.select("url")
        .withColumn("host", U.host_of(F.col("url")))
        .withColumn("source_id", F.lit("s"))
        .withColumn("seq", F.monotonically_increasing_id())
        .withColumn("depth", F.lit(0))
        .withColumn("is_mc", F.col("url").contains("mc-catalog"))
    ).cache()
    factory = spec_transport_factory(spec)
    fused = fetch_extract_http(wave, factory, sleep_fn=FX.NO_SLEEP, with_stats=True).cache()
    links, stats = split_fused_output(fused)
    plain = fetch_extract_http(wave, factory, sleep_fn=FX.NO_SLEEP)
    cols = ["source_id", "page_url", "parent_seq", "link_pos", "stream", "href"]
    assert sorted(map(tuple, links.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )
    tot = stats.agg(
        F.sum("n_urls").alias("u"), F.sum("n_fetch_ok").alias("ok"), F.sum("n_attempts").alias("a")
    ).first()
    n_wave = wave.count()
    assert tot.u == n_wave and 0 < tot.ok <= n_wave and tot.a >= tot.u
    assert links.filter(F.col("stream") == FETCH_STATS_STREAM).count() == 0
