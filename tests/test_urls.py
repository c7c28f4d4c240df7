"""URL canonicalization: builtin column algebra vs urllib oracle."""

from urllib.parse import urljoin, urlparse

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from course_scraper_spark.functions import urls as U

# href grammar covering what real pages emit (and our generator):
# absolute, protocol-relative, root-relative, bare-relative + query/frag
_seg = st.text(alphabet="abcz019-_", min_size=1, max_size=6)
_path = st.lists(_seg, min_size=0, max_size=3).map(lambda xs: "/".join(xs))
_host = st.sampled_from(["h000.example.edu", "mc.example.edu", "x.org"])
_scheme = st.sampled_from(["http", "https"])

_href = st.one_of(
    st.builds(lambda s, h, p: f"{s}://{h}/{p}", _scheme, _host, _path),
    st.builds(lambda h, p: f"//{h}/{p}", _host, _path),
    st.builds(lambda p: f"/{p}", _path),
    _path.filter(lambda p: p != ""),
    st.builds(lambda p, q: f"/{p}?q={q}", _path, _seg),
    st.builds(lambda p, f: f"/{p}#{f}", _path, _seg),
)
_page = st.builds(lambda s, h, p: f"{s}://{h}/{p}", _scheme, _host, _path)


@given(st.lists(st.tuples(_page, _href), min_size=1, max_size=40))
@settings(max_examples=30, deadline=None)
def test_absolutize_matches_urljoin(spark, pairs):
    df = spark.createDataFrame(pairs, ["page_url", "href"])
    df = df.withColumn("h2", U.strip_fragment(F.col("href"))).filter(U.is_followable(F.col("h2")))
    rows = df.select(
        "page_url", "h2", U.absolutize(F.col("page_url"), F.col("h2")).alias("got")
    ).collect()
    for r in rows:
        origin = f"{urlparse(r.page_url).scheme}://{urlparse(r.page_url).netloc}"
        assert r.got == urljoin(origin, r.h2), (r.page_url, r.h2)


def test_strip_fragment_semantics(spark):
    cases = [("a#b", "a"), ("a#b#c", "a"), ("#b", ""), ("a", "a"), ("", "")]
    df = spark.createDataFrame(cases, ["href", "want"])
    for r in df.select(U.strip_fragment(F.col("href")).alias("got"), "want").collect():
        assert r.got == r.want


def test_section_key_matches_reference(spark):
    # reference section_key: path minus last segment (crawler.py:77-82)
    def ref_section_key(url):
        path = urlparse(url).path.rstrip("/")
        if "/" in path:
            return path.rsplit("/", 1)[0]
        return path

    urls = [
        "https://h.edu/catalog/sec1/p2.html",
        "https://h.edu/catalog/",
        "https://h.edu/",
        "https://h.edu/a",
        "https://h.edu/a/b/c/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r.url: r.k for r in df.select("url", U.section_key(F.col("url")).alias("k")).collect()}
    for u in urls:
        assert got[u] == ref_section_key(u), u


def test_scope_and_exclude(spark):
    df = spark.createDataFrame(
        [
            ("https://h.edu/catalog/p1.html",),
            ("https://h.edu/other/p2.html",),
            ("https://evil.com/catalog/x",),
            ("https://h.edu/catalog/files/a.pdf",),
            ("https://h.edu/catalog/img.jpg",),
        ],
        ["url"],
    )
    kept = (
        df.filter(U.in_scope(F.col("url"), "h.edu", "/catalog/"))
        .filter(~U.excluded(F.col("url"), [r"/pdf/", r"\.pdf$", r"\.jpg$"]))
        .collect()
    )
    assert [r.url for r in kept] == ["https://h.edu/catalog/p1.html"]
