"""K6 course-merge equality vs a sequential oracle implementing the
reference's merge loop (merge_courses.py:15-56): match on
(COALESCE(code,''), title) -> update description+credits, else insert;
duplicate keys in the scraped batch -> last occurrence wins."""

import pytest

from course_scraper_spark.operators.merge import (
    COURSE_COLS,
    create_courses_table,
    merge_courses,
    with_merge_keys,
)


def oracle_merge(existing, scraped):
    lookup = {}
    for rec in existing:
        key = (rec.get("course_code") or "", rec.get("course_title") or "")
        lookup[key] = dict(rec)
    inserted = updated = 0
    for rec in scraped:
        key = (rec.get("course_code") or "", rec.get("course_title") or "")
        if key in lookup:
            lookup[key]["course_description"] = rec.get("course_description")
            lookup[key]["course_credits"] = rec.get("course_credits")
            updated += 1
        else:
            lookup[key] = dict(rec)
            inserted += 1
    return list(lookup.values()), inserted, updated


def _mk(code, title, desc, credits, url="u", sid="s"):
    return {
        "course_code": code,
        "course_title": title,
        "course_description": desc,
        "course_credits": credits,
        "course_media": None,
        "_source_url": url,
        "source_id": sid,
    }


def _df(spark, recs, with_seq=False):
    cols = COURSE_COLS + (["seq"] if with_seq else [])
    data = [tuple(list(r.get(c) for c in COURSE_COLS) + ([i] if with_seq else [])) for i, r in enumerate(recs)]
    return spark.createDataFrame(data, ", ".join(f"{'`'+c+'`' if c.startswith('_') else c} string" for c in COURSE_COLS) + (", seq long" if with_seq else ""))


def test_merge_matches_sequential_oracle(spark, tmp_path):
    existing = [
        _mk("CS101", "Intro", "old desc", "3"),
        _mk(None, "Untitledless", "d", "1"),
        _mk("M200", "Calc", "keep", "4"),
    ]
    scraped = [
        _mk("CS101", "Intro", "NEW desc", "4"),       # update
        _mk("E300", "Writing", "ins", "2"),            # insert
        _mk(None, "Untitledless", "upd-null-code", "9"),  # null-code match
        _mk("E300", "Writing", "ins-LAST", "2"),       # dup key: last wins
    ]
    t = create_courses_table(spark, str(tmp_path / "courses"))
    t.append(with_merge_keys(_df(spark, existing)))
    stats = merge_courses(t, _df(spark, scraped, with_seq=True), seq_col="seq")

    want, ins, upd = oracle_merge(existing, scraped)
    # per-occurrence tally parity: the duplicate E300 is an insert then a
    # self-update -> 1 ins / 3 upd, and the engine reports the same
    assert (ins, upd) == (1, 3)
    assert (stats.inserted, stats.updated) == (ins, upd)

    got = [
        {k: v for k, v in r.asDict().items() if k in COURSE_COLS}
        for r in t.read().collect()
    ]
    keyf = lambda r: (r.get("course_code") or "", r.get("course_title") or "")
    got_by_key = {keyf(r): r for r in got}
    want_by_key = {keyf(r): r for r in want}
    assert got_by_key.keys() == want_by_key.keys()
    for k in want_by_key:
        assert got_by_key[k]["course_description"] == want_by_key[k]["course_description"], k
        assert got_by_key[k]["course_credits"] == want_by_key[k]["course_credits"], k


def test_merge_idempotent(spark, tmp_path):
    recs = [_mk("A1", "T1", "d1", "1"), _mk("A2", "T2", "d2", "2")]
    t = create_courses_table(spark, str(tmp_path / "courses2"))
    t.append(with_merge_keys(_df(spark, recs)))
    before = sorted(tuple(r) for r in t.read().collect())
    merge_courses(t, _df(spark, recs))
    after = sorted(tuple(r) for r in t.read().collect())
    assert before == after


def test_occurrence_stats_single_job(spark):
    """The tally is ONE aggregation job, not a count() per side."""
    from course_scraper_spark.operators.merge import occurrence_stats

    src = with_merge_keys(
        _df(spark, [_mk("A", "T", "d", "1"), _mk("A", "T", "d2", "1"), _mk("B", "U", "d", "1")])
    )
    existing = with_merge_keys(_df(spark, [_mk("B", "U", "old", "1")])).select("k_code", "k_title")
    sc = spark.sparkContext
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    # AQE splits one action into per-stage jobs; disable it so job count
    # equals action count for the assertion
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("occ-stats", "stats")
    try:
        stats = occurrence_stats(src, existing)
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert (stats.inserted, stats.updated) == (1, 2)  # A inserts once, dup A + match B update
    assert len(sc.statusTracker().getJobIdsForGroup("occ-stats")) == 1
