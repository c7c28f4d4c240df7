"""Byte-equality of the Spark clean_text pipeline vs the reference spec
(scraper.py:48-65), including its literal-as-regex quirks."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from course_scraper_spark.functions.text import clean_text, clean_text_series, clean_text_udf

CASES = [
    "CS&amp;101  Intro\n to  Data",
    "Help (opens a new window) trailing",
    "Help opens a new window trailing",  # the regex-quirk match
    "Page (opens a new window)",
    "Print (opens a new window)",
    "x (opens a new window) y",
    "Add to My Favorites Share this PageFacebook this Page Tweet this Page Print Help Z",
    "2023-2024 Undergraduate CatalogAdd to Portfolio Q",
    "1999-2000 Graduate CatalogAdd to Portfolio",
    "a b•c",
    "&nbsp;&bull;&amp;&lt;tag&gt;",
    "  \n\n\t mixed   ws \n ",
    "",
    "ﬁne ﬂight №5",  # NFKC compatibility chars
]


def test_known_cases_match_scalar_oracle():
    got = clean_text_series(pd.Series(CASES)).tolist()
    want = [clean_text(s) for s in CASES]
    assert got == want


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80))
@settings(max_examples=300, deadline=None)
def test_property_series_equals_scalar(s):
    assert clean_text_series(pd.Series([s])).tolist() == [clean_text(s)]


def test_udf_matches_oracle_through_spark(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["raw"])
    got = [r.c for r in df.select(clean_text_udf("raw").alias("c")).collect()]
    assert got == [clean_text(c) for c in CASES]


def test_regex_quirk_semantics():
    # "Help (opens a new window)" is passed to re.sub → parens are groups:
    # it matches the paren-less text, NOT the literal.
    assert clean_text("Help opens a new window X") == "X"
    # the literal form survives the regex but the later str.replace
    # removes "(opens a new window)" leaving "Help" behind
    assert clean_text("Help (opens a new window) X") == "Help  X"
