"""Text cleaning with byte-equality to the reference scraper.

The reference applies ``clean_text`` to every string field of every
extracted record (reference ``src/scraper.py:48-65`` defines it,
``:119-129`` applies it). Its behavior — including the quirk that the
boilerplate "literals" are passed through ``re.sub`` and therefore act as
regexes (``"Help (opens a new window)"`` has capturing groups, so it
matches ``"Help opens a new window"``) — is part of the per-row span
equality contract, so we reproduce the exact pattern strings and operation
order:

    1. html.unescape            (scraper.py:51)
    2. NFKC normalize           (scraper.py:53)
    3. NBSP/bullet -> space     (scraper.py:54)    [str.replace]
    4. re.sub('\\n', ' ')       (scraper.py:56)
    5. re.sub('\\s+', ' ')      (scraper.py:57)
    6. six boilerplate strips   (scraper.py:58-63) [mixed re.sub / replace]
    7. strip()                  (scraper.py:65)

Spark surface: a scalar pandas UDF (Arrow-batched; the only per-element
Python is ``html.unescape``, which has no vectorized equivalent) plus a
Column-expression subset (steps 3-5,7) for oracle-checkable pipelines.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Patterns fed to re.sub in the reference — kept as regex strings on
# purpose (parens = groups), scraper.py:58-60,63.
_RE_HELP = re.compile(r"Help (opens a new window)")
_RE_PAGE = re.compile(r"Page (opens a new window)")
_RE_PRINT = re.compile(r"Print (opens a new window)")
_RE_CATALOG = re.compile(r"\d\d\d\d-\d\d\d\d ((Undergraduate)|(Graduate)) CatalogAdd to Portfolio")
_RE_NL = re.compile(r"\n")
_RE_WS = re.compile(r"\s+")
# Literal str.replace targets, scraper.py:61-62.
_LIT_OPENS = "(opens a new window)"
_LIT_FAVORITES = (
    "Add to My Favorites Share this PageFacebook this Page Tweet this Page Print Help"
)


def clean_text(s: str) -> str:
    """Reference-equivalent scalar cleaner (spec: scraper.py:48-65)."""
    s = _html.unescape(s)
    s = unicodedata.normalize("NFKC", s)
    s = s.replace(" ", " ").replace("•", " ")
    s = _RE_NL.sub(" ", s)
    s = _RE_WS.sub(" ", s)
    s = _RE_HELP.sub("", s)
    s = _RE_PAGE.sub("", s)
    s = _RE_PRINT.sub("", s)
    s = s.replace(_LIT_OPENS, "")
    s = s.replace(_LIT_FAVORITES, "")
    s = _RE_CATALOG.sub("", s)
    return s.strip()


def clean_text_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas pipeline, byte-identical to :func:`clean_text`.

    Stays inside one Arrow batch; pandas ``.str`` ops are C-level except
    the unescape map.
    """
    s = s.astype("object").fillna("")
    s = s.map(_html.unescape)
    s = pd.Series(s, dtype="object").str.normalize("NFKC")
    s = s.str.replace(" ", " ", regex=False).str.replace("•", " ", regex=False)
    s = s.str.replace(_RE_NL, " ", regex=True)
    s = s.str.replace(_RE_WS, " ", regex=True)
    s = s.str.replace(_RE_HELP, "", regex=True)
    s = s.str.replace(_RE_PAGE, "", regex=True)
    s = s.str.replace(_RE_PRINT, "", regex=True)
    s = s.str.replace(_LIT_OPENS, "", regex=False)
    s = s.str.replace(_LIT_FAVORITES, "", regex=False)
    s = s.str.replace(_RE_CATALOG, "", regex=True)
    return s.str.strip()


@pandas_udf(StringType())
def clean_text_udf(s: pd.Series) -> pd.Series:
    return clean_text_series(s)


def clean_text_builtin(col: Column) -> Column:
    """Builtin-only subset of the pipeline (steps 3-5,7): whole-stage
    codegen, no Python. Use when inputs are known entity/NFKC-free —
    e.g. the driver testdata ``documents.text`` — so the hot path never
    leaves the JVM. DuckDB-expressible, used by the correctness-gate
    oracle query ``q_clean_text``."""
    c = F.translate(col, " •", "  ")
    c = F.regexp_replace(c, r"\n", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)
