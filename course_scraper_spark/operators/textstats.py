"""Text analysis for large-scale corpus pipelines (beyond-reference ops).

Round 6: the hot entry points are Arrow-batched pandas UDFs — the
original Column forms leaned on higher-order functions
(``transform``/``filter``/``aggregate``), which execute in Catalyst's
INTERPRETED path per array element and dominated the 10x-world bench
(token_stats 4.2 s, lang_id 5.4 s for 50k docs). The kernels compute
the same integers/strings exactly (tokenization contract identical to
``dedup._py_shingles``: ASCII ``\\s+``, empties dropped) and leave every
``round``/division that feeds an oracle in Column land or as IEEE-
identical float64 ops. The Column forms survive as ``*_column`` —
equality is pinned per function in tests/test_textstats_kernels.py and
by the 38-query oracle gate.

* token counting: whitespace tokenization + a BPE-ish subword estimate
* quality scoring: length / punctuation / stopword / uppercase ratios
* language ID: marker-word heuristic over a small per-language inventory
* fingerprinting: min over md5 of token 3-gram rolling windows
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StringType

# tiny per-language marker inventories (deterministic heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "nicht"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]

_STOPSET = frozenset(STOPWORDS)
_PUNCT = frozenset(".,;:!?")
_UPPER = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _py_tokens(text: str) -> list[str]:
    """Python twin of :func:`tokens`: ASCII ``\\s+`` split, empties
    dropped (leading/trailing whitespace falls out as empty tokens, so
    Column ``trim`` needs no replication)."""
    return [t for t in re.split(r"\s+", text, flags=re.ASCII) if t]


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (Column form)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


# --------------------------------------------------------------------------
# Column-algebra reference forms (equality oracles for the kernels)
# --------------------------------------------------------------------------


def token_count_column(col: Column) -> Column:
    return F.size(tokens(col))


def subword_estimate_column(col: Column) -> Column:
    """BPE-ish token estimate: words + one extra per 4 chars of long words
    (the usual ~4-chars-per-subword heuristic)."""
    per_word = F.transform(
        tokens(col),
        lambda t: F.when(F.length(t) <= F.lit(4), F.lit(1)).otherwise(
            F.ceil(F.length(t) / F.lit(4)).cast("int")
        ),
    )
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


def stopword_ratio_column(col: Column) -> Column:
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio_column(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def upper_ratio_column(col: Column) -> Column:
    n = F.length(col)
    u = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    return F.when(n > 0, u / n).otherwise(F.lit(0.0))


def quality_score_column(col: Column) -> Column:
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio_column(col) * F.lit(4.0), F.lit(1.0))
    noise = F.least(
        punct_ratio_column(col) * F.lit(5.0) + upper_ratio_column(col) * F.lit(2.0), F.lit(1.0)
    )
    return F.round(
        length_term * F.lit(0.4) + stop_term * F.lit(0.4) + (F.lit(1.0) - noise) * F.lit(0.2), 6
    )


def lang_id_column(col: Column) -> Column:
    scores = []
    toks = tokens(F.lower(col))
    for lang, markers in LANG_MARKERS.items():
        scores.append((lang, F.size(F.filter(toks, lambda t: t.isin(markers)))))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in sorted(scores, key=lambda kv: kv[0], reverse=True):
        # iterate reversed so earlier codes win ties via >=
        cond = s >= F.greatest(best_score, F.lit(1))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return best_lang


def fingerprint_column(col: Column) -> Column:
    toks = tokens(F.lower(col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(3), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2), F.element_at(toks, i + 3)
            )
        ),
    )
    return F.when(n >= 3, F.array_min(grams)).otherwise(F.md5(F.concat_ws(" ", toks)))


# --------------------------------------------------------------------------
# Arrow kernels (the production entry points)
# --------------------------------------------------------------------------


@F.pandas_udf(IntegerType())
def _token_count_k(s: pd.Series) -> pd.Series:
    return pd.Series(
        [None if t is None else len(_py_tokens(t)) for t in s], dtype="Int32"
    )


def token_count(col: Column) -> Column:
    return _token_count_k(col)


@F.pandas_udf(IntegerType())
def _subword_k(s: pd.Series) -> pd.Series:
    out = []
    for t in s:
        if t is None:
            out.append(None)
            continue
        acc = 0
        for w in _py_tokens(t):
            lw = len(w)
            acc += 1 if lw <= 4 else -(-lw // 4)
        out.append(acc)
    return pd.Series(out, dtype="Int32")


def subword_estimate(col: Column) -> Column:
    """BPE-ish token estimate: words + one extra per 4 chars of long words
    (the usual ~4-chars-per-subword heuristic)."""
    return _subword_k(col)


def _py_stop_ratio(t: str) -> float:
    # None -> 0.0: Column `when(size(null) > 0, ...)` falls to otherwise
    if t is None:
        return 0.0
    toks = _py_tokens(t.lower())
    if not toks:
        return 0.0
    hits = sum(1 for w in toks if w in _STOPSET)
    return hits / len(toks)


@F.pandas_udf(DoubleType())
def _stop_ratio_k(s: pd.Series) -> pd.Series:
    return pd.Series([_py_stop_ratio(t) for t in s], dtype="float64")


def stopword_ratio(col: Column) -> Column:
    return _stop_ratio_k(col)


def _py_punct_ratio(t: str) -> float:
    if t is None or len(t) == 0:
        return 0.0
    return sum(1 for c in t if c in _PUNCT) / len(t)


@F.pandas_udf(DoubleType())
def _punct_ratio_k(s: pd.Series) -> pd.Series:
    return pd.Series([_py_punct_ratio(t) for t in s], dtype="float64")


def punct_ratio(col: Column) -> Column:
    return _punct_ratio_k(col)


def _py_upper_ratio(t: str) -> float:
    if t is None or len(t) == 0:
        return 0.0
    return sum(1 for c in t if c in _UPPER) / len(t)


@F.pandas_udf(DoubleType())
def _upper_ratio_k(s: pd.Series) -> pd.Series:
    return pd.Series([_py_upper_ratio(t) for t in s], dtype="float64")


def upper_ratio(col: Column) -> Column:
    return _upper_ratio_k(col)


@F.pandas_udf(DoubleType())
def _quality_raw_k(s: pd.Series) -> pd.Series:
    # float64 ops in the SAME order as the Column form:
    # round(len_term*0.4 + stop_term*0.4 + (1.0-noise)*0.2, 6) — the
    # round itself stays in Column land (HALF_UP)
    out = []
    for t in s:
        if t is None:
            # Column semantics: least(null/500, 1.0) -> 1.0, ratios -> 0.0
            length_term = 1.0
            stop_term = 0.0
            noise = 0.0
        else:
            length_term = min(len(t) / 500.0, 1.0)
            stop_term = min(_py_stop_ratio(t) * 4.0, 1.0)
            noise = min(_py_punct_ratio(t) * 5.0 + _py_upper_ratio(t) * 2.0, 1.0)
        out.append(length_term * 0.4 + stop_term * 0.4 + (1.0 - noise) * 0.2)
    return pd.Series(out, dtype="float64")


def quality_score(col: Column) -> Column:
    """[0,1] heuristic: favors mid-length documents with normal stopword
    density and low punctuation/upper noise."""
    return F.round(_quality_raw_k(col), 6)


_LANG_SETS = sorted(
    ((lang, frozenset(markers)) for lang, markers in LANG_MARKERS.items()),
    key=lambda kv: kv[0],
    reverse=True,
)


@F.pandas_udf(StringType())
def _lang_id_k(s: pd.Series) -> pd.Series:
    out = []
    for t in s:
        if t is None:
            out.append("und")
            continue
        toks = _py_tokens(t.lower())
        best_lang, best_score = "und", 0
        for lang, markers in _LANG_SETS:
            sc = sum(1 for w in toks if w in markers)
            # same reversed-iteration >= tie-break as the Column form
            if sc >= max(best_score, 1):
                best_lang = lang
            best_score = max(best_score, sc)
        out.append(best_lang)
    return pd.Series(out, dtype="object")


def lang_id(col: Column) -> Column:
    """argmax language by marker hits; 'und' when nothing matches.
    Ties break by language-code order (deterministic, mirrored in SQL)."""
    return _lang_id_k(col)


@F.pandas_udf(StringType())
def _fingerprint_k(s: pd.Series) -> pd.Series:
    out = []
    md5 = hashlib.md5
    for t in s:
        if t is None:
            # Column: concat_ws(' ', null array) -> '' -> md5('')
            out.append(md5(b"").hexdigest())
            continue
        toks = _py_tokens(t.lower())
        if len(toks) >= 3:
            out.append(
                min(
                    md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
                    for i in range(len(toks) - 2)
                )
            )
        else:
            out.append(md5(" ".join(toks).encode()).hexdigest())
    return pd.Series(out, dtype="object")


def fingerprint(col: Column) -> Column:
    """Rolling-hash document fingerprint: md5 over every token 3-gram,
    take the minimum — shift-robust (insertions far from the minimal
    window don't change it), portable (md5 in every engine)."""
    return _fingerprint_k(col)
