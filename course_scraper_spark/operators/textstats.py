"""Text analysis for large-scale corpus pipelines (beyond-reference ops).

All pure Column algebra — whole-stage codegen, no Python — and every
function is mirrored by an ANSI-SQL oracle in ``__spark_entry__.py`` so
the driver's DuckDB gate checks it value-for-value.

* token counting: whitespace tokenization + a BPE-ish subword estimate
* quality scoring: length / punctuation / stopword / uppercase ratios
* language ID: marker-word n-gram heuristic over a small per-language
  stopword inventory
* fingerprinting: min-hash over token 3-gram rolling windows (winnowing's
  "min over window hashes" idea with a portable md5 hash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker inventories (deterministic heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "nicht"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def subword_estimate(col: Column) -> Column:
    """BPE-ish token estimate: words + one extra per 4 chars of long words
    (the usual ~4-chars-per-subword heuristic)."""
    per_word = F.transform(
        tokens(col),
        lambda t: F.when(F.length(t) <= F.lit(4), F.lit(1)).otherwise(
            F.ceil(F.length(t) / F.lit(4)).cast("int")
        ),
    )
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def upper_ratio(col: Column) -> Column:
    n = F.length(col)
    u = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    return F.when(n > 0, u / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """[0,1] heuristic: favors mid-length documents with normal stopword
    density and low punctuation/upper noise."""
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    noise = F.least(punct_ratio(col) * F.lit(5.0) + upper_ratio(col) * F.lit(2.0), F.lit(1.0))
    return F.round(length_term * F.lit(0.4) + stop_term * F.lit(0.4) + (F.lit(1.0) - noise) * F.lit(0.2), 6)


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    toks = tokens(F.lower(col))
    out = []
    for lang, markers in LANG_MARKERS.items():
        out.append((lang, F.size(F.filter(toks, lambda t: t.isin(markers)))))
    return out


def lang_id(col: Column) -> Column:
    """argmax language by marker hits; 'und' when nothing matches.
    Ties break by language-code order (deterministic, mirrored in SQL)."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in sorted(scores, key=lambda kv: kv[0], reverse=True):
        # iterate reversed so earlier codes win ties via >=
        cond = s >= F.greatest(best_score, F.lit(1))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return best_lang


def fingerprint(col: Column) -> Column:
    """Rolling-hash document fingerprint: md5 over every token 3-gram,
    take the minimum — shift-robust (insertions far from the minimal
    window don't change it), portable (md5 in every engine)."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(3), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2), F.element_at(toks, i + 3))
        ),
    )
    return F.when(n >= 3, F.array_min(grams)).otherwise(F.md5(F.concat_ws(" ", toks)))
