"""Deterministic docs-table synthesis (the BASELINE input shape) from the
driver's ``documents.parquet``.

BASELINE.json's input_hint fixes the engine's input table as
``docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
The crawl produces that table from real pages; for driver-testdata
queries and benches we synthesize it from ``documents`` with pure Column
algebra (no RNG, no UDF): the text is chunked into 8-token spans, every
5th span is a media ref, chunk 0 of each group is a title.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK = 8


def docs_from_documents(documents: DataFrame) -> DataFrame:
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))

    def span(c):
        chunk_text = F.concat_ws(" ", F.slice(toks, c * CHUNK + 1, CHUNK))
        is_media = c % 5 == F.lit(4)
        kind = (
            F.when(is_media, F.lit("media"))
            .when(c % 5 == F.lit(0), F.lit("course_title"))
            .otherwise(F.lit("course_description"))
        )
        media_ref = F.when(
            is_media,
            F.concat(F.lit("img://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit("_"), c.cast("string"), F.lit(".png")),
        )
        text = F.when(~is_media, chunk_text)
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            c.cast("int").alias("offset"),
        )

    return documents.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.col("source"),
        F.transform(idx, span).alias("spans"),
    )


def docs_from_documents_pandas(documents: DataFrame) -> DataFrame:
    """Arrow twin of :func:`docs_from_documents` — identical rows
    (equality pinned in tests/test_spans_equality.py). Round 6: the
    Column form builds every span struct through an interpreted
    higher-order ``transform`` (slice + concat_ws per chunk per row),
    which dominated q_span_flatten; here the chunking is one C-speed
    loop per Arrow batch. Tokenization contract: ASCII ``\\s+``, empties
    dropped (same as the Column ``split(trim(...))`` + filter)."""
    import re

    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, sources, spans_col = [], [], []
            for did, source, text in zip(pdf["doc_id"], pdf["source"], pdf["text"]):
                toks = [t for t in re.split(r"\s+", text, flags=re.ASCII) if t]
                n_chunks = max(-(-len(toks) // CHUNK), 1)
                spans = []
                for c in range(n_chunks):
                    is_media = c % 5 == 4
                    kind = (
                        "media" if is_media
                        else ("course_title" if c % 5 == 0 else "course_description")
                    )
                    # NOTE 'doc:{did}': the Column form's F.col("doc_id")
                    # inside the transform resolves to the LATERAL alias
                    # ('doc:'||id) of the same select, not the input id
                    media_ref = (
                        f"img://{source}/doc:{did}_{c}.png" if is_media else None
                    )
                    text_c = None if is_media else " ".join(toks[c * CHUNK : (c + 1) * CHUNK])
                    spans.append((kind, text_c, media_ref, c))
                ids.append(f"doc:{did}")
                sources.append(source)
                spans_col.append(spans)
            yield pd.DataFrame({"doc_id": ids, "source": sources, "spans": spans_col})

    return documents.select("doc_id", "source", "text").mapInPandas(
        gen,
        "doc_id string, source string, "
        "spans array<struct<kind string, text string, media_ref string, offset int>>",
    )


def replicate_documents(documents: DataFrame, factor: int = 10) -> DataFrame:
    """Deterministic ``factor``× blow-up of the documents table for
    large-corpus benches (round-5 verdict #4: sub-4 s sf0.1 timings are
    noise-limited; regressions need a corpus where the dedup suite works
    for tens of seconds).

    Pure Column algebra, no RNG: variant 0 is the original corpus;
    variant v > 0 rewrites every 5th token to a variant-salted form, so

    * intra-variant duplicate structure is PRESERVED (identical texts
      stay identical, near-dups stay near — the transform is a pure
      function of token position and text), scaling pair/cluster work
      by ``factor``;
    * cross-variant pairs are BROKEN (3/5 of all 3-shingles contain a
      rewritten token; simhash moves with ~20% of tokens), so the
      blow-up multiplies work instead of creating one pathological
      ``factor``-way near-dup family per doc — which would trip the
      banding saturation guard and measure the guard, not the operator.

    doc_ids shift by ``variant * 10^9`` to stay unique and keep the
    original ids stable for spot-checks."""
    variants = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_v")
    base = documents.select("*", variants)
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    salted = F.when(
        F.col("_v") == 0, F.col("text")
    ).otherwise(
        F.array_join(
            F.zip_with(
                toks,
                F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda t, i: F.when(
                    i % 5 == 0,
                    F.concat(t, F.lit("_v"), F.col("_v").cast("string")),
                ).otherwise(t),
            ),
            " ",
        )
    )
    return base.select(
        (F.col("doc_id") + F.col("_v").cast("long") * F.lit(1_000_000_000)).alias("doc_id"),
        salted.alias("text"),
        *[c for c in documents.columns if c not in ("doc_id", "text")],
    )


def replicate_embeddings(emb: DataFrame, factor: int = 10, dim: int | None = None) -> DataFrame:
    """``factor``× blow-up of the embeddings table: variant v rotates
    each vector left by v positions (pure array slicing — deterministic,
    norm-preserving). Intra-variant cosine structure is preserved
    exactly (rotation is an isometry applied uniformly), cross-variant
    similarity is scrambled, so LSH/ANN work scales by ``factor``
    without collapsing into cross-variant duplicate pairs."""
    if dim is None:
        dim = len(emb.select("embedding").first()[0])
    variants = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_v")
    base = emb.select("*", variants)
    rot = F.concat(
        F.slice(F.col("embedding"), F.col("_v") + 1, F.lit(dim) - F.col("_v")),
        F.slice(F.col("embedding"), F.lit(1), F.col("_v")),
    )
    return base.select(
        (F.col("vec_id") + F.col("_v").cast("long") * F.lit(1_000_000_000)).alias("vec_id"),
        rot.alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )
