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
