"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media in the crawl appear as span rows with ``kind='media'`` and a
``media_ref`` (the reference extracts them as attribute fields, e.g. img
src — scraper schema 'attribute' type). A training pipeline needs the
bytes themselves plus decode/feature stages. The *Spark-side plumbing*
here is real and tested — schema, Arrow batch shape, partitioning,
``mapInPandas`` signatures; the actual image/audio decoding is stubbed
(no codec libraries in this container) behind ``decode_fn``:

* default ``fake_decode`` is a deterministic stand-in producing stable
  pseudo-features from the bytes (tests pin its output),
* ``strict_decode`` raises NotImplementedError — swap in a real decoder
  (PIL/torchaudio/ffmpeg) on a cluster with the libs installed.

Batch sizing matters more than usual here: media blobs are MBs, so the
media table repartitions by blob-size bins before the UDF to keep Arrow
batches bounded (the ``spark.sql.execution.arrow.maxRecordsPerBatch``
cap alone is row-count-based, not byte-based).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic fake media rows from the docs table's media spans:
    payload = zlib-compressed media_ref bytes (stable), metadata from a
    crc of the ref. Exists so the plumbing has real binary columns to
    move through shuffles and Arrow."""
    media = (
        docs.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.kind") == "media")
        .select("doc_id", F.col("sp.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf["media_ref"].tolist()
            payloads = [zlib.compress(r.encode()) for r in refs]
            crcs = [zlib.crc32(r.encode()) for r in refs]
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "doc_id": pdf["doc_id"].tolist(),
                    "media_type": ["image"] * len(refs),
                    "payload": payloads,
                    "width": [64 + (c % 16) * 32 for c in crcs],
                    "height": [64 + ((c >> 4) % 16) * 32 for c in crcs],
                    "duration_s": [None] * len(refs),
                }
            )

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic 8-dim pseudo-feature from the payload bytes."""
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0


def strict_decode(payload: bytes, media_type: str) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding needs codec libraries (PIL/ffmpeg) not present "
        "in this container; inject a decoder via extract_features(decode_fn=...)"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
    partitions: int | None = None,
) -> DataFrame:
    """Decode + featurize via mapInPandas; per-row failures become error
    rows (dead-letter pattern), never task failures."""
    spark = media.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    # bound Arrow batch BYTES: bin rows by payload size, partition on the bin
    sized = media.withColumn(
        "_szbin", (F.log2(F.length("payload") + F.lit(1))).cast("int")
    ).repartition(parts, F.col("_szbin"), F.col("media_ref"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "feature": [], "decode_ok": [], "error": []}
            for ref, payload, mtype in zip(pdf["media_ref"], pdf["payload"], pdf["media_type"]):
                out["media_ref"].append(ref)
                try:
                    feat = decode_fn(bytes(payload), mtype)
                    out["feature"].append([float(x) for x in feat])
                    out["decode_ok"].append(True)
                    out["error"].append(None)
                except Exception as e:  # dead-letter, not task failure
                    out["feature"].append(None)
                    out["decode_ok"].append(False)
                    out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return sized.drop("_szbin").mapInPandas(run, FEATURE_SCHEMA)
