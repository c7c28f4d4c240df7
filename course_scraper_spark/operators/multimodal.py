"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media in the crawl appear as span rows with ``kind='media'`` and a
``media_ref`` (the reference extracts them as attribute fields, e.g. img
src — scraper schema 'attribute' type). A training pipeline needs the
bytes themselves plus decode/feature stages. The Spark-side plumbing —
schema, Arrow batch shape, partitioning, ``mapInPandas`` signatures — is
real and tested, and so is one codec: ``decode_bmp``, a pure-Python/numpy
decoder for uncompressed 24-bit BMP (the synthetic media table emits real
BMP payloads). The ``decode_fn`` hook stays injectable:

* default ``decode_bmp`` parses real bytes and dead-letters corrupt or
  unsupported payloads,
* ``fake_decode`` is the codec-free deterministic stand-in (md5-derived
  pseudo-features),
* ``strict_decode`` raises NotImplementedError — swap in a full decoder
  (PIL/torchaudio/ffmpeg) on a cluster with the libs installed for
  compressed formats.

Batch sizing matters more than usual here: media blobs are MBs, so the
media table repartitions by blob-size bins before the UDF to keep Arrow
batches bounded (the ``spark.sql.execution.arrow.maxRecordsPerBatch``
cap alone is row-count-based, not byte-based).
"""

from __future__ import annotations

import hashlib
import struct
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


def encode_bmp(width: int, height: int, rgb: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER).
    ``rgb``: uint8 array (height, width, 3), top-down RGB — stored
    bottom-up BGR with 4-byte row padding, per the format."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    bgr = rgb[::-1, :, ::-1]  # bottom-up, RGB->BGR
    if pad:
        padded = np.zeros((height, row_raw + pad), dtype=np.uint8)
        padded[:, :row_raw] = bgr.reshape(height, row_raw)
        data = padded.tobytes()
    else:
        data = bgr.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    return header + dib + data


def decode_bmp(payload: bytes, media_type: str = "image") -> np.ndarray:
    """Pure-Python/numpy decoder for uncompressed 24-bit BMP → 8-dim
    feature [w/256, h/256, mean R,G,B /255, gray std/128, gray min/255,
    gray max/255]. Raises (→ dead-letter row) on bad magic, unsupported
    bpp/compression, or truncated pixel data."""
    px = _decode_bmp_pixels(payload).astype(np.float32)
    height, width = px.shape[:2]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    return np.array(
        [
            width / 256.0,
            height / 256.0,
            float(r.mean()) / 255.0,
            float(g.mean()) / 255.0,
            float(b.mean()) / 255.0,
            float(gray.std()) / 128.0,
            float(gray.min()) / 255.0,
            float(gray.max()) / 255.0,
        ],
        dtype=np.float32,
    )


def _synth_bmp(ref: str) -> tuple[bytes, int, int]:
    """Deterministic small real BMP from a media_ref: dims and pixels are
    pure functions of crc32(ref)."""
    c = zlib.crc32(ref.encode())
    w = 16 + (c % 16)
    h = 16 + ((c >> 4) % 16)
    px = ((c + 7 * np.arange(w * h * 3)) % 251).astype(np.uint8).reshape(h, w, 3)
    return encode_bmp(w, h, px), w, h


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic media rows from the docs table's media spans:
    payload = a real (tiny) uncompressed BMP derived from the ref, so the
    decode stage exercises actual bytes; metadata matches the encoded
    dims. Exists so the plumbing has real binary columns to move through
    shuffles and Arrow."""
    media = (
        docs.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.col("sp.kind") == "media")
        .select("doc_id", F.col("sp.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf["media_ref"].tolist()
            encoded = [_synth_bmp(r) for r in refs]
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "doc_id": pdf["doc_id"].tolist(),
                    "media_type": ["image"] * len(refs),
                    "payload": [e[0] for e in encoded],
                    "width": [e[1] for e in encoded],
                    "height": [e[2] for e in encoded],
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


def _decode_bmp_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 array from an uncompressed 24-bit BMP — the
    shared parser behind decode_bmp and the resize transform."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP: bad magic/short header")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _hdr, width, height = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = height < 0
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    if width <= 0 or height <= 0 or len(payload) < offset + stride * height:
        raise ValueError("truncated BMP pixel data")
    arr = (
        np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=offset)
        .reshape(height, stride)[:, :row_raw]
        .reshape(height, width, 3)
    )
    if not top_down:
        arr = arr[::-1]
    return arr[:, :, ::-1]  # BGR -> RGB


def resize_media(
    media: DataFrame,
    width: int = 8,
    height: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Thumbnail stage: decode BMP → nearest-neighbor resize → re-encode
    BMP. Real bytes in, real bytes out (no codec libs needed for the
    uncompressed format); corrupt payloads dead-letter like
    extract_features. The batch-size discipline matches extract_features:
    size-binned repartition bounds Arrow batch BYTES."""
    spark = media.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    sized = media.withColumn(
        "_szbin", (F.log2(F.length("payload") + F.lit(1))).cast("int")
    ).repartition(parts, F.col("_szbin"), F.col("media_ref"))

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in batches:
            out = {"media_ref": [], "payload": [], "width": [], "height": [], "decode_ok": [], "error": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                out["media_ref"].append(ref)
                try:
                    px = _decode_bmp_pixels(bytes(payload))
                    h0, w0 = px.shape[:2]
                    # nearest-neighbor index maps (deterministic)
                    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                    thumb = px[yi][:, xi]
                    out["payload"].append(encode_bmp(width, height, thumb))
                    out["width"].append(width)
                    out["height"].append(height)
                    out["decode_ok"].append(True)
                    out["error"].append(None)
                except Exception as e:  # dead-letter, not task failure
                    out["payload"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["decode_ok"].append(False)
                    out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return sized.drop("_szbin").mapInPandas(run, out_schema)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = decode_bmp,
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
