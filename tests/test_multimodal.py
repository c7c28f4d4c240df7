"""Multimodal plumbing: binary payloads through shuffles + Arrow, decode
stub behavior, dead-letter error rows."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    strict_decode,
    synth_media_table,
)
from course_scraper_spark.operators.spans import SPAN_TYPE
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def docs_with_media(spark):
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("spans", SPAN_TYPE)]
    )
    rows = [
        (
            f"https://h.edu/p{i}",
            [
                ("course_title", f"T{i}", None, 0),
                ("media", None, f"img://h.edu/{i}.png", 1),
                ("media", None, f"img://h.edu/{i}b.png", 2),
            ],
        )
        for i in range(20)
    ]
    return spark.createDataFrame(rows, schema)


def test_media_table_deterministic(docs_with_media):
    m1 = synth_media_table(docs_with_media)
    assert m1.count() == 40
    r = m1.filter(F.col("media_ref") == "img://h.edu/3.png").first()
    assert r.media_type == "image" and r.payload is not None and r.width >= 64


def test_feature_extraction_deterministic(docs_with_media):
    media = synth_media_table(docs_with_media)
    f1 = {r.media_ref: r.feature for r in extract_features(media).collect()}
    f2 = {r.media_ref: r.feature for r in extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())


def test_strict_decode_dead_letters(docs_with_media):
    media = synth_media_table(docs_with_media)
    out = extract_features(media, decode_fn=strict_decode)
    rows = out.collect()
    assert all(not r.decode_ok for r in rows)
    assert all("NotImplementedError" in r.error for r in rows)
    assert len(rows) == 40  # no task failures, every row routed


def test_fake_decode_stability():
    a = fake_decode(b"payload-bytes", "image")
    b = fake_decode(b"payload-bytes", "image")
    assert list(a) == list(b) and len(a) == 8
