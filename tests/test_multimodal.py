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
    assert r.media_type == "image" and r.payload is not None and r.width >= 16
    assert bytes(r.payload[:2]) == b"BM"  # real BMP bytes, not a stub blob


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


# -- real BMP codec (pure Python/numpy) ---------------------------------------


def test_bmp_roundtrip_known_values():
    import numpy as np

    from course_scraper_spark.operators.multimodal import decode_bmp, encode_bmp

    w, h = 5, 3  # odd width exercises the 4-byte row padding
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = 200  # R
    rgb[..., 1] = 100  # G
    rgb[..., 2] = 50   # B
    feat = decode_bmp(encode_bmp(w, h, rgb))
    assert len(feat) == 8
    assert abs(feat[0] - w / 256) < 1e-6 and abs(feat[1] - h / 256) < 1e-6
    assert abs(feat[2] - 200 / 255) < 1e-6  # mean R
    assert abs(feat[3] - 100 / 255) < 1e-6  # mean G
    assert abs(feat[4] - 50 / 255) < 1e-6   # mean B
    assert feat[5] < 1e-5                   # constant image -> ~zero std


def test_default_decode_is_real_bmp(docs_with_media):
    media = synth_media_table(docs_with_media)
    out = extract_features(media).collect()  # default decode_fn=decode_bmp
    assert len(out) == 40 and all(r.decode_ok for r in out)
    # features reflect the encoded dims, which the metadata also carries
    meta = {r.media_ref: (r.width, r.height) for r in media.collect()}
    for r in out:
        w, h = meta[r.media_ref]
        assert abs(r.feature[0] - w / 256) < 1e-5
        assert abs(r.feature[1] - h / 256) < 1e-5


def test_corrupt_bmp_dead_letters(spark):
    import pandas as pd

    from course_scraper_spark.operators.multimodal import MEDIA_SCHEMA, encode_bmp
    import numpy as np

    good = encode_bmp(4, 4, np.full((4, 4, 3), 9, dtype=np.uint8))
    rows = [
        ("ok", None, "image", bytearray(good), 4, 4, None),
        ("bad-magic", None, "image", bytearray(b"XX" + good[2:]), 4, 4, None),
        ("truncated", None, "image", bytearray(good[:30]), 4, 4, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_ref: r for r in extract_features(media).collect()}
    assert got["ok"].decode_ok
    assert not got["bad-magic"].decode_ok and "ValueError" in got["bad-magic"].error
    assert not got["truncated"].decode_ok


def test_resize_media_thumbnails(docs_with_media):
    from course_scraper_spark.operators.multimodal import decode_bmp, resize_media

    media = synth_media_table(docs_with_media)
    thumbs = resize_media(media, width=8, height=8).collect()
    assert len(thumbs) == 40 and all(r.decode_ok for r in thumbs)
    for r in thumbs[:5]:
        feat = decode_bmp(bytes(r.payload))  # output is itself a valid BMP
        assert abs(feat[0] - 8 / 256) < 1e-6 and abs(feat[1] - 8 / 256) < 1e-6
        assert r.width == 8 and r.height == 8


def test_resize_media_preserves_constant_color(spark):
    import numpy as np

    from course_scraper_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_bmp,
        resize_media,
    )

    rgb = np.zeros((10, 10, 3), dtype=np.uint8)
    rgb[..., 0] = 120
    rgb[..., 1] = 60
    rgb[..., 2] = 30
    rows = [("c", None, "image", bytearray(encode_bmp(10, 10, rgb)), 10, 10, None),
            ("bad", None, "image", bytearray(b"nope"), 1, 1, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_ref: r for r in resize_media(media, width=4, height=4).collect()}
    feat = decode_bmp(bytes(got["c"].payload))
    # nearest-neighbor on a constant image keeps the exact color
    assert abs(feat[2] - 120 / 255) < 1e-6
    assert abs(feat[3] - 60 / 255) < 1e-6
    assert abs(feat[4] - 30 / 255) < 1e-6
    assert not got["bad"].decode_ok and got["bad"].payload is None


# -- real WAV codec (PCM 16-bit mono, pure Python/numpy) ----------------------


def test_wav_roundtrip_known_tone():
    import numpy as np

    from course_scraper_spark.operators.multimodal import decode_wav, encode_wav

    sr, freq, dur = 8000, 440.0, 0.25
    t = np.arange(int(sr * dur)) / sr
    samples = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    feat = decode_wav(encode_wav(samples, sr))
    assert len(feat) == 8
    assert abs(feat[0] - dur) < 1e-3                     # duration
    assert abs(feat[1] - 0.5 / np.sqrt(2)) < 0.01        # sine rms = A/sqrt(2)
    assert abs(feat[7] - freq / (sr / 2)) < 0.01         # dominant freq fraction
    assert 0.45 < feat[3] <= 0.51                        # peak ~ amplitude


def test_wav_corrupt_and_unsupported_raise():
    import numpy as np
    import struct

    from course_scraper_spark.operators.multimodal import decode_wav, encode_wav

    good = encode_wav(np.zeros(100, dtype=np.int16) + 5, 8000)
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:50])
    # stereo fmt chunk -> unsupported
    stereo = bytearray(good)
    struct.pack_into("<H", stereo, 12 + 8 + 2, 2)
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(stereo))


def test_synth_audio_default_decode(spark):
    from course_scraper_spark.operators.multimodal import extract_features, synth_audio_table

    media = synth_audio_table(spark, n=12)
    rows = media.collect()
    assert all(bytes(r.payload[:4]) == b"RIFF" for r in rows)
    out = {r.media_ref: r for r in extract_features(media).collect()}
    assert len(out) == 12 and all(r.decode_ok for r in out.values())
    # decoded duration matches the metadata the generator recorded
    meta = {r.media_ref: r.duration_s for r in rows}
    for ref, r in out.items():
        assert abs(r.feature[0] - meta[ref]) < 1e-3


def test_decode_media_dispatch(spark):
    import numpy as np

    from course_scraper_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_wav,
    )

    from course_scraper_spark.operators.multimodal import encode_avi

    img = decode_media(encode_bmp(4, 4, np.full((4, 4, 3), 7, dtype=np.uint8)), "image")
    aud = decode_media(encode_wav(np.zeros(80, dtype=np.int16) + 3, 8000), "audio")
    vid = decode_media(encode_avi([np.full((4, 4, 3), 7, dtype=np.uint8)] * 2, fps=5), "video")
    assert len(img) == 8 and len(aud) == 8 and len(vid) == 8
    with pytest.raises(NotImplementedError):
        decode_media(b"whatever", "3d-mesh")  # genuinely unsupported type
    with pytest.raises(ValueError):
        decode_media(b"not-an-avi", "video")  # corrupt video dead-letters


# -- real PNG codec (stdlib zlib + numpy) -------------------------------------


def test_png_roundtrip_all_filters_and_color_types():
    """encode_png rotates the row filter (y % 5), so any image taller
    than 5 rows exercises None/Sub/Up/Average/Paeth; decode must recover
    the exact pixels for grey, RGB and RGBA."""
    import numpy as np

    from course_scraper_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png,
    )

    h, w = 11, 7
    rgb = ((np.arange(h * w * 3) * 37 + 11) % 256).astype(np.uint8).reshape(h, w, 3)
    assert np.array_equal(_decode_png_pixels(encode_png(w, h, rgb, color_type=2)), rgb)
    grey = rgb[..., 0]
    out = _decode_png_pixels(encode_png(w, h, grey, color_type=0))
    assert np.array_equal(out, np.repeat(grey[..., None], 3, axis=2))
    out = _decode_png_pixels(encode_png(w, h, rgb, color_type=6))
    assert np.array_equal(out, rgb)  # opaque alpha dropped


def test_png_and_bmp_same_pixels_same_feature():
    import numpy as np

    from course_scraper_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
        encode_png,
    )

    h, w = 9, 13
    rgb = ((np.arange(h * w * 3) * 91 + 3) % 256).astype(np.uint8).reshape(h, w, 3)
    f_bmp = decode_bmp(encode_bmp(w, h, rgb))
    f_png = decode_image(encode_png(w, h, rgb))
    assert np.allclose(f_bmp, f_png)


def test_png_corrupt_dead_letters():
    import numpy as np
    import pytest as _pytest

    from course_scraper_spark.operators.multimodal import (
        _decode_png_pixels,
        encode_png,
    )

    good = encode_png(4, 4, np.full((4, 4, 3), 7, dtype=np.uint8))
    with _pytest.raises(ValueError, match="signature"):
        _decode_png_pixels(b"\x89PNX" + good[4:])
    # flip a byte inside IDAT: the CRC check must catch it
    bad = bytearray(good)
    bad[45] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC|chunk|length"):
        _decode_png_pixels(bytes(bad))
    with _pytest.raises(ValueError):
        _decode_png_pixels(good[:30])


def test_mixed_container_pipeline(docs_with_media, spark):
    """The full decode + resize pipeline over a table mixing real BMP
    and real PNG payloads: every row decodes via magic sniff; thumbnails
    come back in the same container as the input."""
    from course_scraper_spark.operators.multimodal import (
        PNG_SIG,
        extract_features,
        resize_media,
        synth_media_table,
    )

    media = synth_media_table(docs_with_media, formats=("bmp", "png")).cache()
    payloads = [bytes(r.payload) for r in media.collect()]
    n_png = sum(p[:8] == PNG_SIG for p in payloads)
    n_bmp = sum(p[:2] == b"BM" for p in payloads)
    assert n_png > 0 and n_bmp > 0 and n_png + n_bmp == len(payloads)

    feats = extract_features(media).collect()
    assert len(feats) == len(payloads) and all(r.decode_ok for r in feats)

    thumbs = {r.media_ref: bytes(r.payload) for r in resize_media(media, 8, 8).collect()}
    orig = {r.media_ref: bytes(r.payload) for r in media.collect()}
    for ref, p in orig.items():
        t = thumbs[ref]
        if p[:8] == PNG_SIG:
            assert t[:8] == PNG_SIG  # format preserved
        else:
            assert t[:2] == b"BM"


# -- real AVI codec + frame sampling (video columns) --------------------------


def test_avi_roundtrip_exact_frames():
    import numpy as np

    from course_scraper_spark.operators.multimodal import _decode_avi_frames, encode_avi

    h, w = 10, 7  # odd width exercises row padding
    frames = [
        ((np.arange(h * w * 3) * (k + 3)) % 256).astype(np.uint8).reshape(h, w, 3)
        for k in range(5)
    ]
    out, fps = _decode_avi_frames(encode_avi(frames, fps=12))
    assert fps == 12 and len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_avi_decode_features_and_motion():
    import numpy as np

    from course_scraper_spark.operators.multimodal import decode_avi, encode_avi

    base = ((np.arange(8 * 8 * 3) * 5) % 256).astype(np.uint8).reshape(8, 8, 3)
    moving = [np.roll(base, k, axis=1) for k in range(6)]
    still = [base] * 6
    f_mov = decode_avi(encode_avi(moving, fps=10))
    f_still = decode_avi(encode_avi(still, fps=10))
    assert abs(f_mov[2] - 0.6) < 1e-6  # duration = 6 frames / 10 fps
    assert f_mov[5] > 0 and f_still[5] == 0  # motion feature separates them


def test_avi_corrupt_dead_letters():
    import numpy as np
    import pytest as _pytest

    from course_scraper_spark.operators.multimodal import _decode_avi_frames, encode_avi

    good = encode_avi([np.zeros((4, 4, 3), dtype=np.uint8)], fps=5)
    with _pytest.raises(ValueError, match="magic"):
        _decode_avi_frames(b"RIFX" + good[4:])
    with _pytest.raises(ValueError):
        _decode_avi_frames(good[:60])


def test_sample_frames_feeds_image_stages(spark):
    """Video → frame rows → the EXISTING image stages consume them:
    every sampled frame is a real BMP that extract_features decodes."""
    import numpy as np

    from course_scraper_spark.operators.multimodal import (
        _decode_avi_frames,
        extract_features,
        sample_frames,
        synth_video_table,
    )

    media = synth_video_table(spark, n=8).cache()
    feats = extract_features(media).collect()  # default decoder handles video now
    assert len(feats) == 8 and all(r.decode_ok for r in feats)

    frames = sample_frames(media, every_n=2).cache()
    rows = frames.collect()
    assert all(r.decode_ok for r in rows)
    # every_n=2 over nf frames -> ceil(nf/2) rows per clip
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    for r in media.collect():
        nf = len(_decode_avi_frames(bytes(r.payload))[0])
        got = by_ref[r.media_ref]
        assert len(got) == (nf + 1) // 2, r.media_ref
        assert sorted(x.frame_idx for x in got) == list(range(0, nf, 2))
        assert all(abs(x.ts_s - x.frame_idx / 10.0) < 1e-9 for x in got)

    # frame rows ARE image rows: BMP payloads decode through the image path
    img_rows = frames.select(
        F.concat_ws("#", "media_ref", F.col("frame_idx").cast("string")).alias("media_ref"),
        F.lit(None).cast("string").alias("doc_id"),
        F.lit("image").alias("media_type"),
        "payload",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
    )
    img_feats = extract_features(img_rows).collect()
    assert len(img_feats) == len(rows) and all(r.decode_ok for r in img_feats)


def test_sample_frames_dead_letters_corrupt_clip(spark):
    import numpy as np

    from course_scraper_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_avi,
        sample_frames,
    )

    good = encode_avi([np.full((4, 4, 3), 5, dtype=np.uint8)] * 3, fps=5)
    rows = [
        ("ok", None, "video", bytearray(good), None, None, 0.6),
        ("bad", None, "video", bytearray(b"nope"), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_ref: r for r in sample_frames(media, every_n=1).collect() if True}
    oks = [r for r in sample_frames(media, every_n=1).collect() if r.decode_ok]
    bads = [r for r in sample_frames(media, every_n=1).collect() if not r.decode_ok]
    assert len(oks) == 3 and len(bads) == 1 and bads[0].media_ref == "bad"
    assert "ValueError" in bads[0].error
