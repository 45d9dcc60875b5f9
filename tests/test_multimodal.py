"""Multimodal plumbing: metadata sniffing, stubbed decode, feature shapes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from beamium_spark.operators.multimodal import (
    attach_metadata,
    decode_image,
    extract_features,
    fake_decode,
    frame_sample_plan,
)


def test_sniff_and_metadata(spark):
    rows = [
        ("jpg", bytearray([0xFF, 0xD8, 0xFF, 0xE0, 0, 0])),
        ("png", bytearray([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A])),
        ("gif", b"GIF89a..."),
        ("wav", b"RIFF....WAVE"),
        ("mp4", bytearray([0, 0, 0, 0x18]) + b"ftypmp42"),
        ("htm", b"<html><body>x</body></html>"),
        ("nil", b""),
    ]
    df = spark.createDataFrame([(n, bytes(p)) for n, p in rows], "name string, html binary")
    out = {r["name"]: r["media"] for r in attach_metadata(df).collect()}
    assert out["jpg"]["format"] == "jpeg"
    assert out["png"]["format"] == "png"
    assert out["gif"]["format"] == "gif"
    assert out["wav"]["format"] == "riff"
    assert out["mp4"]["format"] == "mp4"
    assert out["htm"]["format"] == "html"
    assert out["nil"]["format"] == "empty"
    assert out["htm"]["bytes"] == 27


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_fake_decode_deterministic():
    a, b = fake_decode(b"payload"), fake_decode(b"payload")
    assert a.shape == (8, 8, 3) and a.dtype == np.float32
    assert np.array_equal(a, b)
    assert not np.array_equal(a, fake_decode(b"other"))
    assert np.array_equal(fake_decode(b""), np.zeros((8, 8, 3), dtype=np.float32))


def test_sha_decode_engine_neutral():
    import hashlib

    from beamium_spark.operators.multimodal import sha_decode

    a = sha_decode(b"payload")
    assert a.shape == (8, 8, 1) and a.dtype == np.float32
    # first pixel is the first byte of sha256(payload), /256 — exact
    d1 = hashlib.sha256(b"payload").hexdigest()
    assert a[0, 0, 0] == int(d1[:2], 16) / 256.0
    # byte 32 comes from the chained digest sha256(hex(d1))
    d2 = hashlib.sha256(d1.encode()).hexdigest()
    assert a.ravel()[32] == int(d2[:2], 16) / 256.0
    assert np.array_equal(sha_decode(b""), np.zeros((8, 8, 1), dtype=np.float32))
    # every value is exactly k/256: float32 representation is lossless
    assert np.array_equal(a * 256.0, np.round(a * 256.0))


def test_extract_features_sha_decoder(spark, tiny_web_pages):
    from beamium_spark.operators.multimodal import extract_features, sha_decode

    rows = extract_features(
        tiny_web_pages.limit(20), decoder=sha_decode
    ).collect()
    assert all(len(r["feat"]) == 64 for r in rows)
    for r in rows:
        want = float(np.sqrt((np.array(r["feat"], dtype=np.float64) ** 2).sum()))
        assert r["feat_norm"] == want


def test_extract_features_shapes(spark, tiny_web_pages):
    feats = extract_features(tiny_web_pages.limit(50), h=4, w=4)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feat"]) == 16 for r in rows)
    # same url (byte-identical payload) → same features
    df2 = extract_features(tiny_web_pages.limit(50), h=4, w=4)
    a = {r["id"]: list(r["feat"]) for r in rows}
    b = {r["id"]: list(r["feat"]) for r in df2.collect()}
    assert a == b


def test_frame_sample_plan(spark, tiny_web_pages):
    plan = frame_sample_plan(tiny_web_pages.limit(10), n_frames=4)
    assert plan.count() == 40
    assert plan.groupBy("id").count().filter("count != 4").count() == 0
    bad = plan.filter((F.col("byte_offset") < 0) | (F.col("byte_offset") > F.col("bytes")))
    assert bad.count() == 0
