"""Codec round-trip: identity on random + adversarial series (FIXTURES/
SURVEY §5.2 item 2), property-based via hypothesis, plus the Spark
block encode/decode path."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from beamium_spark.operators.codec import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


def _rt_ts(ts):
    ts = np.asarray(ts, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(ts))
    assert np.array_equal(ts, out)


def _rt_val(v):
    v = np.asarray(v, dtype=np.float64)
    out = decode_values(encode_values(v))
    # bit-exact, incl. NaN payloads and signed zeros
    assert np.array_equal(v.view(np.uint64), out.view(np.uint64))


@pytest.mark.parametrize("n", [0, 1, 2, 3, 127, 128, 129, 256, 1024])
def test_sizes_regular(n):
    _rt_ts(np.arange(n, dtype=np.int64) * 60_000_000)
    _rt_val(np.full(n, 42.5))


def test_constant_series():
    _rt_ts(np.full(500, 1735689600000000, dtype=np.int64))
    _rt_val(np.zeros(500))


def test_monotone():
    _rt_ts(np.cumsum(np.ones(999, dtype=np.int64)))
    _rt_val(np.arange(999, dtype=np.float64))


def test_negative_and_special_floats():
    _rt_val(np.array([-0.0, 0.0, 1.5, -1.5, np.pi, 1e-308, -1e308]))


def test_backwards_timestamps_roundtrip():
    # codec must be order-agnostic identity even if input isn't sorted
    _rt_ts(np.array([100, 50, 200, 1], dtype=np.int64))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**52), min_size=0, max_size=400
    )
)
def test_hypothesis_timestamps(xs):
    _rt_ts(np.sort(np.array(xs, dtype=np.int64)))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, width=64), min_size=0, max_size=400
    )
)
def test_hypothesis_values(xs):
    _rt_val(np.array(xs, dtype=np.float64))


def test_compression_on_regular_grid():
    ts = np.arange(10_000, dtype=np.int64) * 60_000_000
    assert len(encode_timestamps(ts)) < 10_000 * 8 / 50  # >50× vs raw int64


def test_spark_block_roundtrip(spark, tiny_web_pages):
    from pyspark.sql import functions as F

    from beamium_spark.operators.blocks import block_stats, decode_blocks, encode_blocks
    from beamium_spark.operators.extract import extract_points

    pts = extract_points(tiny_web_pages, bucket_mode="site").select(
        "bucket", "metric", "ts", "value"
    )
    blocks = encode_blocks(pts, "1 hour").cache()
    back = decode_blocks(blocks)
    # multiset equality of (bucket, metric, ts, value)
    assert back.count() == pts.count()
    assert pts.exceptAll(back).count() == 0
    assert back.exceptAll(pts).count() == 0
    # accounting adds up
    stats = block_stats(blocks)
    total = stats.agg(F.sum("points").alias("p")).collect()[0]["p"]
    assert total == pts.count()
