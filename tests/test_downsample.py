"""M4 downsample: hand-checked extremes, brute-force fuzz, plan shape."""

import datetime as dt
import itertools
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from beamium_spark.operators.downsample import M4_COLS, m4_downsample, m4_points


def _pt(sec, val, bucket=1, metric="m"):
    return Row(
        bucket=bucket,
        metric=metric,
        ts=dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec),
        value=float(val),
    )


BASE_US = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000


def test_m4_hand_checked(spark):
    # one 60s window: first at t=1, min 2.0 at t=30, max 9.0 at t=10, last t=50
    rows = [_pt(1, 5.0), _pt(10, 9.0), _pt(30, 2.0), _pt(50, 7.0)]
    out = m4_downsample(spark.createDataFrame(rows), "1 minute").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.t_first, r.v_first) == (BASE_US + 1_000_000, 5.0)
    assert (r.t_min, r.v_min) == (BASE_US + 30_000_000, 2.0)
    assert (r.t_max, r.v_max) == (BASE_US + 10_000_000, 9.0)
    assert (r.t_last, r.v_last) == (BASE_US + 50_000_000, 7.0)


def test_m4_tie_breaking(spark):
    # duplicate min value: earliest ts wins; duplicate max: latest ts wins;
    # two points on the same timestamp: first takes the smaller value,
    # last the larger.
    rows = [
        _pt(0, 3.0), _pt(0, 8.0),            # same ts
        _pt(10, 1.0), _pt(20, 1.0),          # equal minima
        _pt(30, 9.0), _pt(40, 9.0),          # equal maxima
        _pt(59, 4.0),
    ]
    r = m4_downsample(spark.createDataFrame(rows), "1 minute").collect()[0]
    assert (r.t_first, r.v_first) == (BASE_US, 3.0)
    assert (r.t_min, r.v_min) == (BASE_US + 10_000_000, 1.0)
    assert (r.t_max, r.v_max) == (BASE_US + 40_000_000, 9.0)
    assert (r.t_last, r.v_last) == (BASE_US + 59_000_000, 4.0)


def test_m4_fuzz_vs_bruteforce(spark):
    rng = random.Random(20240817)
    rows = [
        _pt(
            rng.randrange(0, 3600),
            rng.choice([1.0, 2.0, 5.5, -3.0, 9.0]),
            bucket=rng.randrange(3),
            metric=rng.choice(["a", "b"]),
        )
        for _ in range(400)
    ]
    out = {
        (r.bucket, r.metric, r.ws): r
        for r in m4_downsample(spark.createDataFrame(rows), "5 minutes").collect()
    }
    key = lambda p: (p.bucket, p.metric, int(p.ts.timestamp()) // 300 * 300)
    for k, grp in itertools.groupby(sorted(rows, key=key), key=key):
        grp = list(grp)
        r = out[k]
        tus = lambda p: int(p.ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        first = min(grp, key=lambda p: (tus(p), p.value))
        last = max(grp, key=lambda p: (tus(p), p.value))
        low = min(grp, key=lambda p: (p.value, tus(p)))
        high = max(grp, key=lambda p: (p.value, tus(p)))
        assert (r.t_first, r.v_first) == (tus(first), first.value)
        assert (r.t_last, r.v_last) == (tus(last), last.value)
        assert (r.t_min, r.v_min) == (tus(low), low.value)
        assert (r.t_max, r.v_max) == (tus(high), high.value)
    assert len(out) == len({key(p) for p in rows})


def test_m4_points_explode(spark):
    rows = [_pt(1, 5.0), _pt(10, 9.0), _pt(30, 2.0), _pt(50, 7.0), _pt(120, 1.0)]
    m4 = m4_downsample(spark.createDataFrame(rows), "1 minute")
    pts = m4_points(m4).collect()
    # window 1 → 4 distinct extremes; window 3 has a single point → all four
    # roles coincide → 1 distinct output row.
    assert len(pts) == 5
    assert {(p.t, p.v) for p in pts if p.t == BASE_US + 120_000_000} == {
        (BASE_US + 120_000_000, 1.0)
    }


def test_m4_single_shuffle_plan(spark):
    rows = [_pt(1, 5.0), _pt(10, 9.0)]
    m4 = m4_downsample(spark.createDataFrame(rows), "1 minute")
    plan = m4._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # struct min/max has no fixed-width mutable buffer, so Spark picks
    # SortAggregate — what matters for scale is that the map side still
    # partial-aggregates BEFORE the exchange (≤4 structs per group cross
    # the wire, not raw points).
    assert "partial_min" in plan and plan.index("partial_min") > plan.index(
        "Exchange"
    ), plan


def test_m4_columns(spark):
    rows = [_pt(1, 5.0)]
    m4 = m4_downsample(spark.createDataFrame(rows), "1 minute")
    assert m4.columns == ["bucket", "metric", "ws"] + list(M4_COLS)


def test_m4_rejects_bad_window(spark):
    with pytest.raises(ValueError, match="unsupported window"):
        m4_downsample(spark.range(1), "sideways")
