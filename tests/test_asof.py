"""As-of join semantics: backward-inclusive match, NULLs before first
right row, tolerance staleness guard."""

import datetime as dt

from pyspark.sql import functions as F

from beamium_spark.operators.asof import asof_join


def _frames(spark):
    t0 = dt.datetime(2025, 1, 1, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [
            (0, "m", ts(30), 1.0),   # before any right row -> NULLs
            (0, "m", ts(60), 2.0),   # exactly at right ts -> inclusive match
            (0, "m", ts(95), 3.0),   # between rights -> 60s row
            (0, "m", ts(500), 4.0),  # long after -> 120s row (stale w/ tol)
            (1, "m", ts(70), 5.0),   # other key, no right rows -> NULLs
        ],
        "bucket int, metric string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (0, "m", ts(60), 10, 100.0, 1.0, 9.0),
            (0, "m", ts(120), 20, 200.0, 2.0, 8.0),
        ],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        (r["bucket"], r["value"]): (r["asof_window_start"], r["asof_cnt"])
        for r in asof_join(left, right).collect()
    }
    t0 = dt.datetime(2025, 1, 1, 0, 0)
    assert out[(0, 1.0)] == (None, None)
    assert out[(0, 2.0)] == (t0 + dt.timedelta(seconds=60), 10)  # inclusive
    assert out[(0, 3.0)] == (t0 + dt.timedelta(seconds=60), 10)
    assert out[(0, 4.0)] == (t0 + dt.timedelta(seconds=120), 20)
    assert out[(1, 5.0)] == (None, None)
    # every left row survives (left-join semantics)
    assert asof_join(left, right).count() == left.count()


def test_asof_tolerance_drops_stale(spark):
    left, right = _frames(spark)
    out = {
        (r["bucket"], r["value"]): r["asof_cnt"]
        for r in asof_join(left, right, tolerance_seconds=60).collect()
    }
    assert out[(0, 2.0)] == 10   # 0s old
    assert out[(0, 3.0)] == 10   # 35s old
    assert out[(0, 4.0)] is None  # 380s old > 60s tolerance
    assert out[(1, 5.0)] is None


def test_asof_single_exchange(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union/window form: no join operator at all, one hashpartitioning
    # exchange on the key (plus AQE bookkeeping) — never a range explosion
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_asof_extra_left_columns_pass_through(spark):
    left, right = _frames(spark)
    left2 = left.withColumn("tag", F.concat(F.lit("t"), F.col("value")))
    out = asof_join(left2, right)
    assert "tag" in out.columns
    assert out.filter(F.col("tag").isNull()).count() == 0


# ---- property: union/window asof == brute-force reference ------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_pair = st.tuples(
    st.integers(min_value=0, max_value=2),      # key
    st.integers(min_value=0, max_value=3600),   # seconds offset
)


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(_pair, min_size=1, max_size=12),
    rights=st.lists(_pair, min_size=0, max_size=12),
)
def test_asof_matches_bruteforce(spark, lefts, rights):
    t0 = dt.datetime(2025, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(k, "m", ts(s), float(i)) for i, (k, s) in enumerate(lefts)],
        "bucket int, metric string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(k, "m", ts(s), i, float(i), 0.0, 0.0) for i, (k, s) in enumerate(rights)],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    ) if rights else spark.createDataFrame(
        [],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )

    got = {
        (r["bucket"], r["value"]): r["asof_window_start"]
        for r in asof_join(left, right).collect()
    }

    def brute(k, s):
        cands = [rs for rk, rs in rights if rk == k and rs <= s]
        return ts(max(cands)) if cands else None

    want = {(k, float(i)): brute(k, s) for i, (k, s) in enumerate(lefts)}
    assert got == want
