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


# ---- range-chunked windowing (hot-key skew path) ---------------------------


def test_asof_chunked_equals_monolithic(spark):
    """chunk='1 minute' must be bit-identical to the default window form
    on every deterministic scenario, including tolerance."""
    left, right = _frames(spark)
    for tol in (None, 60):
        a = asof_join(left, right, tolerance_seconds=tol).orderBy("bucket", "ts")
        b = asof_join(
            left, right, tolerance_seconds=tol, chunk="1 minute"
        ).orderBy("bucket", "ts")
        assert a.collect() == b.collect()


def test_asof_chunked_carry_crosses_empty_chunks(spark):
    """A right row many chunks back must carry across chunks that contain
    neither left nor right rows for that key."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    left = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(hours=5), 1.0)],
        "bucket int, metric string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(0, "m", t0, 7, 70.0, 1.0, 9.0)],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    row = asof_join(left, right, chunk="1 minute").collect()[0]
    assert row["asof_cnt"] == 7 and row["asof_window_start"] == t0


def test_asof_hot_key_is_sharded(spark):
    """One series holding 90% of all rows: the chunked form must bound
    per-task work by (key, chunk) — no single window partition ever holds
    the hot series' whole history — while returning exactly the
    monolithic answer."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    n_hot, n_cold = 1800, 200  # hot key = 90% of left rows
    rows = [(0, "hot", t0 + dt.timedelta(seconds=2 * i), float(i)) for i in range(n_hot)]
    rows += [(1, "cold", t0 + dt.timedelta(seconds=17 * i), float(i)) for i in range(n_cold)]
    left = spark.createDataFrame(
        rows, "bucket int, metric string, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [
            (b, m, t0 + dt.timedelta(minutes=10 * j), j, float(j), 0.0, 0.0)
            for b, m in [(0, "hot"), (1, "cold")]
            for j in range(6)
        ],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    chunk = "5 minutes"
    a = asof_join(left, right, chunk=None).orderBy("bucket", "ts").collect()
    b = asof_join(left, right, chunk=chunk).orderBy("bucket", "ts").collect()
    assert a == b
    # partition-size check: the largest (key, chunk) window group is a
    # fraction of the hot series — the straggler bound the operator claims
    step = 300
    sizes = (
        left.groupBy(
            "bucket", "metric",
            (F.floor(F.unix_timestamp("ts") / step)).alias("c"),
        )
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert sizes <= step // 2 + 1  # 2s cadence -> ≤151 rows per chunk-task
    assert sizes < n_hot / 5  # far below the monolithic hot partition


def test_interval_join_matches_inequality_oracle(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from beamium_spark.operators.asof import interval_join

    t0 = dt.datetime(2025, 1, 1)
    pts = spark.createDataFrame(
        [(k, t0 + dt.timedelta(minutes=m), float(m))
         for k in ("a", "b") for m in range(0, 600, 7)],
        "k string, ts timestamp, v double",
    )
    # overlapping, multi-bucket, and sub-bucket intervals per key
    iv = spark.createDataFrame(
        [
            ("a", 1, t0 + dt.timedelta(minutes=10), t0 + dt.timedelta(minutes=40)),
            ("a", 2, t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(minutes=300)),
            ("a", 3, t0 + dt.timedelta(minutes=35), t0 + dt.timedelta(minutes=36)),
            ("b", 4, t0 + dt.timedelta(minutes=100), t0 + dt.timedelta(minutes=130)),
        ],
        "k string, iv_id int, start timestamp, end timestamp",
    )
    for bucket in ("1 hour", "10 minutes", "1 day"):
        got = sorted(
            (r.k, r.ts, r.interval.iv_id)
            for r in interval_join(pts, iv, on=("k",), bucket=bucket).collect()
        )
        exp = sorted(
            (r.k, r.ts, r.iv_id)
            for r in pts.join(iv, "k")
            .filter((F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end")))
            .collect()
        )
        assert got == exp, bucket
    # boundary semantics: start inclusive, end exclusive
    edge = spark.createDataFrame(
        [("a", t0 + dt.timedelta(minutes=10), 0.0),
         ("a", t0 + dt.timedelta(minutes=40), 0.0)],
        "k string, ts timestamp, v double",
    )
    hits = interval_join(edge, iv, on=("k",)).select("ts", "interval.iv_id").collect()
    pairs = {(r.ts.minute, r.iv_id) for r in hits}
    assert (10, 1) in pairs and (40, 1) not in pairs

    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        interval_join(pts, iv, on=("k",), bucket="nonsense")


def test_interval_join_plans_as_equi_join(spark):
    import datetime as dt

    from beamium_spark.operators.asof import interval_join

    t0 = dt.datetime(2025, 1, 1)
    pts = spark.createDataFrame(
        [("a", t0, 1.0)], "k string, ts timestamp, v double"
    )
    iv = spark.createDataFrame(
        [("a", 1, t0, t0 + dt.timedelta(hours=1))],
        "k string, iv_id int, start timestamp, end timestamp",
    )
    plan = (
        interval_join(pts, iv, on=("k",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the whole point: containment joins as a hash/merge EQUI-join on
    # (key, bucket), never a nested-loop/cartesian range probe
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_inverted_interval_dropped_without_fanout(spark):
    """r6 guard: an interval with end <= start must contribute ZERO rows —
    and must be dropped BEFORE the bucket explode (sequence() auto-steps
    descending, so a far-inverted interval used to fan out into span/width
    spurious candidates that only the post-filter removed)."""
    import datetime as dt

    from beamium_spark.operators.asof import interval_join

    t0 = dt.datetime(2025, 1, 1)
    pts = spark.createDataFrame(
        [("a", t0 + dt.timedelta(minutes=m), float(m)) for m in range(60)],
        "k string, ts timestamp, v double",
    )
    iv = spark.createDataFrame(
        [
            ("a", 1, t0 + dt.timedelta(minutes=10), t0 + dt.timedelta(minutes=20)),
            # inverted by ~2 years: would be ~17k spurious hour buckets pre-guard
            ("a", 2, t0, t0 - dt.timedelta(days=700)),
            # empty (end == start)
            ("a", 3, t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(minutes=30)),
        ],
        "k string, iv_id int, start timestamp, end timestamp",
    )
    got = interval_join(pts, iv, on=("k",), bucket="1 hour")
    ids = sorted({r.interval.iv_id for r in got.collect()})
    assert ids == [1]
    # the guard filters intervals upstream of the explode: the exploded
    # interval side must hold exactly the valid interval's bucket rows
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "sequence" in plan.lower()
