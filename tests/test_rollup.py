"""Tier-exact oracle tests (FIXTURES.md F-4 scenario 1).

The oracle is an independent plain-SQL aggregation over the same points —
engine tiers must match point-exactly (sums are over integral doubles, so
no float-order slack is needed).
"""

from pyspark.sql import functions as F

from beamium_spark.operators.extract import extract_points
from beamium_spark.operators.rollup import (
    rollup_cascade,
    rollup_tier,
    rollup_tier_salted,
    with_avg,
)


def _points(spark, pages):
    return extract_points(pages, bucket_mode="site").cache()


def _oracle(spark, points, trunc):
    points.createOrReplaceTempView("pts")
    return spark.sql(
        f"""
        SELECT bucket, metric, date_trunc('{trunc}', ts) AS window_start,
               count(value) AS cnt, sum(value) AS sum_value,
               min(value) AS min_value, max(value) AS max_value
        FROM pts GROUP BY 1, 2, 3
        """
    )


def _assert_frames_equal(a, b):
    cols = a.columns
    assert a.count() == b.count()
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0


def test_1m_tier_exact(spark, tiny_web_pages):
    pts = _points(spark, tiny_web_pages)
    tier = rollup_tier(pts, "1 minute")
    _assert_frames_equal(tier, _oracle(spark, pts, "minute"))


def test_1h_cascade_exact(spark, tiny_web_pages):
    pts = _points(spark, tiny_web_pages)
    t1m = rollup_tier(pts, "1 minute")
    t1h = rollup_cascade(t1m, "1 hour")
    _assert_frames_equal(t1h, _oracle(spark, pts, "hour"))


def test_1d_cascade_exact(spark, tiny_web_pages):
    pts = _points(spark, tiny_web_pages)
    t1d = rollup_cascade(rollup_cascade(rollup_tier(pts, "1 minute"), "1 hour"), "1 day")
    _assert_frames_equal(t1d, _oracle(spark, pts, "day"))


def test_salted_equals_unsalted(spark, tiny_web_pages):
    pts = _points(spark, tiny_web_pages)
    plain = rollup_tier(pts, "1 minute")
    salted = rollup_tier_salted(pts, "1 minute", salt_factor=8)
    _assert_frames_equal(plain, salted)


def test_boundary_rows_land_in_new_window(spark, tiny_web_pages):
    # fixture has a page exactly at 2025-01-02T00:00:00 — must open the new
    # day/hour/minute window, not close the old one
    pts = _points(spark, tiny_web_pages).filter(
        F.col("url") == "https://site0005.example/day"
    )
    t = rollup_tier(pts, "1 day").filter(F.col("metric") == "doc_count").collect()
    assert len(t) == 1
    assert str(t[0]["window_start"]) == "2025-01-02 00:00:00"


def test_avg_derivation(spark, tiny_web_pages):
    pts = _points(spark, tiny_web_pages)
    t = with_avg(rollup_tier(pts, "1 hour"))
    bad = t.filter(F.abs(F.col("avg_value") - F.col("sum_value") / F.col("cnt")) > 1e-12)
    assert bad.count() == 0


def test_rollup_percentiles_exact_vs_approx(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import rollup_percentiles

    rows = [
        (0, "lat", dt.datetime(2025, 1, 1) + dt.timedelta(minutes=m), float(v))
        for m, v in enumerate(range(1, 101))
    ]
    pts = spark.createDataFrame(
        rows, "bucket int, metric string, ts timestamp, value double"
    )
    t = rollup_percentiles(pts, "1 hour", (0.5, 0.95)).collect()
    assert len(t) == 2  # minutes 0-59 -> hour 0; 60-99 -> hour 1
    by_ws = {str(r["window_start"]): r for r in t}
    r0 = by_ws["2025-01-01 00:00:00"]
    # values 1..60 in hour 0: p50 = 30.5 (linear interp), p95 = 57.05
    assert abs(r0["p50"] - 30.5) < 1e-9
    assert abs(r0["p95"] - 57.05) < 1e-9
    approx = rollup_percentiles(pts, "1 hour", (0.5,), exact=False).collect()
    a0 = {str(r["window_start"]): r for r in approx}["2025-01-01 00:00:00"]
    assert abs(a0["p50"] - 30.5) <= 1.0  # sketch within a value step


def test_top_urls_deterministic(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import top_urls

    rows = (
        [("https://a.example/", dt.datetime(2025, 1, 1, 0, 0))] * 3
        + [("https://b.example/", dt.datetime(2025, 1, 1, 0, 1))] * 3
        + [("https://c.example/", dt.datetime(2025, 1, 1, 0, 2))] * 1
    )
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    out = top_urls(pages, "1 hour", k=2).collect()
    assert [(r["url"], r["n"], r["rank"]) for r in out] == [
        ("https://a.example/", 3, 1),  # tie with b broken by url asc
        ("https://b.example/", 3, 2),
    ]


def test_tier_rate_counter_reset(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import tier_rate

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (0, "c", t0, 100.0),
        (0, "c", t0 + dt.timedelta(minutes=1), 150.0),
        (0, "c", t0 + dt.timedelta(minutes=2), 10.0),   # counter reset
        (0, "c", t0 + dt.timedelta(minutes=3), 40.0),
    ]
    tier = spark.createDataFrame(
        rows, "bucket int, metric string, window_start timestamp, sum_value double"
    )
    plain = {
        r["window_start"].minute: r["delta"]
        for r in tier_rate(tier, "1 minute").collect()
    }
    assert plain[0] is None and plain[1] == 50.0 and plain[2] == -140.0
    counter = {
        r["window_start"].minute: (r["delta"], r["rate_per_s"])
        for r in tier_rate(tier, "1 minute", counter=True).collect()
    }
    assert counter[1] == (50.0, 50.0 / 60)
    assert counter[2] == (10.0, 10.0 / 60)  # reset: new value IS the increase
    assert counter[3] == (30.0, 30.0 / 60)


def test_tier_moving_agg(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import tier_moving_agg

    t0 = dt.datetime(2025, 1, 1)
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), 1, float(v), float(v), float(v))
         for i, v in enumerate([10, 20, 60, 0, 10])],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    out = {
        r["window_start"].minute: (r["mov_avg"], r["mov_min"], r["mov_max"])
        for r in tier_moving_agg(tier, k=3).collect()
    }
    assert out[0] == (10.0, 10.0, 10.0)
    assert out[1] == (15.0, 10.0, 20.0)
    assert out[2] == (30.0, 10.0, 60.0)
    assert out[3] == (80.0 / 3, 0.0, 60.0)
    assert out[4] == (70.0 / 3, 0.0, 60.0)

    import pytest

    with pytest.raises(ValueError):
        tier_moving_agg(tier, k=0)
    with pytest.raises(ValueError):
        tier_moving_agg(tier, stats=("median",))


def test_tier_anomalies(spark):
    import math

    import datetime as dt

    import pytest

    from beamium_spark.operators.rollup import tier_anomalies

    t0 = dt.datetime(2025, 1, 1)
    # flat baseline of 10s, one spike of 100 at minute 6, then constant run
    vals = [10, 10, 12, 8, 10, 10, 100, 10, 10]
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), 1, float(v), float(v), float(v))
         for i, v in enumerate(vals)],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    rows = {
        r["window_start"].minute: r
        for r in tier_anomalies(tier, k=20, threshold=3.0, min_points=5).collect()
    }
    # first row: empty strictly-preceding frame
    assert rows[0]["base_n"] == 0 and rows[0]["zscore"] is None
    assert rows[0]["is_anomaly"] is False
    # rows 1-4: fewer than min_points baseline rows -> z gated off
    for m in (1, 2, 3, 4):
        assert rows[m]["zscore"] is None and rows[m]["is_anomaly"] is False
    # row 6 (the spike): baseline = first 6 values, all ~10
    base = vals[:6]
    mean = sum(base) / len(base)
    var = sum((v - mean) ** 2 for v in base) / (len(base) - 1)
    want_z = (100 - mean) / math.sqrt(var)
    assert rows[6]["base_n"] == 6
    assert rows[6]["zscore"] == pytest.approx(want_z)
    assert rows[6]["is_anomaly"] is True
    # row 7 (back to normal, spike now in baseline): huge std absorbs it
    assert rows[7]["is_anomaly"] is False
    # constant-baseline guard: all-equal history -> std 0 -> z NULL
    const = spark.createDataFrame(
        [(0, "c", t0 + dt.timedelta(minutes=i), 1, 5.0, 5.0, 5.0)
         for i in range(6)] +
        [(0, "c", t0 + dt.timedelta(minutes=6), 1, 50.0, 50.0, 50.0)],
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    last = tier_anomalies(const, min_points=5).orderBy("window_start").collect()[-1]
    assert last["base_std"] == 0.0 and last["zscore"] is None
    assert last["is_anomaly"] is False

    with pytest.raises(ValueError):
        tier_anomalies(tier, k=0)
    with pytest.raises(ValueError):
        tier_anomalies(tier, min_points=1)


def test_tier_correlations(spark):
    import datetime as dt

    import pytest

    from beamium_spark.operators.rollup import tier_correlations

    t0 = dt.datetime(2025, 1, 1)

    def rows(metric, vals):
        return [
            (0, metric, t0 + dt.timedelta(hours=i), 1, float(v), float(v), float(v))
            for i, v in enumerate(vals)
        ]

    tier = spark.createDataFrame(
        rows("a", [1, 2, 3, 4])        # rising
        + rows("b", [2, 4, 6, 8])      # = 2*a -> corr 1
        + rows("c", [4, 3, 2, 1])      # = -a -> corr -1
        + rows("flat", [5, 5, 5, 5])   # constant -> NULL corr
        + rows("short", [1, 9]),       # only 2 aligned windows -> dropped
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    out = {(r["m1"], r["m2"]): r for r in tier_correlations(tier).collect()}
    assert out[("a", "b")]["corr"] == pytest.approx(1.0)
    assert out[("a", "c")]["corr"] == pytest.approx(-1.0)
    assert out[("a", "flat")]["corr"] is None  # zero variance -> NULL, no throw
    assert out[("a", "b")]["n_windows"] == 4
    # pairs touching 'short' have only 2 aligned windows -> filtered
    assert ("a", "short") not in out and ("short", "flat") not in out
    # each unordered pair appears exactly once, m1 < m2
    assert all(m1 < m2 for (m1, m2) in out)

    with pytest.raises(ValueError):
        tier_correlations(tier, min_windows=1)


def test_rollup_histogram(spark):
    import datetime as dt

    import pytest

    from beamium_spark.operators.rollup import rollup_histogram

    t0 = dt.datetime(2025, 1, 1)
    pts = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), v)
         for i, v in enumerate([0.0, 4.9, 5.0, 12.0, -0.1, -5.0])],
        "bucket int, metric string, ts timestamp, value double",
    )
    out = {r["bin"]: r for r in rollup_histogram(pts, "1 hour", 5.0).collect()}
    assert out[0]["cnt"] == 2 and out[0]["bin_lo"] == 0.0       # 0.0, 4.9
    assert out[1]["cnt"] == 1 and out[1]["bin_lo"] == 5.0       # 5.0 (left-closed)
    assert out[2]["cnt"] == 1                                    # 12.0
    assert out[-1]["cnt"] == 2 and out[-1]["bin_lo"] == -5.0     # -0.1, -5.0
    # decomposability: re-rolling 1h bins from finer windows sums counts
    fine = rollup_histogram(pts, "1 minute", 5.0)
    assert (
        fine.groupBy("bin").sum("cnt").withColumnRenamed("sum(cnt)", "cnt")
        .orderBy("bin").collect()
        == [(b, out[b]["cnt"]) for b in sorted(out)]
    )

    with pytest.raises(ValueError):
        rollup_histogram(pts, "1 hour", 0.0)


def test_histogram_quantile(spark):
    import datetime as dt

    import pytest

    from beamium_spark.operators.rollup import histogram_quantile, rollup_histogram

    t0 = dt.datetime(2025, 1, 1)
    pts = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), float(v))
         for i, v in enumerate(range(1, 11))],  # 1..10
        "bucket int, metric string, ts timestamp, value double",
    )
    h = rollup_histogram(pts, "1 hour", 5.0)
    # bins: [0,5)->{1,2,3,4}, [5,10)->{5..9}, [10,15)->{10}; total 10
    # q=0.5 -> rank 5; crossing bin [5,10): 5 + 5*(5-4)/5 = 6.0
    got = histogram_quantile(h, 0.5, 5.0).collect()
    assert len(got) == 1 and got[0]["value"] == 6.0
    # q=1.0 -> rank 10 -> last bin upper edge: 10 + 5*(10-9)/1 = 15.0
    assert histogram_quantile(h, 1.0, 5.0).collect()[0]["value"] == 15.0
    # approximation bound: within one bin_width of the exact percentile
    exact_p50 = 5.5
    assert abs(got[0]["value"] - exact_p50) <= 5.0
    # decomposability: the same quantile from the 1d re-rolled histogram
    day = (
        h.groupBy("bucket", "metric", "bin", "bin_lo")
        .sum("cnt")
        .withColumnRenamed("sum(cnt)", "cnt")
        .withColumn("window_start", F.lit(t0))
    )
    assert histogram_quantile(day, 0.5, 5.0).collect()[0]["value"] == 6.0

    with pytest.raises(ValueError):
        histogram_quantile(h, 0.0, 5.0)
    with pytest.raises(ValueError):
        histogram_quantile(h, 0.5, -1.0)


def test_window_seconds_and_tier_rate_validation(spark):
    import pytest

    from beamium_spark.operators.rollup import window_seconds

    assert window_seconds("5 minutes") == 300
    assert window_seconds("1 minute") == 60
    assert window_seconds("2 hours") == 7200
    with pytest.raises(ValueError, match="unsupported window"):
        window_seconds("fortnight")
    with pytest.raises(ValueError, match="unsupported window"):
        window_seconds("0 minutes")


def test_percentile_column_names_round_not_truncate(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import rollup_percentiles

    pts = spark.createDataFrame(
        [(0, "m", dt.datetime(2025, 1, 1), float(v)) for v in range(100)],
        "bucket int, metric string, ts timestamp, value double",
    )
    cols = rollup_percentiles(pts, percentiles=(0.29, 0.95)).columns
    assert "p29" in cols and "p95" in cols and "p28" not in cols


def test_session_rollup(spark):
    """Session semantics (pinned empirically, mirrored by the SQL
    oracle): a point exactly at session_end (last_ts + gap) still MERGES
    — a new session needs ts − prev_ts > gap, strictly."""
    import datetime as dt

    from beamium_spark.operators.rollup import session_rollup

    t0 = dt.datetime(2025, 1, 1)
    pts = spark.createDataFrame(
        [
            (0, "m", t0, 1.0),
            (0, "m", t0 + dt.timedelta(seconds=100), 2.0),   # same session
            (0, "m", t0 + dt.timedelta(seconds=400), 4.0),   # at boundary -> merges
            (0, "m", t0 + dt.timedelta(seconds=701), 8.0),   # 301s gap -> new
            (1, "m", t0, 16.0),                              # other series
        ],
        "bucket int, metric string, ts timestamp, value double",
    )
    out = sorted(
        session_rollup(pts, gap="5 minutes").collect(),
        key=lambda r: (r["bucket"], r["session_start"]),
    )
    assert [(r["bucket"], r["cnt"], r["sum_value"]) for r in out] == [
        (0, 3, 7.0),
        (0, 1, 8.0),
        (1, 1, 16.0),
    ]
    # end = last event + gap
    assert out[0]["session_end"] == t0 + dt.timedelta(seconds=400 + 300)
    assert out[0]["session_start"] == t0


# ---- property: session_rollup == brute-force sessionizer -------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    offsets=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 3000)), min_size=1, max_size=25
    )
)
def test_session_rollup_matches_bruteforce(spark, offsets):
    import datetime as dt

    from beamium_spark.operators.rollup import session_rollup

    t0 = dt.datetime(2025, 1, 1)
    gap = 300
    pts = spark.createDataFrame(
        [(k, "m", t0 + dt.timedelta(seconds=s), 1.0) for k, s in offsets],
        "bucket int, metric string, ts timestamp, value double",
    )
    got = sorted(
        (r["bucket"], r["session_start"], r["session_end"], r["cnt"], r["sum_value"])
        for r in session_rollup(pts, gap="5 minutes").collect()
    )

    # brute force: sort per key, split when diff > gap (strict — pinned)
    want = []
    for k in {k for k, _ in offsets}:
        ss = sorted(s for kk, s in offsets if kk == k)
        runs, cur = [], [ss[0]]
        for s in ss[1:]:
            if s - cur[-1] > gap:
                runs.append(cur)
                cur = [s]
            else:
                cur.append(s)
        runs.append(cur)
        for r in runs:
            want.append(
                (k, t0 + dt.timedelta(seconds=r[0]),
                 t0 + dt.timedelta(seconds=r[-1] + gap), len(r), float(len(r)))
            )
    assert got == sorted(want)


def test_tier_binary_op(spark):
    import datetime as dt

    import pytest

    from beamium_spark.operators.rollup import rollup_tier, tier_binary_op

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = []
    # bucket 0: both metrics in windows 0 and 1; only 'a' in window 2
    for w, (av, bv) in enumerate([(10.0, 2.0), (9.0, 3.0)]):
        rows += [
            (0, "a", t0 + dt.timedelta(hours=w), av),
            (0, "b", t0 + dt.timedelta(hours=w), bv),
        ]
    rows.append((0, "a", t0 + dt.timedelta(hours=2), 7.0))
    # bucket 1: denominator sums to zero in its only aligned window
    rows += [(1, "a", t0, 5.0), (1, "b", t0, 0.0)]
    # an unrelated metric must be ignored entirely
    rows.append((0, "noise", t0, 99.0))
    pts = spark.createDataFrame(rows, ["bucket", "metric", "ts", "value"])
    tier = rollup_tier(pts, "1 hour")

    out = tier_binary_op(tier, "a", "b", "/", out_metric="r")
    got = {
        (r["bucket"], r["window_start"]): r["value"] for r in out.collect()
    }
    # inner alignment: window 2 (a only) absent; zero denominator -> NULL
    assert got == {
        (0, t0): 5.0,
        (0, t0 + dt.timedelta(hours=1)): 3.0,
        (1, t0): None,
    }
    assert out.columns == ["bucket", "metric", "window_start", "value"]
    assert out.select("metric").distinct().collect()[0][0] == "r"

    # other ops and stats
    add = tier_binary_op(tier, "a", "b", "+", stat="cnt")
    vals = {
        (r["bucket"], r["window_start"]): r["value"] for r in add.collect()
    }
    assert vals[(0, t0)] == 2.0  # cnt 1 + cnt 1

    with pytest.raises(ValueError):
        tier_binary_op(tier, "a", "a")
    with pytest.raises(ValueError):
        tier_binary_op(tier, "a", "b", "%")
    with pytest.raises(ValueError):
        tier_binary_op(tier, "a", "b", "/", stat="p95")


def test_tier_ewma_recursive_values(spark):
    """EWMA matches the hand-rolled recursion per series; first row
    equals its input; alpha validated."""
    import datetime as dt

    import pytest as _pytest

    from beamium_spark.operators.rollup import tier_ewma

    t0 = dt.datetime(2025, 1, 1)
    rows = []
    series = [("a", [1.0, 5.0, 3.0, 7.0]), ("b", [10.0, 10.0, 2.0])]
    for m, vals in series:
        for i, v in enumerate(vals):
            rows.append((0, m, t0 + dt.timedelta(minutes=i), v))
    tier = spark.createDataFrame(
        rows, "bucket int, metric string, window_start timestamp, sum_value double"
    )
    out = tier_ewma(tier, alpha=0.3)
    got = {
        (r.metric, r.window_start): (r.value, r.ewma) for r in out.collect()
    }
    for m, vals in series:
        y = vals[0]
        expect = [y]
        for x in vals[1:]:
            y = 0.3 * x + 0.7 * y
            expect.append(y)
        for i, (x, e) in enumerate(zip(vals, expect)):
            v, w = got[(m, t0 + dt.timedelta(minutes=i))]
            assert v == x
            assert abs(w - e) < 1e-12, (m, i)
    with _pytest.raises(ValueError, match="alpha"):
        tier_ewma(tier, alpha=0.0)


def test_tier_resets_and_changes(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import tier_resets

    t0 = dt.datetime(2025, 1, 1)
    vals = {"ctr": [1.0, 5.0, 9.0, 2.0, 2.0, 7.0, 3.0], "flat": [4.0, 4.0, 4.0]}
    rows = []
    for m, vs in vals.items():
        rows += [(0, m, t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vs)]
    tier = spark.createDataFrame(
        rows, "bucket int, metric string, window_start timestamp, sum_value double"
    )
    got = {r.metric: r for r in tier_resets(tier).collect()}
    # ctr: decreases at 9→2 and 7→3; changes at every step except 2→2
    assert (got["ctr"].n_points, got["ctr"].resets, got["ctr"].changes) == (7, 2, 5)
    assert (got["flat"].n_points, got["flat"].resets, got["flat"].changes) == (3, 0, 0)


def test_tier_sum_metrics(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import rollup_tier, tier_sum_metrics

    t0 = dt.datetime(2025, 1, 1)
    pts = []
    for lang, n in (("en", 3), ("de", 2)):
        pts += [(0, f"lang_rate:{lang}", t0 + dt.timedelta(seconds=i), 1.0) for i in range(n)]
    pts += [(0, "byte_size", t0, 100.0)]  # must NOT match
    tier = rollup_tier(
        spark.createDataFrame(pts, "bucket int, metric string, ts timestamp, value double"),
        "1 minute",
    )
    out = tier_sum_metrics(tier, r"lang_rate:.*", "page_rate").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.metric, r.cnt, r.sum_value, r.min_value, r.max_value) == (
        "page_rate", 5, 5.0, 1.0, 1.0
    )


def test_tier_double_ewma_matches_recursion(spark):
    import datetime as dt

    import pytest as _pytest

    from beamium_spark.operators.rollup import tier_double_ewma

    t0 = dt.datetime(2025, 1, 1)
    vals = [1.0, 4.0, 2.0, 8.0, 5.0, 9.0]
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    out = {r.window_start.minute: r for r in tier_double_ewma(tier, 0.3).collect()}
    a = 0.3
    s1, s2 = vals[0], vals[0]
    for i, x in enumerate(vals):
        if i:
            s1 = a * x + (1 - a) * s1
            s2 = a * s1 + (1 - a) * s2
        lvl = 2 * s1 - s2
        tr = a / (1 - a) * (s1 - s2)
        r = out[i]
        assert abs(r.level - lvl) < 1e-12
        assert abs(r.trend - tr) < 1e-12
        assert abs(r.forecast - (lvl + tr)) < 1e-12
    # a linear ramp's forecast converges toward the next value
    ramp = spark.createDataFrame(
        [(0, "r", t0 + dt.timedelta(minutes=i), float(i)) for i in range(60)],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    last = sorted(
        tier_double_ewma(ramp, 0.5).collect(), key=lambda r: r.window_start
    )[-1]
    assert abs(last.forecast - 60.0) < 0.2
    with _pytest.raises(ValueError, match="alpha"):
        tier_double_ewma(tier, 1.0)


def test_distinct_tier_cascade_matches_direct(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import (
        distinct_cascade,
        distinct_tier,
        with_distinct_estimate,
    )

    rows = [
        (f"https://u{i % 97}.example/", dt.datetime(2025, 1, 1, (i // 200) % 24, i % 60))
        for i in range(2000)
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    t1h = distinct_tier(pages, "1 hour")
    t1d = distinct_cascade(t1h, "1 day")
    via_cascade = {
        r.window_start: r.approx_distinct
        for r in with_distinct_estimate(t1d).collect()
    }
    direct = {
        r.window_start: r.approx_distinct
        for r in with_distinct_estimate(distinct_tier(pages, "1 day")).collect()
    }
    assert via_cascade == direct  # union of sketches ≡ sketching the union
    # estimate is within the lgk=12 error bound of the exact count (97)
    (est,) = via_cascade.values()
    assert abs(est - 97) / 97 < 0.05
    # sketch payload stays bounded
    sk = t1d.collect()[0].sk
    assert len(sk) <= (1 << 12) + 64


def test_tier_alert_rule_states_and_gaps(spark):
    import datetime as dt

    import pytest as _pytest

    from beamium_spark.operators.rollup import tier_alert_rule

    t0 = dt.datetime(2025, 1, 1)
    # minutes 0..6 contiguous, then a MISSING minute 7, then 8..10
    vals = {0: 1.0, 1: 9.0, 2: 9.0, 3: 9.0, 4: 9.0, 5: 1.0, 6: 9.0,
            8: 9.0, 9: 9.0, 10: 9.0}
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), v) for i, v in vals.items()],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    out = {
        r.window_start.minute: (r.state, r.streak)
        for r in tier_alert_rule(tier, 5.0, ">", for_windows=3).collect()
    }
    assert out[0] == ("inactive", 0)
    assert out[1] == ("pending", 1)
    assert out[2] == ("pending", 2)
    assert out[3] == ("firing", 3)
    assert out[4] == ("firing", 4)   # stays firing while condition holds
    assert out[5] == ("inactive", 0)
    assert out[6] == ("pending", 1)
    # minute 7 missing → the `for` clock RESETS across the gap
    assert out[8] == ("pending", 1)
    assert out[9] == ("pending", 2)
    assert out[10] == ("firing", 3)

    # for_windows=1 fires immediately; '<' inverts the predicate
    fast = {
        r.window_start.minute: r.state
        for r in tier_alert_rule(tier, 5.0, "<", for_windows=1).collect()
    }
    assert fast[0] == "firing" and fast[1] == "inactive" and fast[5] == "firing"

    with _pytest.raises(ValueError, match="op"):
        tier_alert_rule(tier, 5.0, "!=")
    with _pytest.raises(ValueError, match="for_windows"):
        tier_alert_rule(tier, 5.0, ">", for_windows=0)


def test_tier_alert_rule_single_exchange_plan(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import tier_alert_rule

    t0 = dt.datetime(2025, 1, 1)
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), float(i)) for i in range(5)],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    plan = tier_alert_rule(tier, 2.0)._jdf.queryExecution().executedPlan().toString()
    # every window shares the (bucket, metric) partitioning: exactly one
    # exchange in the whole alert evaluation (none keyed by island id)
    assert plan.count("Exchange") == 1, plan


def test_tier_decompose_recovers_planted_components(spark):
    import datetime as dt

    import pytest as _pytest

    from beamium_spark.operators.rollup import tier_decompose

    # t0 epoch divisible by 240s so phase == i % 4 (readable assertions)
    t0 = dt.datetime(2025, 1, 1)
    season4 = [2.0, -1.0, 0.0, -1.0]  # sums to 0 → centering is identity
    n = 16
    tier = spark.createDataFrame(
        [
            (0, "m", t0 + dt.timedelta(hours=i), float(i) + season4[i % 4])
            for i in range(n)
        ],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    rows = sorted(
        tier_decompose(tier, period=4, window="1 hour").collect(),
        key=lambda r: r.window_start,
    )
    for i, r in enumerate(rows):
        assert r.phase == i % 4
        if 2 <= i <= n - 3:  # even period 4 → h=2 edge rows have no trend
            # centered 2×P MA of (linear + zero-sum seasonal) = the line
            assert abs(r.trend - i) < 1e-9
            assert abs(r.seasonal - season4[i % 4]) < 1e-9
            assert abs(r.remainder) < 1e-9
        else:
            assert r.trend is None and r.remainder is None

    # odd period, constant trend: exact recovery
    season3 = [1.0, 0.0, -1.0]
    tier3 = spark.createDataFrame(
        [
            (0, "m", t0 + dt.timedelta(hours=i), 10.0 + season3[i % 3])
            for i in range(12)
        ],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    rows3 = sorted(
        tier_decompose(tier3, period=3, window="1 hour").collect(),
        key=lambda r: r.window_start,
    )
    for i, r in enumerate(rows3):
        if 1 <= i <= 10:
            assert abs(r.trend - 10.0) < 1e-9
            assert abs(r.seasonal - season3[i % 3]) < 1e-9
            assert abs(r.remainder) < 1e-9

    with _pytest.raises(ValueError, match="period"):
        tier_decompose(tier, period=1)


def test_alert_episodes_compaction(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import alert_episodes, tier_alert_rule

    t0 = dt.datetime(2025, 1, 1)
    # runs: m1-m4 (len 4, fires at m3), m6 (len 1, never fires),
    # m8-m9 (len 2, never fires at for_windows=3)
    vals = {0: 1.0, 1: 9.0, 2: 8.0, 3: 7.0, 4: 9.5, 5: 1.0, 6: 9.0,
            7: 1.0, 8: 9.0, 9: 9.0, 10: 1.0}
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), v) for i, v in vals.items()],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    alerts = tier_alert_rule(tier, 5.0, ">", for_windows=3)
    eps = sorted(
        alert_episodes(alerts, for_windows=3).collect(),
        key=lambda r: r.episode_start,
    )
    assert len(eps) == 3
    e1, e2, e3 = eps
    assert (e1.episode_start.minute, e1.episode_end.minute) == (1, 4)
    assert e1.fired and e1.fired_at.minute == 3 and e1.n_windows == 4
    assert e1.peak_value == 9.5
    assert (e2.episode_start.minute, e2.episode_end.minute) == (6, 6)
    assert not e2.fired and e2.fired_at is None and e2.n_windows == 1
    assert (e3.episode_start.minute, e3.episode_end.minute) == (8, 9)
    assert not e3.fired and e3.n_windows == 2


def test_tier_anomalies_robust_vs_masked_spike(spark):
    import datetime as dt

    import pytest as _pytest

    from beamium_spark.operators.rollup import tier_anomalies, tier_anomalies_robust

    t0 = dt.datetime(2025, 1, 1)
    # one huge spike at minute 6, a second (smaller but real) spike at
    # minute 9: the mean/std baseline is inflated by the first spike and
    # MASKS the second; the median/IQR baseline flags both
    vals = [10, 11, 9, 10, 11, 10, 500, 10, 9, 60, 10, 11]
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(vals)],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    robust = {
        r.window_start.minute: r
        for r in tier_anomalies_robust(tier, k=8, threshold=3.0, min_points=5).collect()
    }
    classic = {
        r.window_start.minute: r
        for r in tier_anomalies(tier, k=8, threshold=3.0, min_points=5).collect()
    }
    assert robust[6].is_anomaly and classic[6].is_anomaly     # both see 500
    assert robust[9].is_anomaly                               # robust sees 60
    assert not classic[9].is_anomaly                          # std inflated by 500
    # gating: NULL below min_points, constant-IQR guard
    assert robust[0].robust_z is None and not robust[0].is_anomaly
    flat = spark.createDataFrame(
        [(0, "f", t0 + dt.timedelta(minutes=i), 5.0) for i in range(8)],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    fr = tier_anomalies_robust(flat, k=6, min_points=3).collect()
    assert all(r.robust_z is None and not r.is_anomaly for r in fr)

    with _pytest.raises(ValueError, match="k must"):
        tier_anomalies_robust(tier, k=0)
    with _pytest.raises(ValueError, match="min_points"):
        tier_anomalies_robust(tier, min_points=1)


def test_tier_moving_percentile(spark):
    import datetime as dt

    import pytest as _pytest

    from beamium_spark.operators.rollup import tier_moving_agg

    t0 = dt.datetime(2025, 1, 1)
    vals = [10.0, 20.0, 60.0, 0.0, 10.0, 30.0]
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    out = {
        r.window_start.minute: (r.mov_p50, r.mov_p100)
        for r in tier_moving_agg(tier, k=3, stats=("p50", "p100")).collect()
    }
    import statistics

    for i in range(len(vals)):
        frame = vals[max(0, i - 2): i + 1]
        assert abs(out[i][0] - statistics.median(frame)) < 1e-12, i
        assert out[i][1] == max(frame)
    with _pytest.raises(ValueError, match="unsupported moving stats"):
        tier_moving_agg(tier, stats=("p105x",))


def test_tier_level_shift_detects_regime_change(spark):
    import datetime as dt

    import pytest as _pytest

    from beamium_spark.operators.rollup import tier_level_shift

    t0 = dt.datetime(2025, 1, 1)
    # regime change at minute 8: 10±1 -> 50±1; plus one lone spike at
    # minute 3 that must NOT read as a shift
    vals = [10, 11, 9, 100, 10, 11, 9, 10, 50, 51, 49, 50, 51, 49, 50, 50]
    tier = spark.createDataFrame(
        [(0, "m", t0 + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(vals)],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    out = {
        r.window_start.minute: r
        for r in tier_level_shift(tier, k=4, threshold=3.0).collect()
    }
    assert out[8].is_shift and out[8].shift_score > 3.0       # boundary row
    assert out[8].before_avg == 10.0 and out[8].after_avg == 50.0
    # edges with incomplete frames stay NULL
    assert out[0].shift_score is None and out[15].shift_score is None
    # the lone spike inflates variance but no sustained shift flags at
    # stable rows far from both the spike and the regime boundary
    assert not out[5].is_shift

    with _pytest.raises(ValueError, match="k must"):
        tier_level_shift(tier, k=1)


def test_tier_increase_counter_windows(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import tier_increase

    t0 = dt.datetime(2025, 1, 1)
    # counter climbs 100->150, resets to 10, climbs to 40 in hour 0;
    # hour 1 climbs 40->90
    rows = [(0, 100.0), (10, 150.0), (20, 10.0), (30, 40.0), (70, 90.0)]
    tier = spark.createDataFrame(
        [(0, "c", t0 + dt.timedelta(minutes=m), v) for m, v in rows],
        "bucket int, metric string, window_start timestamp, sum_value double",
    )
    out = {
        r.window_start.hour: r for r in tier_increase(tier, "1 hour").collect()
    }
    # hour 0: deltas 50, reset->10, 30 => 90 with one reset, 3 deltas
    assert (out[0].increase, out[0].n_resets, out[0].n_deltas) == (90.0, 1, 3)
    # hour 1: one delta of 50
    assert (out[1].increase, out[1].n_resets, out[1].n_deltas) == (50.0, 0, 1)
    # net mode: the reset contributes its raw negative delta
    net = {r.window_start.hour: r.increase
           for r in tier_increase(tier, "1 hour", counter=False).collect()}
    assert net[0] == 50.0 - 140.0 + 30.0


def test_tier_daily_profile(spark):
    import datetime as dt

    from beamium_spark.operators.rollup import tier_daily_profile

    t0 = dt.datetime(2025, 1, 1)
    rows = []
    for day in range(3):
        rows += [(0, "m", t0 + dt.timedelta(days=day, hours=9), 10.0 + day),
                 (0, "m", t0 + dt.timedelta(days=day, hours=21), 50.0 + day)]
    tier = spark.createDataFrame(
        rows, "bucket int, metric string, window_start timestamp, sum_value double"
    )
    prof = {r.hour_of_day: r for r in tier_daily_profile(tier).collect()}
    assert set(prof) == {9, 21}
    assert prof[9].avg_value == 11.0 and prof[9].n == 3
    assert (prof[21].min_value, prof[21].max_value) == (50.0, 52.0)


def test_window_start_matches_f_window(spark):
    """The r6 window_start() rewrite must be bit-identical to
    F.window(...).start — including pre-epoch timestamps (pmod arm) and
    non-calendar widths — and must drop null timestamps exactly like
    F.window's implicit filter when paired with isnotnull."""
    import datetime as dt

    from beamium_spark.operators.rollup import window_start

    rows = [
        (dt.datetime(2025, 1, 1, 0, 0, 0),),
        (dt.datetime(2025, 3, 7, 13, 59, 59, 999999),),
        (dt.datetime(2025, 3, 7, 14, 0, 0),),
        (dt.datetime(1969, 12, 31, 23, 58, 30),),  # pre-epoch
        (dt.datetime(1970, 1, 1, 0, 0, 1),),
        (None,),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    for w in ("1 minute", "5 minutes", "1 hour", "1 day", "90 seconds"):
        got = (
            df.where(F.col("ts").isNotNull())
            .select(window_start("ts", w).alias("s"))
            .collect()
        )
        want = df.select(F.window("ts", w).start.alias("s")).collect()
        # F.window's rewrite drops null-ts rows; ours via the explicit filter
        assert [r.s for r in got] == [r.s for r in want if r.s is not None]


def test_rollup_tier_drops_null_ts_like_f_window(spark):
    import datetime as dt

    rows = [
        (0, "m", dt.datetime(2025, 1, 1, 0, 0, 10), 1.0),
        (0, "m", None, 100.0),  # must not form a null-window group
        (0, "m", dt.datetime(2025, 1, 1, 0, 0, 50), 3.0),
    ]
    pts = spark.createDataFrame(rows, "bucket int, metric string, ts timestamp, value double")
    out = rollup_tier(pts, "1 minute").collect()
    assert len(out) == 1
    assert out[0].cnt == 2 and out[0].sum_value == 4.0
