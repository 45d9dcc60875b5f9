"""Gap-fill semantics (FIXTURES.md F-4 scenario 2: the forced 17-minute
silence of site 3 must surface as filled rows in the dense 1m tier)."""

from pyspark.sql import functions as F

from beamium_spark.operators.extract import extract_points
from beamium_spark.operators.gapfill import gapfill
from beamium_spark.operators.rollup import rollup_tier
from beamium_spark.sources.synth import BASE_TS_US


def _site3_1m(spark, pages):
    pts = extract_points(pages, bucket_mode="site").filter(
        F.col("url").startswith("https://site0003.") & (F.col("metric") == "doc_count")
    )
    return rollup_tier(pts, "1 minute")


def test_zero_fill_dense_and_flagged(spark, tiny_web_pages):
    tier = _site3_1m(spark, tiny_web_pages)
    dense = gapfill(tier, "1 minute", strategy="zero").cache()
    # dense: one row per minute between series min and max
    bounds = dense.agg(
        F.min("window_start").alias("mn"), F.max("window_start").alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    expected = int((bounds["mx"] - bounds["mn"]).total_seconds()) // 60 + 1
    assert bounds["n"] == expected
    # the forced gap minutes exist, are flagged, and are zero
    gap_start = (BASE_TS_US + 2 * 3600 * 1000000) // 1000000
    in_gap = dense.filter(
        (F.unix_timestamp("window_start") >= gap_start)
        & (F.unix_timestamp("window_start") < gap_start + 17 * 60)
    )
    n_gap = in_gap.count()
    assert n_gap == 17
    assert in_gap.filter(~F.col("filled")).count() == 0
    assert in_gap.filter((F.col("cnt") != 0) | (F.col("sum_value") != 0.0)).count() == 0


def test_ffill_carries_last_tuple(spark, tiny_web_pages):
    tier = _site3_1m(spark, tiny_web_pages)
    dense = gapfill(tier, "1 minute", strategy="ffill").cache()
    assert dense.filter(F.col("cnt").isNull()).count() == 0
    # a filled row equals the most recent observed row before it
    gap_start = (BASE_TS_US + 2 * 3600 * 1000000) // 1000000
    filled_row = (
        dense.filter(F.col("filled") & (F.unix_timestamp("window_start") >= gap_start))
        .orderBy("window_start")
        .first()
    )
    prev = (
        tier.filter(F.col("window_start") < filled_row["window_start"])
        .orderBy(F.desc("window_start"))
        .first()
    )
    assert filled_row["cnt"] == prev["cnt"]
    assert filled_row["sum_value"] == prev["sum_value"]


def test_global_bounds(spark, tiny_web_pages):
    tier = _site3_1m(spark, tiny_web_pages)
    dense = gapfill(
        tier, "1 hour", strategy="zero",
        bounds=("2025-01-01 00:00:00", "2025-01-01 10:00:00"),
    )
    assert dense.count() == 11  # inclusive grid


def test_gapfill_linear_interpolates(spark):
    import datetime as dt

    from beamium_spark.operators.gapfill import gapfill

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (0, "m", t0, 1, 10.0, 10.0, 10.0),
        # minutes 1, 2 missing
        (0, "m", t0 + dt.timedelta(minutes=3), 1, 40.0, 40.0, 40.0),
    ]
    tier = spark.createDataFrame(
        rows,
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    out = {
        r["window_start"].minute: (r["sum_value"], r["cnt"], r["filled"])
        for r in gapfill(tier, "1 minute", strategy="linear").collect()
    }
    assert out[0] == (10.0, 1, False)
    assert out[1] == (20.0, 0, True)
    assert out[2] == (30.0, 0, True)
    assert out[3] == (40.0, 1, False)


def test_gapfill_linear_edges_clamp_with_explicit_bounds(spark):
    """Explicit bounds wider than the observed span (query(fill='linear')
    passes these): edge rows lack one bracketing observation and must
    clamp to the nearest observed value, never yield NULL sum_value."""
    import datetime as dt

    from beamium_spark.operators.gapfill import gapfill

    t0 = dt.datetime(2025, 1, 1, 0, 2)
    rows = [
        (0, "m", t0, 1, 10.0, 10.0, 10.0),
        (0, "m", t0 + dt.timedelta(minutes=2), 1, 30.0, 30.0, 30.0),
    ]
    tier = spark.createDataFrame(
        rows,
        "bucket int, metric string, window_start timestamp, cnt long, "
        "sum_value double, min_value double, max_value double",
    )
    out = {
        r["window_start"].minute: (r["sum_value"], r["filled"])
        for r in gapfill(
            tier, "1 minute", strategy="linear",
            bounds=("2025-01-01 00:00:00", "2025-01-01 00:06:00"),
        ).collect()
    }
    # before-first rows clamp to the first observed value
    assert out[0] == (10.0, True)
    assert out[1] == (10.0, True)
    # interior lerp unchanged
    assert out[2] == (10.0, False)
    assert out[3] == (20.0, True)
    assert out[4] == (30.0, False)
    # after-last rows clamp to the last observed value
    assert out[5] == (30.0, True)
    assert out[6] == (30.0, True)
