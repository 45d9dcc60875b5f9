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
