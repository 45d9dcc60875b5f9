"""Golden transcompile vectors from /root/reference/src/lib/transcompiler.rs:111-195."""

from beamium_spark.functions.transcompile import (
    transcompile_prometheus,
    transcompile_sensision,
)
from pyspark.sql import functions as F


def _run(spark, lines, now_us=1):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    return [r["gts"] for r in transcompile_prometheus(df, "line", now_us).collect()]


def test_skip_infinity(spark):
    assert _run(spark, ['f{job_id="123"} +Inf', 'f{job_id="123"} -Inf']) == []


def test_skip_empty(spark):
    assert _run(spark, [""]) == []


def test_skip_comment(spark):
    assert _run(spark, ["# HELP ..."]) == []


def test_skip_nan(spark):
    assert _run(spark, ['f{job_id="123"} nan', 'f{job_id="123"} NaN']) == []


def test_urlencoding_percent(spark):
    assert _run(spark, ['f{job_id="1%3"} 1']) == ["1// f{job_id=1%253} 1"]


def test_urlencoding_space(spark):
    assert _run(spark, ['f{job_id="1 3"} 1']) == ["1// f{job_id=1%203} 1"]


def test_urlencoding_plus(spark):
    assert _run(spark, ['f{job_id="1+3"} 1']) == ["1// f{job_id=1%2B3} 1"]


def test_ms_to_us_and_default_ts(spark):
    # explicit prom ts is milliseconds → ×1000 (transcompiler.rs:62-66)
    assert _run(spark, ['f{job_id="123"} 10 1484828198557'], now_us=7) == [
        "1484828198557000// f{job_id=123} 10"
    ]
    # missing ts → batch 'now' µs
    assert _run(spark, ['f{job_id="123"} 10'], now_us=7) == ["7// f{job_id=123} 10"]


def test_no_labels_metric(spark):
    assert _run(spark, ["http_requests_total 42 1000"], now_us=7) == [
        "1000000// http_requests_total{} 42"
    ]


def test_sensision_passthrough(spark):
    df = spark.createDataFrame([("  1// f{} 1  ",)], "line string")
    out = df.select(transcompile_sensision(F.col("line")).alias("g")).collect()
    assert out[0]["g"] == "1// f{} 1"
