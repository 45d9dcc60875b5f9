"""Golden label-algebra vectors ported from /root/reference/src/lib/mod.rs:103-173.

The reference mutates GTS line strings; the engine keeps labels as a map
column — each vector parses the line, applies the map op, reformats, and
must reproduce the reference's expected line byte-for-byte.
"""

from pyspark.sql import functions as F

from beamium_spark.functions.labels import (
    add_labels,
    format_gts_line,
    parse_gts_line,
    remove_labels,
)


def _roundtrip(spark, line, op):
    df = spark.createDataFrame([(line,)], "line string")
    p = parse_gts_line(F.col("line"))
    df = df.select(p.alias("p"))
    labels = op(F.col("p.labels"))
    out = df.select(
        format_gts_line(F.col("p.ts_us"), F.col("p.cls"), labels, F.col("p.value")).alias("out")
    )
    return out.collect()[0]["out"]


# remove_labels vectors (src/lib/mod.rs:107-148)

def test_no_labels_at_all(spark):
    line = "1484828198557102// f{} 10"
    got = _roundtrip(spark, line, lambda l: remove_labels(l, ["job_name", "another_id"]))
    assert got == line


def test_remove_no_labels(spark):
    line = "1484828198557102// f{job_id=123,job_name=job1,another_id=456} 10"
    got = _roundtrip(spark, line, lambda l: remove_labels(l, []))
    assert got == line


def test_remove_one_label(spark):
    line = "1484828198557102// f{job_id=123,job_name=job1,another_id=456} 10"
    got = _roundtrip(spark, line, lambda l: remove_labels(l, ["job_name"]))
    assert got == "1484828198557102// f{job_id=123,another_id=456} 10"


def test_remove_multiple_labels(spark):
    line = "1484828198557102// f{job_id=123,job_name=job1,another_id=456} 10"
    got = _roundtrip(spark, line, lambda l: remove_labels(l, ["job_name", "another_id"]))
    assert got == "1484828198557102// f{job_id=123} 10"


# add_labels vectors (src/lib/mod.rs:150-172) — note prepend ordering

def test_add_one_label(spark):
    line = "1562656816000000// f{type=count} 1486"
    got = _roundtrip(spark, line, lambda l: add_labels(l, {"host": "foo"}))
    assert got == "1562656816000000// f{host=foo,type=count} 1486"


def test_add_multiple_labels(spark):
    line = "1562656816000000// f{type=count} 1486"
    got = _roundtrip(spark, line, lambda l: add_labels(l, {"host": "foo", "rack": "toto"}))
    assert got == "1562656816000000// f{host=foo,rack=toto,type=count} 1486"


def test_add_empty_is_noop(spark):
    line = "1562656816000000// f{type=count} 1486"
    got = _roundtrip(spark, line, lambda l: add_labels(l, {}))
    assert got == line


def test_add_existing_key_keeps_old_value(spark):
    # reference prepends without dedup and downstream parses left-to-right;
    # map semantics: pre-existing value wins
    line = "1562656816000000// f{type=count} 1486"
    got = _roundtrip(spark, line, lambda l: add_labels(l, {"type": "gauge"}))
    assert got == line
