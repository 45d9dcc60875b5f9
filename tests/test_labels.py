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


def test_gts_line_roundtrip_fuzz(spark):
    """format_gts_line ∘ parse_gts_line is identity over the on-wire
    domain: percent-encoded classes/keys/values (the transcompiler
    guarantees ',' '=' '{' '}' never appear raw — reference encodes with
    urlencoding::encode, src/lib/transcompiler.rs:71,87), µs timestamps,
    float values. 500 seeded random lines in one DataFrame pass."""
    import random

    from pyspark.sql import functions as F

    from beamium_spark.functions.labels import format_gts_line, parse_gts_line

    rng = random.Random(7)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~"
    )

    def tok(lo=1, hi=12):
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(lo, hi))
        ) + ("%20" if rng.random() < 0.3 else "")

    rows = []
    for i in range(500):
        labels = {tok(): tok(0, 8) for _ in range(rng.randrange(0, 4))}
        rows.append(
            (
                rng.randrange(0, 2**52),
                tok(),
                labels,
                round(rng.uniform(-1e6, 1e6), 6),
            )
        )
    df = spark.createDataFrame(
        rows, "ts_us long, cls string, labels map<string,string>, value double"
    )
    line = format_gts_line(F.col("ts_us"), F.col("cls"), F.col("labels"), F.col("value"))
    back = df.select(F.col("ts_us").alias("o_ts"), F.col("cls").alias("o_cls"),
                     F.col("labels").alias("o_labels"), F.col("value").alias("o_value"),
                     parse_gts_line(line).alias("p"))
    bad = back.filter(
        (F.col("p.ts_us") != F.col("o_ts"))
        | (F.col("p.cls") != F.col("o_cls"))
        | (F.col("p.value").cast("double") != F.col("o_value"))
        | (F.map_entries("p.labels") != F.map_entries("o_labels"))
    )
    assert bad.count() == 0
