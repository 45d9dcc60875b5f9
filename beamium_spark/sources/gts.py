"""GTS text-format source/sink: read and write beamium's native dialect.

Beamium's on-disk interchange is newline-delimited GTS lines in
``.metrics`` files (``ts// class{k=v,...} value``; written
/root/reference/src/scraper.rs:256, read src/router.rs:135-146). A user
switching from the reference can point these functions at the same files:

- ``read_gts``        — text scan → typed points (ts, metric, labels, value)
- ``write_gts``       — points → GTS text files (atomic: Spark task commit
                        protocol plays the reference's .tmp→rename,
                        src/scraper.rs:249-265)
- ``read_prometheus`` — Prometheus exposition text → points via the
                        transcompiler (the scrape-body path, S1/P1)

Filters applied on read mirror the scraper: comment/blank skip (F1),
non-finite drop (F2), optional metric whitelist (F3), selector (F4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beamium_spark.functions.labels import format_gts_line, parse_gts_line
from beamium_spark.functions.transcompile import parse_prometheus


def read_gts(
    spark: SparkSession,
    path: str,
    metric_whitelist: str | None = None,
    selector: str | None = None,
) -> DataFrame:
    """GTS text files → (ts timestamp, metric, labels map, value double).

    ``selector`` is the sink-selector anchored regex on the class name
    (reference anchors with ^, src/conf.rs:329-336, applied
    src/router.rs:181-196)."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    lines = lines.filter(
        (F.trim("line") != "") & ~F.trim(F.col("line")).startswith("#")
    )
    p = parse_gts_line(F.trim(F.col("line")))
    out = (
        lines.select(p.alias("p"))
        .select(
            F.timestamp_micros(F.col("p.ts_us")).alias("ts"),
            F.col("p.cls").alias("metric"),
            F.col("p.labels").alias("labels"),
            F.col("p.value").try_cast("double").alias("value"),
        )
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
    )
    if metric_whitelist:
        out = out.filter(F.col("metric").rlike(metric_whitelist))
    if selector:
        sel = selector if selector.startswith("^") else "^" + selector
        out = out.filter(F.col("metric").rlike(sel))
    return out


def write_gts(points: DataFrame, path: str, mode: str = "overwrite") -> None:
    """points (ts, metric, labels, value) → newline-delimited GTS text.
    One file per partition — the analogue of beamium's per-batch .metrics
    files; Spark's task-commit temp→rename is the atomicity story."""
    line = format_gts_line(
        F.unix_micros(F.col("ts")),
        F.col("metric"),
        F.coalesce(
            F.col("labels"), F.map_from_arrays(F.array(), F.array())
        ),
        F.col("value"),
    )
    points.select(line.alias("value")).write.mode(mode).text(path)


def read_prometheus(
    spark: SparkSession, path: str, now_us: int, metric_whitelist: str | None = None
) -> DataFrame:
    """Prometheus exposition text files → typed points (the scrape path:
    fetch body → transcompile → filter, src/scraper.rs:184-219)."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    cols = parse_prometheus(lines, "line", now_us)
    out = cols.select(
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        F.col("cls").alias("metric"),
        "labels",
        F.col("value").try_cast("double").alias("value"),
    ).filter(F.col("value").isNotNull() & ~F.isnan("value"))
    if metric_whitelist:
        out = out.filter(F.col("metric").rlike(metric_whitelist))
    return out
