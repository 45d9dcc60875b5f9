"""Extraction stage: ``web_pages`` → ``points``.

The engine's analogue of beamium's scrape+transcompile pass
(/root/reference/src/scraper.rs:184-219): one input page fans out to a
fixed set of metric datapoints, each carrying the series identity
(bucket, metric, labels) and a numeric value.

Emitted metrics per page (FIXTURES.md F-2):

- ``doc_count``   = 1.0
- ``byte_size``   = length(html) in bytes
- ``text_chars``  = length(text) in characters
- ``lang_rate:<lang>`` = 1.0   (per-lang occurrence; window sums are rates)

All of it is Catalyst-native (explode over a literal array of structs —
whole-stage codegen, no Python). The malformed-row guard mirrors the
comment/blank filter (scraper.rs:200-202) and the non-finite filter
(transcompiler.rs:57-60).

Scale notes: the explode is a narrow map-side op (4× rows, no shuffle);
column pruning means a plan that only needs ``byte_size`` reads just the
``html`` column lengths. ``bucket`` is the explicit partition key used by
every downstream shuffle (north_rule: partitioning explicit on
(bucket, chunk)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 64

METRICS = ("doc_count", "byte_size", "text_chars", "lang_rate")


def bucket_expr(url: Column, n_buckets: int = N_BUCKETS, mode: str = "hash") -> Column:
    """url → stable bucket id.

    ``hash``  — xxhash64, the production path for arbitrary urls.
    ``site``  — parse the site id out of the synthetic url; used where an
                external oracle (DuckDB) must compute the identical bucket,
                since xxhash64 seeds differ across engines.
    """
    if mode == "hash":
        return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")
    if mode == "site":
        return (
            F.regexp_extract(url, r"site(\d+)", 1).cast("int") % n_buckets
        ).cast("int")
    raise ValueError(f"unknown bucket mode: {mode}")


def extract_points(
    pages: DataFrame,
    n_buckets: int = N_BUCKETS,
    bucket_mode: str = "hash",
    static_labels: dict[str, str] | None = None,
    drop_label_keys: list[str] | None = None,
    metric_whitelist: str | None = None,
    metrics: tuple[str, ...] = METRICS,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → points(bucket, metric,
    labels, ts, value, url, lang).

    ``static_labels`` / ``drop_label_keys`` are the engine's relabeling
    hooks (beamium P3/P4, src/lib/mod.rs:26-101); ``metric_whitelist`` is
    an rlike pattern, the analogue of the scraper ``metrics`` RegexSet
    (src/scraper.rs:204-208). ``metrics`` selects which metric families are
    *built at all* — dropping one here prunes its source column out of the
    parquet scan entirely (a post-hoc filter can't).

    Plan shape matters at scale: wide columns (html/text) are reduced to
    scalar lengths in a Project **before** the explode, so the Generate
    only ever fans out slim rows — carrying multi-KiB binaries through a
    4× row expansion measured ~11× slower on the sandbox.
    """
    from beamium_spark.functions.labels import add_labels, remove_labels

    # malformed-row guard (F1) + slim projection
    slim = pages.filter(
        F.col("url").isNotNull() & F.col("warc_ts").isNotNull()
    ).select(
        bucket_expr(F.col("url"), n_buckets, bucket_mode).alias("bucket"),
        F.col("warc_ts").alias("ts"),
        *(
            [F.coalesce(F.length("html"), F.lit(0)).cast("double").alias("__hlen")]
            if "byte_size" in metrics
            else []
        ),
        *(
            [F.coalesce(F.length("text"), F.lit(0)).cast("double").alias("__tlen")]
            if "text_chars" in metrics
            else []
        ),
        F.coalesce(F.col("lang"), F.lit("unknown")).alias("lang"),
        "url",
    )

    structs = []
    if "doc_count" in metrics:
        structs.append(
            F.struct(F.lit("doc_count").alias("metric"), F.lit(1.0).alias("value"))
        )
    if "byte_size" in metrics:
        structs.append(
            F.struct(F.lit("byte_size").alias("metric"), F.col("__hlen").alias("value"))
        )
    if "text_chars" in metrics:
        structs.append(
            F.struct(F.lit("text_chars").alias("metric"), F.col("__tlen").alias("value"))
        )
    if "lang_rate" in metrics:
        structs.append(
            F.struct(
                F.concat(F.lit("lang_rate:"), F.col("lang")).alias("metric"),
                F.lit(1.0).alias("value"),
            )
        )

    points = (
        slim.withColumn("__pt", F.explode(F.array(*structs)))
        .select(
            "bucket",
            F.col("__pt.metric").alias("metric"),
            F.create_map(F.lit("lang"), F.col("lang")).alias("labels"),
            "ts",
            F.col("__pt.value").alias("value"),
            "url",
            "lang",
        )
        # non-finite guard (F2, transcompiler.rs:57-60)
        .filter(~F.isnan("value") & ~F.col("value").isin(float("inf"), float("-inf")))
    )
    if metric_whitelist:
        points = points.filter(F.col("metric").rlike(metric_whitelist))
    if static_labels:
        points = points.withColumn("labels", add_labels(F.col("labels"), static_labels))
    if drop_label_keys:
        points = points.withColumn("labels", remove_labels(F.col("labels"), drop_label_keys))
    return points


def text_invariant_violations(pages: DataFrame) -> DataFrame:
    """Rows violating the end-to-end invariant: extracted ``text`` must be
    byte-identical for every appearance of a url (BASELINE.json input_hint).

    Also re-derives text from html (payload between the <html><body> /
    </body></html> wrappers) and flags mismatches.
    """
    per_url = (
        pages.groupBy("url")
        .agg(F.countDistinct(F.sha2(F.col("text"), 256)).alias("n_variants"))
        .filter(F.col("n_variants") > 1)
        .select("url", F.lit("text_varies_across_recrawls").alias("violation"))
    )
    rederive = (
        pages.filter(F.length("html") > 0)
        .filter(
            F.decode(
                F.substring(F.col("html"), 13, F.greatest(F.length("html") - 26, F.lit(0))),
                "UTF-8",
            )
            != F.col("text")
        )
        .select("url", F.lit("extraction_mismatch").alias("violation"))
    )
    return per_url.unionByName(rederive)
