"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name: sec},
"sf", plus docs/sec and parallelism context}.

Scaling evidence (north_rule N vs 4N): run ``python bench.py`` twice with
``SPARK_GRAFT_CPUS=8`` and ``=32`` (fresh process each — one JVM per
parallelism level); ``scripts/scaling_bench.py`` automates that and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from beamium_spark.operators.blocks import encode_blocks
    from beamium_spark.operators.extract import extract_points
    from beamium_spark.operators.gapfill import gapfill
    from beamium_spark.operators.rollup import rollup_cascade, rollup_tier
    from beamium_spark.session import get_spark
    from pyspark.sql import functions as F

    sf = entrymod._sf_of(sf_dir)
    spark = get_spark(
        app_name="beamium_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    pages_path = entrymod._fixture(sf)
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()

    timings: dict[str, float] = {}
    runs = int(os.environ.get("BEAMIUM_BENCH_RUNS", "3"))

    def timed(name, fn):
        # median of N runs: the microVM shows multi-second jitter on large
        # binary scans, medians keep the scaling comparison honest
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)

    # warm-up: JVM/codegen + page-cache priming, not timed
    extract_points(pages, bucket_mode="site").filter(
        F.col("metric") == "doc_count"
    ).groupBy("bucket").count().count()

    def _points():
        return extract_points(pages, bucket_mode="site")

    # headline 1: the full tier cascade (raw scan + 3 windowed aggs)
    def q_tier_cascade():
        t1m = rollup_tier(_points(), "1 minute")
        t1d = rollup_cascade(rollup_cascade(t1m, "1 hour"), "1 day")
        t1d.count()

    # headline 2: dense 1m tier (rollup + grid join). Only the doc_count
    # family is built (scan prunes html/text), and the tier is cached —
    # gapfill's bounds pass + join would otherwise recompute the whole
    # upstream twice (production gap-fills the STORED tier, one tiny scan)
    def q_gapfill():
        t = rollup_tier(
            extract_points(pages, bucket_mode="site", metrics=("doc_count",)),
            "1 minute",
        ).cache()
        try:
            gapfill(t, "1 minute", strategy="zero").count()
        finally:
            t.unpersist()

    # headline 3: Gorilla block encode (Arrow/pandas UDF path)
    def q_block_encode():
        encode_blocks(
            _points().select("bucket", "metric", "ts", "value"), "1 hour"
        ).agg(F.sum("n_points")).collect()

    # headline 4: events table rollup (driver-provided testdata)
    def q_events_rollup():
        entrymod._q_events_rollup_1m(spark, sf_dir).count()

    # headline 5: pure-engine scaling workload — N synthetic points through
    # the full tier cascade, no disk I/O: isolates the engine's parallel
    # aggregation path from the sandbox's shared-bandwidth scan ceiling.
    n_points = int(os.environ.get("BEAMIUM_BENCH_POINTS", "300000000"))

    # time-contiguous layout (ts = id // pps): scrape data arrives
    # batch-clustered — the job's work unit is an hour chunk and the
    # fixture is written time-sorted — so each task aggregates the few
    # windows its id-range covers (cache-resident partials). The fully
    # scattered layout ((id*37) mod span, the round-1 form) forces every
    # task to hold the whole ~1.1M-window hash table and benchmarks the
    # host memory bus instead of the engine.
    pps = max(1, n_points // (3 * 86400))

    def q_points_cascade(i=[0]):
        i[0] += 1
        base = 1735689600
        pts = spark.range(0, n_points, 1, cpus * 8).select(
            (F.col("id") % 64).cast("int").alias("bucket"),
            F.concat(F.lit("m"), ((F.col("id") + i[0]) % 4).cast("string")).alias("metric"),
            F.timestamp_seconds(
                F.lit(base) + (F.col("id") / F.lit(pps)).cast("long")
            ).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        rollup_cascade(rollup_cascade(rollup_tier(pts, "1 minute"), "1 hour"), "1 day").count()

    # training-data headlines: the scale-path dedup + similarity ops over
    # the driver's documents/embeddings tables (repartitioned: the fixture
    # is one file = one split; production tables arrive pre-split)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).repartition(
        cpus, "doc_id"
    )

    def q_dedup_minhash():
        from beamium_spark.operators.dedup import minhash_lsh_pairs

        minhash_lsh_pairs(docs, threshold=0.8).count()

    def q_near_dup_lsh():
        from beamium_spark.operators.similarity import embedding_near_dup_lsh

        embedding_near_dup_lsh(
            entrymod._near_dup_vectors(spark, sf_dir), threshold=0.95, dim=64
        ).count()

    # points_cascade first: it measures the pure-engine aggregation path
    # and must not inherit a heap/page-cache polluted by the 16 GiB scans
    timed("points_cascade", q_points_cascade)
    timed("tier_cascade", q_tier_cascade)
    timed("gapfill_zero_1m", q_gapfill)
    timed("block_encode", q_block_encode)
    timed("events_rollup_1m", q_events_rollup)
    timed("dedup_minhash_lsh", q_dedup_minhash)
    timed("embedding_near_dup_lsh", q_near_dup_lsh)

    total = round(sum(timings.values()), 3)
    # docs/sec over the raw-data-touching headline (the cascade)
    docs_per_sec = round(n_docs / timings["tier_cascade"], 1)
    points_per_sec = round(n_points / timings["points_cascade"], 1)

    print(
        json.dumps(
            {
                "metric": "rollup suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs": n_docs,
                "docs_per_sec": docs_per_sec,
                "bench_points": n_points,
                "points_per_sec": points_per_sec,
                "parallelism": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
