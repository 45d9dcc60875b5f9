"""Phase-isolation micro-bench (guide §1.4) + plan capture for round 6.

NOT the driver-timed bench (that is bench.py, frozen). This file times the
*stages inside* each headline query with the noop sink so optimization work
targets the real cost, and dumps .explain("formatted") for the committed
plans/r06/ artifacts.

Usage:
    python bench_extra.py phases [name ...]   # per-phase timings (noop sink)
    python bench_extra.py plans  <tag>        # write plans/r06/<q>_<tag>.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(name="bench_extra"):
    from beamium_spark.session import get_spark

    return get_spark(app_name=name, master=f"local[{CPUS}]", shuffle_partitions=CPUS)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, fn, runs=3):
    samples = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        fn()
        samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"phase": label, "samples": samples, "min": min(samples)}))
    return min(samples)


def _bench_frames(spark):
    """The exact DataFrames the frozen bench.py queries evaluate."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from beamium_spark.operators.blocks import encode_blocks
    from beamium_spark.operators.extract import extract_points
    from beamium_spark.operators.gapfill import gapfill
    from beamium_spark.operators.rollup import rollup_cascade, rollup_tier

    sf = entrymod._sf_of(SF_DIR)
    pages = spark.read.parquet(entrymod._fixture(sf))
    pts = extract_points(pages, bucket_mode="site")

    n_points = int(os.environ.get("BEAMIUM_BENCH_POINTS", "300000000"))
    pps = max(1, n_points // (3 * 86400))
    base = 1735689600
    synth_pts = spark.range(0, n_points, 1, CPUS * 8).select(
        (F.col("id") % 64).cast("int").alias("bucket"),
        F.concat(F.lit("m"), ((F.col("id") + 1) % 4).cast("string")).alias("metric"),
        F.timestamp_seconds(F.lit(base) + (F.col("id") / F.lit(pps)).cast("long")).alias("ts"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )

    t1m_dc = rollup_tier(
        extract_points(pages, bucket_mode="site", metrics=("doc_count",)), "1 minute"
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).repartition(
        CPUS, "doc_id"
    )

    from beamium_spark.operators.dedup import minhash_lsh_pairs
    from beamium_spark.operators.similarity import embedding_near_dup_lsh

    frames = {
        "points_cascade": rollup_cascade(
            rollup_cascade(rollup_tier(synth_pts, "1 minute"), "1 hour"), "1 day"
        ),
        "tier_cascade": rollup_cascade(
            rollup_cascade(rollup_tier(pts, "1 minute"), "1 hour"), "1 day"
        ),
        "gapfill_zero_1m": None,  # special: needs the cache protocol
        "block_encode": encode_blocks(
            pts.select("bucket", "metric", "ts", "value"), "1 hour"
        ).agg(F.sum("n_points")),
        "events_rollup_1m": entrymod._q_events_rollup_1m(spark, SF_DIR),
        "dedup_minhash_lsh": minhash_lsh_pairs(docs, threshold=0.8),
        "embedding_near_dup_lsh": embedding_near_dup_lsh(
            entrymod._near_dup_vectors(spark, SF_DIR), threshold=0.95, dim=64
        ),
    }
    extras = {
        "pages": pages,
        "pts": pts,
        "synth_pts": synth_pts,
        "t1m_dc": t1m_dc,
        "docs": docs,
        "entrymod": entrymod,
    }
    return frames, extras


def cmd_plans(tag: str) -> None:
    spark = _spark("r06_plans")
    frames, extras = _bench_frames(spark)
    from beamium_spark.operators.gapfill import gapfill

    frames = dict(frames)
    frames["gapfill_zero_1m"] = gapfill(extras["t1m_dc"], "1 minute", strategy="zero")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name, df in frames.items():
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print("wrote", p)
    spark.stop()


def cmd_phases(only: list[str]) -> None:
    from pyspark.sql import functions as F

    spark = _spark("r06_phases")
    frames, extras = _bench_frames(spark)
    pages, pts, synth_pts = extras["pages"], extras["pts"], extras["synth_pts"]

    from beamium_spark.operators.blocks import encode_blocks
    from beamium_spark.operators.gapfill import gapfill
    from beamium_spark.operators.rollup import rollup_cascade, rollup_tier

    def want(n):
        return not only or n in only

    # warm page cache once so phases compare compute, not cold NVMe reads
    if want("tier_cascade") or want("block_encode"):
        _noop(pages.select(F.length("html"), F.length("text")))

    if want("points_cascade"):
        _timed(spark, "points_cascade/full", lambda: frames["points_cascade"].count())
        _timed(spark, "points_cascade/gen-only", lambda: _noop(synth_pts))
        _timed(
            spark,
            "points_cascade/t1m-only",
            lambda: rollup_tier(synth_pts, "1 minute").count(),
        )
    if want("tier_cascade"):
        _timed(spark, "tier_cascade/full", lambda: frames["tier_cascade"].count())
        _timed(spark, "tier_cascade/extract-only", lambda: _noop(pts))
        _timed(
            spark,
            "tier_cascade/scan-lengths-only",
            lambda: _noop(pages.select("url", "warc_ts", F.length("html"), F.length("text"), "lang")),
        )
        _timed(
            spark, "tier_cascade/t1m-only", lambda: rollup_tier(pts, "1 minute").count()
        )
    if want("block_encode"):
        _timed(
            spark,
            "block_encode/full",
            lambda: frames["block_encode"].collect(),
        )
        sel = pts.select("bucket", "metric", "ts", "value")
        _timed(spark, "block_encode/points-only", lambda: _noop(sel))
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        shuffled = (
            sel.select(
                "bucket", "metric", F.date_trunc("hour", "ts").alias("chunk_start"), "ts", "value"
            )
            .repartition(n_part, "bucket", "metric", "chunk_start")
            .sortWithinPartitions("bucket", "metric", "chunk_start", "ts")
        )
        _timed(spark, "block_encode/shuffle-sort-only", lambda: _noop(shuffled))
        _timed(
            spark,
            "block_encode/encode-noagg",
            lambda: _noop(encode_blocks(sel, "1 hour")),
        )
    if want("gapfill_zero_1m"):
        t = extras["t1m_dc"].cache()
        _timed(spark, "gapfill/tier-build", lambda: t.count())
        _timed(
            spark,
            "gapfill/fill-only(cached-tier)",
            lambda: gapfill(t, "1 minute", strategy="zero").count(),
        )
        t.unpersist()
    if want("events_rollup_1m"):
        _timed(spark, "events_rollup/full", lambda: frames["events_rollup_1m"].count())
    if want("dedup_minhash_lsh"):
        from beamium_spark.operators.dedup import minhash_signatures

        _timed(
            spark, "dedup_minhash/full", lambda: frames["dedup_minhash_lsh"].count()
        )
        _timed(
            spark,
            "dedup_minhash/sigs-only",
            lambda: _noop(
                minhash_signatures(extras["docs"], 128, 3, 42, "text", "doc_id")
            ),
        )
    if want("embedding_near_dup_lsh"):
        entrymod = extras["entrymod"]
        vecs = entrymod._near_dup_vectors(spark, SF_DIR)
        from beamium_spark.operators.similarity import (
            _band_keys_arrow,
            _hyperplanes,
        )

        _timed(
            spark,
            "embed_lsh/full",
            lambda: frames["embedding_near_dup_lsh"].count(),
        )
        planes = _hyperplanes(64, 16 * 8, 42)
        keys = _band_keys_arrow(planes, 8)(F.col("embedding"))
        _timed(
            spark,
            "embed_lsh/bandkeys-only",
            lambda: _noop(vecs.select("vec_id", keys.alias("k"))),
        )
        _timed(spark, "embed_lsh/vectors-only", lambda: _noop(vecs))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "phases"
    if cmd == "plans":
        cmd_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    else:
        cmd_phases(sys.argv[2:])
