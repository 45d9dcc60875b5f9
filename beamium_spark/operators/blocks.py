"""Compressed block store: points ⇄ per-(bucket, metric, chunk) blocks.

The engine analogue of beamium's size-capped ``.metrics`` batch files
(/root/reference/src/scraper.rs:221-303 writes chunks,
src/router.rs:135-146 reads them back): a chunk of one series' points is
one row holding two opaque binary columns (delta-of-delta ts block,
Gorilla-XOR val block). Chunking is by time (default 1 hour), the
``chunk_start`` of the north_rule's explicit (bucket, chunk) partitioning.

Encode = ``applyInPandas`` over (bucket, metric, labels-free) groups —
inside each group the codec is pure vectorized numpy over Arrow batches;
no per-row Python. Decode = ``mapInPandas`` so a scan of the block table
streams back points partition-parallel without a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beamium_spark.operators.codec import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)

CODEC_NAME = "dod+gorilla-xor/mb128"

BLOCK_SCHEMA = (
    "bucket int, metric string, chunk_start timestamp, n_points int, "
    "ts_block binary, val_block binary, codec string"
)

POINT_SCHEMA = "bucket int, metric string, ts timestamp, value double"


def encode_blocks(points: DataFrame, chunk: str = "1 hour") -> DataFrame:
    """points(bucket, metric, ts, value, ...) → blocks table.

    One output row per (bucket, metric, chunk_start); points are sorted by
    ts inside the block (order is the codec's delta axis).
    """
    trunc = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}[chunk]
    chunked = points.select(
        "bucket",
        "metric",
        F.date_trunc(trunc, "ts").alias("chunk_start"),
        F.col("ts"),
        "value",
    )

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        ts_us = pdf["ts"].astype("int64").to_numpy()  # ns → µs below
        ts_us = ts_us // 1000
        vals = pdf["value"].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "bucket": [pdf["bucket"].iloc[0]],
                "metric": [pdf["metric"].iloc[0]],
                "chunk_start": [pdf["chunk_start"].iloc[0]],
                "n_points": [len(pdf)],
                "ts_block": [encode_timestamps(ts_us)],
                "val_block": [encode_values(vals)],
                "codec": [CODEC_NAME],
            }
        )

    return chunked.groupBy("bucket", "metric", "chunk_start").applyInPandas(
        _encode, schema=BLOCK_SCHEMA
    )


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks → points(bucket, metric, ts, value): the symmetric readback
    used by the tier-exact verification path."""

    def _decode(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                ts = decode_timestamps(row.ts_block)
                vals = decode_values(row.val_block)
                frames.append(
                    pd.DataFrame(
                        {
                            "bucket": row.bucket,
                            "metric": row.metric,
                            "ts": pd.to_datetime(ts * 1000),  # µs → ns
                            "value": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return blocks.mapInPandas(_decode, schema=POINT_SCHEMA)


def block_stats(blocks: DataFrame) -> DataFrame:
    """Compression accounting per metric: raw vs encoded bytes (raw =
    16 bytes/point: int64 ts + float64 value)."""
    return (
        blocks.groupBy("metric")
        .agg(
            F.sum("n_points").alias("points"),
            F.sum(F.length("ts_block") + F.length("val_block")).alias("encoded_bytes"),
            (F.sum("n_points") * 16).alias("raw_bytes"),
        )
        .withColumn(
            "ratio", F.round(F.col("raw_bytes") / F.col("encoded_bytes"), 2)
        )
    )
