"""Streaming near-dup ingest: continuous-crawl dedup as a file stream.

The always-on form of :func:`beamium_spark.operators.dedup.
minhash_dedup_incremental` — the daemon shape of the reference's
scan-batch-forward loop (/root/reference/src/router.rs:55 scan loop)
applied to corpus curation: document files land in a directory, each
micro-batch near-dedups against everything ingested before it, keepers
flow to the output table and their LSH band keys append to the persisted
store so later batches (and later RESTARTS) see them.

Exactly-once without a transaction log, by construction:

- both sinks partition by ``__batch`` (the foreachBatch epoch id) and
  write with dynamic partition overwrite, so a RETRIED epoch overwrites
  its own partition instead of appending twice;
- the dedup decision reads the band store filtered to ``__batch <
  current`` — a retried epoch therefore does NOT collide with the bands
  its own failed attempt may have written, making the decision
  deterministic across retries (the subtle failure mode: write bands,
  crash before commit, replay → every doc silently drops as a dup of
  itself).

Scale shape is the incremental operator's (band keys only cross batch
boundaries; batch-bounded shuffles) plus the streaming state being
nothing at all — no watermark, no state store; all persistence is the
band-store table itself, pruned by (band, bh) on probe.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_docs_stream(
    spark: SparkSession, docs_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a documents directory (parquet)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )


def dedup_batch_processor(
    kept_dir: str,
    bands_dir: str,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body, exposed separately so tests (and batch
    backfills) can drive it directly — calling it twice with the same
    ``batch_id`` must be a no-op difference (idempotence drill in
    tests/test_dedup_stream.py)."""
    from beamium_spark.operators.dedup import minhash_dedup_incremental

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            seen = spark.read.parquet(bands_dir).filter(
                F.col("__batch") < F.lit(batch_id)
            )
        except Exception:  # first epoch: store not created yet
            seen = None
        # registry persists the shared band frame for the two writes below
        # (kept docs + new band keys are separate actions; without it the
        # signature build + band join + store probe ran twice per
        # micro-batch — r5 ADVICE), released as soon as both commit
        reg: list = []
        kept, new_bands = minhash_dedup_incremental(
            batch_df,
            seen,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            seed=seed,
            text_col=text_col,
            id_col=id_col,
            hash_mode=hash_mode,
            cache_registry=reg,
        )
        try:
            for frame, path in (
                (kept, kept_dir),
                (new_bands, bands_dir),
            ):
                (
                    frame.withColumn("__batch", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch")
                    .parquet(path)
                )
        finally:
            for df in reg:
                df.unpersist()

    return _process


def start_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    kept_dir: str,
    bands_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    **dedup_kwargs,
):
    """Wire the stream: returns the started StreamingQuery. With
    ``available_now`` the stream drains everything currently in
    ``docs_dir`` and stops — the batch-backfill form; without it the
    query keeps watching the directory (the daemon form). Restarting
    with the same checkpoint resumes at the next unprocessed file, and
    the band store — not the checkpoint — carries the dedup memory, so
    a wiped checkpoint at worst re-processes files into their own
    (overwritten) partitions."""
    stream = read_docs_stream(spark, docs_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(
        dedup_batch_processor(kept_dir, bands_dir, **dedup_kwargs)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
