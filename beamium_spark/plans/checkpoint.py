"""Checkpoint / lineage manifest: the engine's Disk-Fail-Over state.

Beamium's resumability primitive is "state lives on the filesystem":
new work = scanned files minus the seen-set (/root/reference/
src/router.rs:56-77), deletion only after a confirmed forward
(src/lib/asynch/http.rs:161-176), and a crash replays exactly the files
still on disk (README.md:6). The engine's equivalents:

- seen-set            → manifest rows (state='committed') per (chunk, tier)
- set difference      → **left-anti join** of source chunks vs manifest
- delete-after-send   → manifest row appended only *after* the tier data
                        write; the data write itself is an idempotent
                        partition overwrite, so a kill between the two
                        replays the chunk with no duplicates (K2 semantics)
- retry w/ backoff    → ``commit_with_retry`` with beamium's constants:
                        initial 500 ms, max 60 s, ×1.5, ±0.3 jitter
                        (src/conf.rs:135-138, src/lib/asynch/http.rs:87-93)
- counters            → scraped / filtered / forwarded per manifest row
                        (the north_star triple; beamium's
                        beamium_fetch_datapoints / line filters /
                        beamium_push_datapoints, src/scraper.rs:35-46,
                        src/lib/asynch/http.rs:31-47)
"""

from __future__ import annotations

import random
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_TABLE = "checkpoint_manifest"

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("chunk_start", T.TimestampType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("scraped", T.LongType(), True),
        T.StructField("filtered", T.LongType(), True),
        T.StructField("forwarded", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

# beamium backoff defaults (src/conf.rs:135-138)
BACKOFF_INITIAL_S = 0.5
BACKOFF_MAX_S = 60.0
BACKOFF_MULTIPLIER = 1.5
BACKOFF_RANDOMIZATION = 0.3


class Manifest:
    def __init__(self, store, table: str = MANIFEST_TABLE):
        self.store = store
        self.table = table

    def read(self) -> DataFrame:
        if not self.store.exists(self.table):
            return self.store.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.store.read(self.table)

    def committed_chunks(self, tier: str) -> DataFrame:
        return (
            self.read()
            .filter((F.col("tier") == tier) & (F.col("state") == "committed"))
            .select("chunk_start")
            .distinct()
        )

    def pending_chunks(self, source_chunks: DataFrame, tier: str) -> DataFrame:
        """source chunks (one col ``chunk_start``) not yet committed for
        ``tier`` — the left-anti join standing in for beamium's seen-set
        difference (src/router.rs:63-77)."""
        return source_chunks.join(
            self.committed_chunks(tier), "chunk_start", "left_anti"
        )

    def commit(
        self,
        run_id: str,
        chunk_starts: list,
        tier: str,
        scraped: int = 0,
        filtered: int = 0,
        forwarded: int = 0,
    ) -> None:
        spark = self.store.spark
        rows = [
            (run_id, cs, tier, "committed", scraped, filtered, forwarded)
            for cs in chunk_starts
        ]
        df = spark.createDataFrame(
            rows,
            "run_id string, chunk_start timestamp, tier string, state string, "
            "scraped long, filtered long, forwarded long",
        ).withColumn("committed_at", F.current_timestamp())
        self.store.append(df, self.table)

    # ---- run metadata: reload/restart + commit-status observability ------
    # beamium_reload_count (src/main.rs:27-33, inc :201) and
    # beamium_push_http_status (src/lib/asynch/http.rs:31-47) analogues:
    # every run()/reload/commit outcome lands as a row in `run_meta`.

    def record_event(self, run_id: str, event: str, info: str = "") -> None:
        spark = self.store.spark
        df = spark.createDataFrame(
            [(run_id, event, info)], "run_id string, event string, info string"
        ).withColumn("at", F.current_timestamp())
        self.store.append(df, "run_meta")

    def run_events(self) -> DataFrame:
        if not self.store.exists("run_meta"):
            return self.store.spark.createDataFrame(
                [], "run_id string, event string, info string, at timestamp"
            )
        return self.store.read("run_meta")

    def event_counts(self) -> DataFrame:
        """Gauge table: rows per event kind (run_start / run_complete /
        reload / commit_ok / commit_retry)."""
        return self.run_events().groupBy("event").agg(F.count("*").alias("n"))

    def counters(self) -> DataFrame:
        """Per-tier counter totals — the /metrics exposition analogue
        (src/cmd.rs:80-106), queryable via Spark SQL."""
        # chunk rows of one commit share the same run totals → collapse to
        # per-(run, tier) first, then sum across runs
        per_run = (
            self.read()
            .filter(F.col("state") == "committed")
            .groupBy("run_id", "tier")
            .agg(
                F.count("*").alias("chunks"),
                F.max("scraped").alias("scraped"),
                F.max("filtered").alias("filtered"),
                F.max("forwarded").alias("forwarded"),
            )
        )
        return per_run.groupBy("tier").agg(
            F.sum("chunks").alias("chunks"),
            F.sum("scraped").alias("scraped"),
            F.sum("filtered").alias("filtered"),
            F.sum("forwarded").alias("forwarded"),
        )


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def commit_with_retry(
    fn,
    max_attempts: int = 8,
    initial_s: float = BACKOFF_INITIAL_S,
    max_s: float = BACKOFF_MAX_S,
    multiplier: float = BACKOFF_MULTIPLIER,
    randomization: float = BACKOFF_RANDOMIZATION,
    sleep=time.sleep,
    rng: random.Random | None = None,
    observer=None,
):
    """Driver-side commit retry with beamium's exponential backoff
    (state machine at src/lib/asynch/http.rs:181-232; reset-on-success
    :87-93). Spark task retries cover executor failure; this covers the
    commit action itself. ``observer(attempts)`` is invoked on success —
    the push_http_status analogue feeding the run_meta event table."""
    rng = rng or random.Random()
    delay = initial_s
    last_err = None
    for attempt in range(1, max_attempts + 1):
        try:
            out = fn()
            if observer is not None:
                observer(attempt)
            return out
        except Exception as e:  # noqa: BLE001 - commit errors are retryable
            last_err = e
            jitter = 1.0 + randomization * (2.0 * rng.random() - 1.0)
            sleep(min(delay * jitter, max_s))
            delay = min(delay * multiplier, max_s)
    raise RuntimeError(f"commit failed after {max_attempts} attempts") from last_err
