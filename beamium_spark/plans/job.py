"""The rollup job driver: beamium's scrape→route→forward loop, Spark-first.

One ``run()`` is a micro-batch pass (beamium's scrape tick,
/root/reference/src/scraper.rs:90-135):

1. discover work: distinct hour-chunks in the source minus committed
   manifest chunks (anti-join resumability, src/router.rs:56-77), PLUS
   committed chunks whose source row count drifted from the fence-time
   baseline — late-arriving data replays its chunk exactly like beamium
   re-forwards any new file in a scanned directory;
2. per pending chunk set: extract points → 1m rollup → idempotent
   partition overwrite → Gorilla blocks → manifest commit with backoff;
3. cascade: recompute 1h windows of the touched hours and 1d windows of
   the touched days **from the tier below** (decomposable tuples — raw
   data is read exactly once, by the 1m pass);
4. retention pass per tier policy (TTL / size cap).

Kill the driver at any point: data writes are per-chunk idempotent
overwrites and the manifest row lands only after the write, so a rerun
replays exactly the unforwarded chunks (the DFO guarantee, README.md:6).

Scale notes: chunk discovery and manifests are tiny DataFrames; the only
raw-data scan per pass is the 1m rollup over pending chunks, pruned by a
``warc_ts`` range predicate that reaches the parquet row-group stats (the
fixture is written time-sorted for exactly this reason).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beamium_spark.operators.blocks import encode_blocks
from beamium_spark.operators.extract import extract_points
from beamium_spark.operators.retention import size_cap_evict, ttl_evict
from beamium_spark.operators.rollup import rollup_cascade, rollup_tier, rollup_tier_salted
from beamium_spark.plans.checkpoint import Manifest, commit_with_retry, new_run_id
from beamium_spark.sources.tables import ParquetTierStore


@dataclass
class RetentionPolicy:
    ttl_hours: float | None = None
    cap_bytes: int | None = None


@dataclass
class AlertRule:
    """One Prometheus-style rule the job evaluates per tick over the
    maintained 1m tier: ``value <op> threshold`` for ``for_windows``
    consecutive minutes on series whose metric matches the anchored
    regex. ``name`` labels the output rows (defaults to the rule
    expression)."""

    metric: str
    threshold: float
    op: str = ">"
    for_windows: int = 3
    name: str | None = None

    @property
    def label(self) -> str:
        return self.name or f"{self.metric}{self.op}{self.threshold}for{self.for_windows}m"


@dataclass
class JobConf:
    """Engine config; defaults echo the reference's capacity constants
    (SURVEY.md §6)."""

    n_buckets: int = 64
    bucket_mode: str = "hash"
    salt_factor: int = 0  # 0 = unsalted; >0 = two-stage skew-resistant agg
    static_labels: dict = field(default_factory=dict)
    drop_label_keys: list = field(default_factory=list)
    metric_whitelist: str | None = None
    write_blocks: bool = True
    # when set, the job also maintains a 1h fixed-width value-histogram
    # tier ("hist_1h") — decomposable bin counts, the scale path for
    # approximate percentile reads (query(stat=..., approx=True))
    histogram_bin_width: float | None = None
    # when set, the job also maintains a 1h MERGEABLE HLL distinct-url
    # tier ("distinct_1h" — DataSketches sketch column at this lgK);
    # query(stat='distinct') unions it to any step without raw pages
    distinct_lgk: int | None = None
    # per-tick incremental compaction: chunks exceeding this many parquet
    # files get rewritten after retention (0 = off)
    max_files_per_chunk: int = 8
    # per-tick alert-rule evaluation (list of AlertRule): episodes land
    # in the 'alerts' table, evaluated PER TOUCHED DAY so replays are
    # deterministic regardless of which tick recomputes a day (streaks
    # reset at day boundaries by construction — the same complete-day
    # recompute contract as the cascades)
    alert_rules: list = field(default_factory=list)
    retention: dict = field(
        default_factory=lambda: {
            # 1m keeps 2 days, 1h keeps 2 weeks, 1d keeps forever;
            # raw-fidelity Gorilla blocks follow the 1m tier
            "rollup_1m": RetentionPolicy(ttl_hours=48),
            "rollup_1h": RetentionPolicy(ttl_hours=14 * 24),
            "rollup_1d": RetentionPolicy(),
            "blocks": RetentionPolicy(ttl_hours=48),
            # distribution tier (written only when histogram_bin_width is
            # set) follows the 1h tier's horizon
            "hist_1h": RetentionPolicy(ttl_hours=14 * 24),
            # distinct-sketch tier (written only when distinct_lgk is
            # set) follows the 1h tier's horizon
            "distinct_1h": RetentionPolicy(ttl_hours=14 * 24),
            # alert episodes (written only when alert_rules is set)
            "alerts": RetentionPolicy(ttl_hours=14 * 24),
        }
    )


class RollupJob:
    def __init__(
        self,
        spark: SparkSession,
        pages_path: str,
        state_root: str,
        conf: JobConf | None = None,
    ):
        self.spark = spark
        self.pages_path = pages_path
        self.conf = conf or JobConf()
        self.store = ParquetTierStore(spark, state_root)
        self.manifest = Manifest(self.store)

    # ---- discovery -------------------------------------------------------

    def source_chunks(self) -> DataFrame:
        pages = self.spark.read.parquet(self.pages_path)
        return (
            pages.select(F.date_trunc("hour", "warc_ts").alias("chunk_start"))
            .distinct()
        )

    def source_chunk_counts(self) -> DataFrame:
        """(chunk_start, n_pages) over the source — the late-data detector's
        ground truth. Reads the warc_ts column only (column-pruned scan);
        the aggregate is the same O(chunks)-row frame discovery already
        produces."""
        pages = self.spark.read.parquet(self.pages_path)
        return (
            pages.filter(F.col("warc_ts").isNotNull())
            .groupBy(F.date_trunc("hour", "warc_ts").alias("chunk_start"))
            .agg(F.count("*").alias("n_pages"))
        )

    def dirty_chunks(self, src_counts: DataFrame) -> DataFrame:
        """Committed chunks whose source row count no longer matches the
        count recorded at their commit fence — i.e. chunks that received
        LATE data after being forwarded. Beamium re-forwards any new file
        in a scanned directory (src/router.rs:56-77); the engine's work
        unit is the chunk, so the analogue is replaying a chunk whose
        contents changed. A chunk committed without a recorded count
        (pre-feature store, or a crash between the fence and the count
        write) is treated as dirty once — the replay is an idempotent
        overwrite, so it self-heals."""
        committed = self.manifest.committed_chunks("rollup_1m")
        if not self.store.exists("chunk_counts"):
            return committed.join(src_counts, "chunk_start", "left_semi").select(
                "chunk_start"
            )
        recorded = self.store.read("chunk_counts").select(
            "chunk_start", F.col("n_pages").alias("__rec")
        )
        return (
            committed.join(src_counts, "chunk_start")
            .join(recorded, "chunk_start", "left")
            .filter(F.col("__rec").isNull() | (F.col("__rec") != F.col("n_pages")))
            .select("chunk_start")
        )

    def pending_chunks(self) -> list:
        """New chunks (never committed) ∪ dirty chunks (late data arrived
        after commit) — both replayed through the same idempotent path."""
        src_counts = self.source_chunk_counts().cache()
        try:
            new = self.manifest.pending_chunks(
                src_counts.select("chunk_start"), "rollup_1m"
            )
            pending = new.unionByName(self.dirty_chunks(src_counts)).distinct()
            rows = pending.orderBy("chunk_start").collect()
        finally:
            src_counts.unpersist()
        return [r["chunk_start"] for r in rows]

    # ---- one micro-batch pass -------------------------------------------

    def run(self, max_chunks: int | None = None) -> dict:
        run_id = new_run_id()
        pending = self.pending_chunks()
        if max_chunks is not None:
            pending = pending[:max_chunks]
        report = {"run_id": run_id, "chunks": len(pending)}
        if not pending:
            report.update(scraped=0, filtered=0, forwarded=0)
            return report
        self.manifest.record_event(run_id, "run_start", f"chunks={len(pending)}")

        lo, hi = min(pending), max(pending)
        pages = self.spark.read.parquet(self.pages_path).filter(
            # range + set predicate: range reaches row-group stats, the
            # isin prunes interior committed chunks
            (F.col("warc_ts") >= F.lit(lo))
            & (F.col("warc_ts") < F.lit(hi) + F.expr("interval 1 hour"))
            & F.date_trunc("hour", "warc_ts").isin(pending)
        )
        points = extract_points(
            pages,
            n_buckets=self.conf.n_buckets,
            bucket_mode=self.conf.bucket_mode,
            static_labels=self.conf.static_labels,
            drop_label_keys=self.conf.drop_label_keys,
            metric_whitelist=self.conf.metric_whitelist,
        ).cache()
        # exact counter triple (north_star scraped/filtered/forwarded):
        # scraped = raw page rows scanned (beamium_fetch_datapoints);
        # filtered = F1-dropped pages + F2/F3-dropped candidate points —
        # counted directly, never inferred from the fan-out factor (which
        # breaks under metric_whitelist / non-default families). The
        # counting scan admits NULL-warc_ts rows explicitly (the range
        # predicate above would silently exclude them): such rows can never
        # join a chunk, so like beamium's malformed lines they are
        # re-scraped and re-counted as filtered by every pass that has
        # pending work.
        from beamium_spark.operators.extract import METRICS

        count_src = self.spark.read.parquet(self.pages_path).filter(
            F.col("warc_ts").isNull()
            | (
                (F.col("warc_ts") >= F.lit(lo))
                & (F.col("warc_ts") < F.lit(hi) + F.expr("interval 1 hour"))
                & F.date_trunc("hour", "warc_ts").isin(pending)
            )
        )
        pg = count_src.agg(
            F.count(F.lit(1)).alias("scraped"),
            F.count(
                F.when(F.col("url").isNotNull() & F.col("warc_ts").isNotNull(), 1)
            ).alias("valid"),
        ).collect()[0]
        scraped, valid = pg["scraped"], pg["valid"]
        n_points = points.count()
        n_families = len(METRICS)
        filtered = (scraped - valid) + (valid * n_families - n_points)

        if self.conf.salt_factor:
            t1m = rollup_tier_salted(
                points, "1 minute", salt_factor=self.conf.salt_factor
            )
        else:
            t1m = rollup_tier(points, "1 minute")
        t1m = t1m.withColumn("chunk_start", F.date_trunc("hour", "window_start"))
        # data write only — the rollup_1m manifest row is the pending-work
        # marker, so it must land LAST, after blocks and both cascades:
        # a kill anywhere in between leaves the chunk pending and the rerun
        # redoes every (idempotent-overwrite) write for it
        forwarded = self._write_tier_data(t1m, "rollup_1m")

        if self.conf.write_blocks:
            blocks = encode_blocks(
                points.select("bucket", "metric", "ts", "value"), "1 hour"
            )
            commit_with_retry(
                lambda: self.store.write_chunks(blocks, "blocks", "chunk_start")
            )

        if self.conf.histogram_bin_width:
            from beamium_spark.operators.rollup import rollup_histogram

            # hour windows align with chunk boundaries, so each chunk's
            # dynamic overwrite replaces complete windows — replay-idempotent
            # like the tiers; bin_width rides along so readers are
            # self-describing
            hist = (
                rollup_histogram(
                    points, "1 hour", self.conf.histogram_bin_width
                )
                .withColumn(
                    "bin_width", F.lit(float(self.conf.histogram_bin_width))
                )
                .withColumn("chunk_start", F.col("window_start"))
            )
            commit_with_retry(
                lambda: self.store.write_chunks(hist, "hist_1h", "chunk_start")
            )

        if self.conf.distinct_lgk:
            from beamium_spark.operators.rollup import distinct_tier

            # doc_count rows carry each page's url exactly once; hour
            # windows align with chunks, so overwrites stay idempotent
            dsk = distinct_tier(
                points.filter(F.col("metric") == "doc_count").select(
                    "url", F.col("ts").alias("warc_ts")
                ),
                "1 hour",
                lgk=self.conf.distinct_lgk,
            ).withColumn("chunk_start", F.col("window_start"))
            commit_with_retry(
                lambda: self.store.write_chunks(dsk, "distinct_1h", "chunk_start")
            )

        # cascades from the tier below, recomputed for every *date* touched:
        # tier writes are dynamic overwrites of whole chunk_date partitions,
        # so the rewritten partitions must be complete days, not just the
        # hours of this pass
        touched_days = sorted({h.replace(hour=0, minute=0, second=0) for h in pending})
        touched_dates = [d.date() for d in touched_days]
        t1h = (
            rollup_cascade(
                self.store.read("rollup_1m").filter(
                    F.to_date("window_start").isin(touched_dates)
                ),
                "1 hour",
            )
            .withColumn("chunk_start", F.col("window_start"))
        )
        fwd_1h = self._write_tier_data(t1h, "rollup_1h")
        t1d = (
            rollup_cascade(
                self.store.read("rollup_1h").filter(
                    F.to_date("window_start").isin(touched_dates)
                ),
                "1 day",
            )
            .withColumn("chunk_start", F.col("window_start"))
        )
        fwd_1d = self._write_tier_data(t1d, "rollup_1d")

        if self.conf.alert_rules:
            from beamium_spark.operators.rollup import alert_episodes, tier_alert_rule

            # evaluate each touched day INDEPENDENTLY: the day is the
            # overwrite unit, so whichever tick recomputes it produces
            # identical episodes (streaks reset at midnight by contract)
            t1m_stored = self.store.read("rollup_1m")
            eps = None
            for d in touched_dates:
                day = t1m_stored.filter(F.to_date("window_start") == d)
                for rule in self.conf.alert_rules:
                    a = tier_alert_rule(
                        day.filter(F.col("metric").rlike(f"^(?:{rule.metric})$")),
                        rule.threshold,
                        rule.op,
                        rule.for_windows,
                        "1 minute",
                    )
                    e = alert_episodes(a, rule.for_windows, "1 minute").withColumn(
                        "rule", F.lit(rule.label)
                    )
                    eps = e if eps is None else eps.unionByName(e)
            eps = eps.withColumn("chunk_start", F.date_trunc("day", "episode_start"))
            commit_with_retry(
                lambda: self.store.write_chunks(eps, "alerts", "chunk_start")
            )

        # the resumability fence: only now is the chunk "forwarded"
        commit_with_retry(
            lambda: self.manifest.commit(
                run_id, pending, "rollup_1m",
                scraped=scraped, filtered=filtered, forwarded=forwarded,
            ),
            observer=lambda n: self.manifest.record_event(
                run_id, "commit_ok", f"rollup_1m:attempts={n}"
            ),
        )
        # 1h/1d manifest rows (counters only — discovery keys on rollup_1m)
        # land AFTER the fence: a crash between a tier commit and the fence
        # would otherwise replay the chunk and double-count those tiers'
        # 'forwarded'. The flip side — a crash right after the fence loses
        # this run's 1h/1d counter rows — undercounts a crashed run's
        # observability tally but never its data (both tiers' data writes
        # precede the fence).
        self.manifest.commit(run_id, pending, "rollup_1h", forwarded=fwd_1h)
        self.manifest.commit(run_id, touched_days, "rollup_1d", forwarded=fwd_1d)
        # late-data baseline: the per-chunk source row counts as of this
        # commit (dirty_chunks replays a chunk when the live count drifts).
        # Written after the fence — a crash in between leaves the chunk
        # count-less and therefore dirty-once, which replays idempotently.
        counts_df = (
            pages.groupBy(F.date_trunc("hour", "warc_ts").alias("chunk_start"))
            .agg(F.count("*").alias("n_pages"))
        )
        commit_with_retry(
            lambda: self.store.write_chunks(counts_df, "chunk_counts", "chunk_start")
        )
        self.manifest.record_event(run_id, "run_complete", f"chunks={len(pending)}")

        points.unpersist()
        report.update(
            scraped=scraped,
            filtered=filtered,
            forwarded=forwarded,
            forwarded_1h=fwd_1h,
            forwarded_1d=fwd_1d,
        )
        return report

    def _write_tier_data(self, tier_df: DataFrame, table: str) -> int:
        """Idempotent tier data write (chunk partition overwrite) with
        beamium's commit backoff; manifest rows are the caller's business —
        ordering them after all dependent writes is what makes kill-anywhere
        replay sound.

        The forwarded counter rides the write via ``observe()`` (r6) —
        previously the frame was cached and counted in a separate action
        before the write (cache fill + cache re-read per tier). Fresh
        Observation per attempt: a backoff retry re-runs the closure and an
        Observation is single-use."""
        from pyspark.sql import Observation

        result: dict[str, int] = {}

        def _attempt() -> None:
            ob = Observation()
            self.store.write_chunks(tier_df, table, "chunk_start", observation=ob)
            result["n"] = ob.get["n"]

        commit_with_retry(_attempt)
        return result["n"]

    # ---- retention -------------------------------------------------------

    def apply_retention(self, now_ts: str) -> dict:
        out = {}
        for table, pol in self.conf.retention.items():
            if pol.ttl_hours is not None and self.store.exists(table):
                out[table] = ttl_evict(self.store, table, now_ts, pol.ttl_hours)
            if pol.cap_bytes is not None and self.store.exists(table):
                # blocks carry their own byte accounting (encoded block
                # lengths) — the size cap uses it instead of row estimates
                size_expr = (
                    F.length("ts_block") + F.length("val_block")
                    if table == "blocks"
                    else None
                )
                out.setdefault(table, {}).update(
                    size_cap_evict(
                        self.store, table, pol.cap_bytes, size_expr=size_expr
                    )
                )
        return out

    def compact_if_needed(self) -> dict:
        """Per-tick incremental compaction over every retained table:
        chunks exceeding ``conf.max_files_per_chunk`` parquet files are
        rewritten (incremental passes and dirty-chunk replays leave new
        files per touched chunk every tick; a long-lived job's file count
        is otherwise unbounded, and file count — not bytes — is what
        blows up listing/planning at 10^5+ chunks)."""
        out: dict = {}
        for table in self.conf.retention:
            r = self.store.compact_if_over(table, self.conf.max_files_per_chunk)
            if r:
                out[table] = r
        return out

    # ---- readback --------------------------------------------------------

    def tier(self, name: str) -> DataFrame:
        return self.store.read(name).drop("chunk_key", "chunk_start")

    def counters(self) -> DataFrame:
        return self.manifest.counters()

    def record_reload(self) -> None:
        """Config hot-reload marker (beamium_reload_count, src/main.rs:27-33):
        call from the ``conf.watch_and_rerun`` on_change hook before
        restarting the job from checkpoint."""
        self.manifest.record_event(new_run_id(), "reload")

    def gauges(self) -> dict:
        """Live gauges: pending-chunk count (beamium_directory_files,
        src/lib/asynch/fs.rs:17-26) + run/reload/commit event totals
        (beamium_reload_count, push_http_status analogues)."""
        events = {
            r["event"]: r["n"] for r in self.manifest.event_counts().collect()
        }
        return {
            "pending_chunks": len(self.pending_chunks()),
            "runs_started": events.get("run_start", 0),
            "runs_completed": events.get("run_complete", 0),
            "reloads": events.get("reload", 0),
            "commits_ok": events.get("commit_ok", 0),
        }
