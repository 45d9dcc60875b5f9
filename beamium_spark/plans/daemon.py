"""Conf-driven scrape→route→retain daemon: the whole beamium process shape.

A user of the reference runs one binary from one config file
(/root/reference/src/main.rs:47-104): scrapers poll endpoints, the router
fans lines out to selector-filtered sinks, sinks forward with TTL/size
eviction, and a config change restarts everything from on-disk state.
``ScrapeDaemon`` is that surface on Spark:

- each ``ScraperConf`` maps to a text-source directory in the scraper's
  dialect — ``prometheus`` exposition text (transcompiled, P1) or
  ``sensision`` GTS lines (passthrough parse, P2) — with the scraper's
  metric whitelist (F3, src/scraper.rs:204-208) and per-scraper labels
  (src/conf.rs:260-264) applied on read;
- the router pass applies global labels and writes one selector-filtered
  copy per sink (R1/F4, plans/router.py), committing manifest rows only
  after every sink write — beamium's delete-after-all-writes;
- work discovery is the left-anti join of source hour-chunks vs chunks
  committed for EVERY sink (a crash mid-route replays the chunk into all
  sinks idempotently — dynamic partition overwrite);
- per-sink retention applies the sink's ``ttl``/``size`` caps
  (K4/K5, src/sink.rs:101-222);
- ``conf.watch_and_rerun`` + ``record_reload`` give the 2s-debounced hot
  reload (src/main.rs:148-205): state lives in the store, so a restarted
  daemon resumes exactly where the old one stopped.

Scale notes: everything dataflow-heavy is one cached points DataFrame per
pass; discovery and manifests are O(chunks). The scrape "tick"
(src/scraper.rs:90) is the caller's loop cadence — each ``run_once`` is
one micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beamium_spark.conf import EngineConf, ScraperConf
from beamium_spark.operators.retention import size_cap_evict, ttl_evict
from beamium_spark.plans.checkpoint import Manifest, new_run_id
from beamium_spark.plans.router import route_multicast
from beamium_spark.sources.tables import ParquetTierStore


@dataclass
class ScraperSource:
    conf: ScraperConf
    path: str  # directory of text files in the scraper's dialect


class ScrapeDaemon:
    def __init__(
        self,
        spark: SparkSession,
        conf: EngineConf,
        sources: list[ScraperSource],
        state_root: str,
        now_us: int,
    ):
        self.spark = spark
        self.conf = conf
        self.sources = sources
        self.now_us = now_us  # batch-constant scrape time (P5)
        self.store = ParquetTierStore(spark, state_root)
        self.manifest = Manifest(self.store)

    # ---- scrape (S1/S4 + P1/P2 + F1-F3 + per-scraper P3) ------------------

    def scrape_points(self) -> DataFrame:
        from beamium_spark.functions.labels import add_labels, remove_labels
        from beamium_spark.sources.gts import read_gts, read_prometheus

        parts = []
        for src in self.sources:
            sc = src.conf
            whitelist = "|".join(sc.metrics) if sc.metrics else None
            if sc.format == "sensision":
                pts = read_gts(
                    self.spark, src.path, metric_whitelist=whitelist,
                    continuation=True, metrics_only=True,
                )
            else:
                pts = read_prometheus(
                    self.spark, src.path, now_us=self.now_us,
                    metric_whitelist=whitelist,
                )
            if sc.labels:
                pts = pts.withColumn("labels", add_labels(F.col("labels"), sc.labels))
            if sc.drop_label_keys:  # scraper filtered_labels (scraper.rs:212)
                pts = pts.withColumn(
                    "labels", remove_labels(F.col("labels"), sc.drop_label_keys)
                )
            parts.append(pts.select("ts", "metric", "labels", "value"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---- discovery (R2): chunks not yet committed for every sink ----------

    def pending_chunks(self, points: DataFrame) -> list:
        src_counts = (
            points.groupBy(F.date_trunc("hour", "ts").alias("chunk_start"))
            .agg(F.count("*").alias("n_points"))
            .cache()
        )
        src_chunks = src_counts.select("chunk_start")
        # a chunk is pending unless committed for ALL sinks (beamium only
        # deletes the source file after every sink write, src/router.rs:86-104)
        committed_all = None
        for sink in self.conf.sinks:
            c = self.manifest.committed_chunks(sink.table)
            committed_all = c if committed_all is None else committed_all.join(
                c, "chunk_start", "left_semi"
            )
        if committed_all is None:
            out = src_chunks
        else:
            new = src_chunks.join(committed_all, "chunk_start", "left_anti")
            # late lines in an already-routed hour: replay the chunk when
            # its point count drifts from the fence-time baseline (same
            # dirty-chunk semantics as RollupJob.dirty_chunks — beamium
            # re-forwards any new file regardless of its timestamps)
            if self.store.exists("chunk_counts"):
                rec = self.store.read("chunk_counts").select(
                    "chunk_start", F.col("n_points").alias("__rec")
                )
                dirty = (
                    committed_all.join(src_counts, "chunk_start")
                    .join(rec, "chunk_start", "left")
                    .filter(
                        F.col("__rec").isNull() | (F.col("__rec") != F.col("n_points"))
                    )
                    .select("chunk_start")
                )
            else:
                dirty = committed_all.join(
                    src_counts, "chunk_start", "left_semi"
                ).select("chunk_start")
            out = new.unionByName(dirty).distinct()
        result = sorted(r["chunk_start"] for r in out.collect())
        src_counts.unpersist()
        return result

    def _record_chunk_counts(self, points: DataFrame, pending: list) -> None:
        counts = (
            points.filter(F.date_trunc("hour", "ts").isin(pending))
            .groupBy(F.date_trunc("hour", "ts").alias("chunk_start"))
            .agg(F.count("*").alias("n_points"))
        )
        self.store.write_chunks(counts, "chunk_counts", "chunk_start")

    # ---- one tick ----------------------------------------------------------

    def run_once(self) -> dict:
        run_id = new_run_id()
        points = self.scrape_points()
        pending = self.pending_chunks(points)
        report: dict = {"run_id": run_id, "chunks": len(pending)}
        if not pending:
            report["forwarded"] = {}
            return report
        self.manifest.record_event(run_id, "run_start", f"chunks={len(pending)}")
        batch = points.filter(F.date_trunc("hour", "ts").isin(pending))
        counts = route_multicast(
            batch, self.conf, self.store, self.manifest, run_id, pending
        )
        report["forwarded"] = counts
        # late-data baseline after every sink committed (crash before this
        # leaves the chunk count-less → dirty-once → idempotent replay)
        self._record_chunk_counts(points, pending)
        self.manifest.record_event(run_id, "run_complete")
        return report

    # ---- retention (K4/K5 per sink conf) -----------------------------------

    def apply_retention(self, now_ts: str) -> dict:
        out: dict = {}
        for sink in self.conf.sinks:
            if not self.store.exists(sink.table):
                continue
            r: dict = {}
            if sink.ttl_hours:
                # fractional hours pass through untruncated: a 30m ttl must
                # evict at now-30m, not at now (int() would wipe the table)
                r.update(ttl_evict(self.store, sink.table, now_ts, sink.ttl_hours))
            if sink.size_bytes:
                r.update(size_cap_evict(self.store, sink.table, sink.size_bytes))
            out[sink.table] = r
        return out

    def compact_if_needed(self) -> dict:
        """Per-tick incremental compaction over every sink table: chunks
        whose file count exceeds ``parameters.max_files_per_chunk`` are
        rewritten (each tick's dynamic-overwrite/append leaves new files
        per touched chunk — unbounded over a daemon's lifetime without
        this). Returns {table: compact report} for tables that compacted."""
        n = self.conf.parameters.max_files_per_chunk
        out: dict = {}
        for sink in self.conf.sinks:
            r = self.store.compact_if_over(sink.table, n)
            if r:
                out[sink.table] = r
        return out

    def record_reload(self) -> None:
        self.manifest.record_event(new_run_id(), "reload")
