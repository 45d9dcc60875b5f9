"""IcebergTierStore integration — the production store of the north_star.

Env-gated: set ``BEAMIUM_ICEBERG_PKG`` (e.g.
``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.1``) to run; the
sandbox has no network/jar, so the suite skips there and runs wherever the
package can resolve (a real cluster or a dev box with an ivy cache). The
assertions mirror tests/test_retention.py + the ParquetTierStore contract:
idempotent chunk overwrite, partition-level TTL drop, row-level trim.
"""

import datetime as dt
import os

import pytest

ICEBERG_PKG = os.environ.get("BEAMIUM_ICEBERG_PKG")

pytestmark = pytest.mark.skipif(
    not ICEBERG_PKG,
    reason="BEAMIUM_ICEBERG_PKG not set (Iceberg runtime jar unavailable)",
)


@pytest.fixture(scope="module")
def ice_spark(tmp_path_factory):
    from beamium_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    # BEAMIUM_ICEBERG_PKG accepts either maven coordinates (resolved via
    # ivy — needs network) or a local path to a vendored
    # iceberg-spark-runtime jar (no network needed)
    jar_conf = (
        {"spark.jars": ICEBERG_PKG}
        if ICEBERG_PKG.endswith(".jar")
        else {"spark.jars.packages": ICEBERG_PKG}
    )
    spark = get_spark(
        app_name="iceberg-it",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            **jar_conf,
            "spark.sql.catalog.it": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.it.type": "hadoop",
            "spark.sql.catalog.it.warehouse": wh,
        },
    )
    yield spark
    spark.stop()


@pytest.fixture()
def store(ice_spark):
    from beamium_spark.sources.tables import IcebergTierStore

    s = IcebergTierStore(ice_spark, "it", "beamium_test")
    yield s
    s.drop("tier")


def _tier_rows(spark, hours):
    rows = [
        (0, "doc_count", dt.datetime(2025, 1, 1 + h // 24, h % 24, 0),
         dt.datetime(2025, 1, 1 + h // 24, h % 24, 0), 1, 1.0)
        for h in hours
    ]
    return spark.createDataFrame(
        rows,
        "bucket int, metric string, window_start timestamp, "
        "chunk_start timestamp, cnt long, sum_value double",
    )


def test_chunk_overwrite_is_idempotent(ice_spark, store):
    df = _tier_rows(ice_spark, [0, 1, 2])
    store.write_chunks(df, "tier")
    assert store.read("tier").count() == 3
    store.write_chunks(df, "tier")  # replay: overwrite, not append
    assert store.read("tier").count() == 3
    # a partial replay touches only its own partitions
    store.write_chunks(_tier_rows(ice_spark, [1]), "tier")
    assert store.read("tier").count() == 3


def test_ttl_and_row_trim(ice_spark, store):
    from pyspark.sql import functions as F

    from beamium_spark.operators.retention import ttl_evict

    store.write_chunks(_tier_rows(ice_spark, [0, 1, 2, 25, 26, 49]), "tier")
    out = ttl_evict(store, "tier", "2025-01-03T02:00:00", 24)
    left = {r["chunk_start"] for r in store.read("tier").select("chunk_start").collect()}
    # everything older than 2025-01-02T02:00 evicted (chunk granularity)
    assert all(cs >= dt.datetime(2025, 1, 2, 2, 0) for cs in left)
    assert out["expired_partitions"] + out["expired_rows"] >= 3
    # row-level trim via delete_where directly
    n = store.delete_where("tier", F.col("bucket") == 0)
    assert n == len(left) and store.read("tier").count() == 0


def test_epoch_fence_and_compaction_trigger(ice_spark, store):
    """The streaming-sink and daemon contract methods on the Iceberg
    path: overwrite_partition replaces exactly the epoch partitions
    present in the frame (snapshot-isolated), chunk_file_counts reads the
    .files metadata table only, and compact_if_over rewrites exactly the
    over-threshold chunks."""
    from pyspark.sql import functions as F

    df = _tier_rows(ice_spark, [0, 1]).withColumn(
        "chunk_key", F.date_format("chunk_start", "yyyy-MM-dd-HH")
    )
    store.overwrite_partition(df, "tier", "chunk_key")
    assert store.read("tier").count() == 2
    # torn replay of one partition, then full redelivery → unchanged
    store.overwrite_partition(df.filter(F.col("bucket") < 0).unionByName(
        df.limit(1)
    ), "tier", "chunk_key")
    store.overwrite_partition(df, "tier", "chunk_key")
    assert store.read("tier").count() == 2

    # pile small appends into one chunk, then trigger compaction
    one = df.limit(1)
    for _ in range(4):
        store.append(one, "tier")
    counts = store.chunk_file_counts("tier")
    assert max(counts.values()) >= 4
    out = store.compact_if_over("tier", 2)
    assert out["chunks"] >= 1 and out["files_after"] <= out["files_before"]
    assert max(store.chunk_file_counts("tier").values()) <= 2
    assert store.read("tier").count() == 6
