"""Plan-shape invariants: the properties that make queries survive a
100-1000x scale-up (docs/SCALE.md). These assert on the PHYSICAL plan —
a regression here is a silent 100-TB performance bug even when results
stay correct."""

import pyspark.sql.functions as F
import pytest

from beamium_spark.operators.extract import extract_points
from beamium_spark.operators.rollup import rollup_cascade, rollup_tier
from beamium_spark.sources.synth import ensure_web_pages


@pytest.fixture(scope="module")
def pages(spark):
    return spark.read.parquet(ensure_web_pages(0.0003))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_metric_selection_prunes_wide_columns(spark, pages):
    """A doc_count-only extract must never read html/text — at 100 TB
    that is ~99% of the table's bytes."""
    plan = _plan(
        rollup_tier(
            extract_points(pages, bucket_mode="site", metrics=("doc_count",)),
            "1 minute",
        )
    )
    import re

    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all("html" not in s and "text" not in s for s in schemas)


def test_ts_range_filter_reaches_scan(spark, pages):
    """The job's pending-chunk range predicate must land in PushedFilters
    so parquet row-group stats prune committed data."""
    df = pages.filter(
        (F.col("warc_ts") >= "2025-01-02") & (F.col("warc_ts") < "2025-01-03")
    ).select("url")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(warc_ts" in plan and "LessThan(warc_ts" in plan


def test_cascade_reads_tier_not_raw(spark, pages):
    """1h from 1m must aggregate the lower tier — exactly one scan of the
    raw table in the whole cascade plan."""
    plan = _plan(
        rollup_cascade(
            rollup_tier(extract_points(pages, bucket_mode="site"), "1 minute"),
            "1 hour",
        )
    )
    assert plan.count("FileScan parquet") == 1


def test_rollup_is_partial_plus_final(spark, pages):
    """The windowed rollup must be a two-phase hash aggregate around ONE
    exchange keyed on the group key (map-side combine bounds shuffle rows
    by key cardinality, not input size)."""
    plan = _plan(
        rollup_tier(extract_points(pages, bucket_mode="site"), "1 minute")
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_broadcast_for_small_dims(spark, pages):
    """Small side of the ANN candidate join must broadcast — no shuffle of
    the vector table against a 5-row query set."""
    from beamium_spark.operators.similarity import ivf_topk

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = vecs.orderBy("vec_id").limit(5)
    plan = _plan(ivf_topk(vecs, qs, k=5, n_centroids=4, nprobe=2))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
