"""Multicast router: per-sink selector copies, global labels, commit-after-all."""

import pyspark.sql.functions as F

from beamium_spark.conf import EngineConf, ParametersConf, SinkConf
from beamium_spark.operators.extract import extract_points
from beamium_spark.plans.router import route_multicast, sink_filter
from beamium_spark.sources.tables import ParquetTierStore


def test_route_multicast(spark, tiny_web_pages, tmp_path):
    points = extract_points(tiny_web_pages.limit(300), bucket_mode="site")
    conf = EngineConf(
        sinks=[
            SinkConf(name="docs", table="sink_docs", selector="doc_"),
            SinkConf(name="langs", table="sink_langs", selector="lang_rate"),
            SinkConf(name="all", table="sink_all", selector=None),
        ],
        parameters=ParametersConf(),
        labels={"dc": "gra"},
    )
    store = ParquetTierStore(spark, str(tmp_path / "s"))
    counts = route_multicast(points, conf, store)

    docs = store.read("sink_docs")
    assert set(r["metric"] for r in docs.select("metric").distinct().collect()) == {
        "doc_count"
    }
    assert counts["docs"] == docs.count() == 300
    langs = store.read("sink_langs")
    assert all(
        r["metric"].startswith("lang_rate:")
        for r in langs.select("metric").distinct().collect()
    )
    assert store.read("sink_all").count() == 4 * 300
    # global labels applied before routing (router P3)
    assert docs.filter(F.col("labels")["dc"] != "gra").count() == 0


def test_sink_selector_is_anchored(spark, tiny_web_pages):
    # reference anchors the selector at start-of-class (conf.rs:329-336):
    # selector "count" must NOT match metric "doc_count"
    points = extract_points(tiny_web_pages.limit(50), bucket_mode="site")
    filtered = sink_filter(points, SinkConf(name="x", selector="count"))
    assert filtered.count() == 0
