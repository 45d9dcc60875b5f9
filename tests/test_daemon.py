"""Conf-driven daemon: two scrapers (prometheus + sensision dialects) fan
out through selector-filtered sinks; reruns are no-ops; retention applies
per-sink TTL; hot reload is recorded (reference process shape,
src/main.rs:47-104)."""

import pyspark.sql.functions as F
import pytest

from beamium_spark.conf import load_conf
from beamium_spark.plans.daemon import ScrapeDaemon, ScraperSource

NOW_US = 1735689600123456


@pytest.fixture()
def daemon(spark, tmp_path):
    prom_dir = tmp_path / "prom"
    prom_dir.mkdir()
    (prom_dir / "scrape-0.metrics").write_text(
        "# comment\n"
        'http_requests{code="200"} 10 1735689600000\n'
        'http_requests{code="500"} 2 1735693200000\n'
        "cpu_load 0.5 1735689600000\n"
        "bad_value nan\n"
    )
    gts_dir = tmp_path / "gts"
    gts_dir.mkdir()
    (gts_dir / "node-0.metrics").write_text(
        "1735689600000000// mem_used{host=a} 100\n"
        "=1735693200000000// 110\n"
        "1735689600000000// cpu_load{host=a} 0.25\n"
    )
    conf = load_conf(
        {
            "scrapers": {
                "web": {"format": "prometheus", "labels": {"dc": "gra"}},
                "node": {"format": "sensision"},
            },
            "sinks": {
                "all_metrics": {"table": "all_metrics", "ttl": 7200},
                "cpu_only": {"table": "cpu_only", "selector": "cpu_"},
            },
            "labels": {"env": "test"},
        }
    )
    sources = [
        ScraperSource(conf.scrapers[0], str(prom_dir)),
        ScraperSource(conf.scrapers[1], str(gts_dir)),
    ]
    return ScrapeDaemon(spark, conf, sources, str(tmp_path / "state"), NOW_US)


def test_daemon_routes_by_selector_and_resumes(spark, daemon):
    r1 = daemon.run_once()
    assert r1["chunks"] == 2  # two distinct hours across the fixtures
    # nan dropped (F2); comment dropped (F1): 3 prom + 3 gts points total
    assert r1["forwarded"]["all_metrics"] == 6
    # selector ^cpu_ matches cpu_load from BOTH dialects
    assert r1["forwarded"]["cpu_only"] == 2

    allm = daemon.store.read("all_metrics")
    # global + per-scraper labels applied; sensision rows lack dc
    prom_rows = allm.filter(F.col("labels")["dc"] == "gra")
    assert prom_rows.count() == 3
    assert allm.filter(F.col("labels")["env"] != "test").count() == 0
    # continuation line inherited mem_used's class+labels
    mem = allm.filter(F.col("metric") == "mem_used").orderBy("ts").collect()
    assert [r["value"] for r in mem] == [100.0, 110.0]
    assert all(r["labels"]["host"] == "a" for r in mem)

    # rerun: all chunks committed for every sink -> no-op
    r2 = daemon.run_once()
    assert r2["chunks"] == 0

    # retention: all_metrics has ttl 2h; "now" = +2d evicts everything
    out = daemon.apply_retention("2025-01-03T00:00:00")
    assert out["all_metrics"]["expired_partitions"] >= 1 or out[
        "all_metrics"
    ]["expired_rows"] >= 1
    # reload marker feeds the beamium_reload_count analogue
    daemon.record_reload()
    events = {r["event"] for r in daemon.manifest.run_events().collect()}
    assert "reload" in events and "run_complete" in events


def test_daemon_late_lines_replay_dirty_chunk(spark, daemon, tmp_path):
    r1 = daemon.run_once()
    assert r1["chunks"] == 2
    assert daemon.run_once()["chunks"] == 0  # clean rerun no-op
    # a late line lands in the ALREADY-ROUTED first hour
    gts_dir = tmp_path / "gts"
    (gts_dir / "node-late.metrics").write_text(
        "1735689600000000// mem_used{host=b} 50\n"
    )
    r3 = daemon.run_once()
    assert r3["chunks"] == 1  # only the dirty hour replays
    assert daemon.run_once()["chunks"] == 0  # new baseline sticks
    # the sink now holds the late point too
    got = daemon.store.read("all_metrics")
    assert got.filter(F.col("metric") == "mem_used").count() == 3


def test_daemon_compaction_bounds_file_counts(spark, daemon, tmp_path):
    """≥10 ticks of small appends into one hot chunk: with the per-tick
    compaction trigger, no chunk's parquet file count may exceed the
    configured max — the long-lived-store guarantee a streaming/daemon
    deployment needs (without it, each tick leaves at least one new file
    per touched chunk forever)."""
    daemon.conf.parameters.max_files_per_chunk = 3
    daemon.run_once()
    # 10 ticks, each appending a tiny new file into the same hot chunk of
    # both sinks (simulating per-epoch sink writes)
    hot = daemon.store.read("all_metrics").limit(1).cache()
    hot.count()
    for tick in range(10):
        for table in ("all_metrics", "cpu_only"):
            hot.write.mode("append").partitionBy("chunk_key").parquet(
                daemon.store.path(table)
            )
        report = daemon.compact_if_needed()
        for table in ("all_metrics", "cpu_only"):
            counts = daemon.store.chunk_file_counts(table)
            assert counts, f"{table} vanished at tick {tick}"
            assert max(counts.values()) <= 3, (
                f"tick {tick}: {table} chunk exceeded file cap: {counts}"
            )
    hot.unpersist()
    # and the data survived every compaction pass
    assert daemon.store.read("all_metrics").count() > 0
