"""GTS text source/sink round-trip + Prometheus file scrape + conf loading."""

import os

import pyspark.sql.functions as F
import pytest

from beamium_spark.sources.gts import read_gts, read_prometheus, write_gts


@pytest.fixture()
def points(spark, tiny_web_pages):
    from beamium_spark.operators.extract import extract_points

    return (
        extract_points(tiny_web_pages.limit(200), bucket_mode="site")
        .select("ts", "metric", "labels", "value")
        .cache()
    )


def test_gts_roundtrip(spark, points, tmp_path):
    out = str(tmp_path / "gts")
    write_gts(points, out)
    back = read_gts(spark, out)
    cols = ["ts", "metric", "value"]
    assert back.count() == points.count()
    assert points.select(cols).exceptAll(back.select(cols)).count() == 0
    # labels survive the text round-trip
    lang = back.select(F.col("labels")["lang"].alias("l")).filter(F.col("l").isNull())
    assert lang.count() == 0


def test_gts_selector_and_whitelist(spark, points, tmp_path):
    out = str(tmp_path / "gts2")
    write_gts(points, out)
    only_doc = read_gts(spark, out, selector="doc_")
    assert set(r["metric"] for r in only_doc.select("metric").distinct().collect()) == {
        "doc_count"
    }
    wl = read_gts(spark, out, metric_whitelist="lang_rate")
    assert all(
        r["metric"].startswith("lang_rate:")
        for r in wl.select("metric").distinct().collect()
    )


def test_prometheus_file_scrape(spark, tmp_path):
    body = (
        "# HELP x\n"
        'http_total{code="200"} 10 1000\n'
        'http_total{code="500"} +Inf\n'
        "bare_metric 7\n"
    )
    p = tmp_path / "scrape.txt"
    p.write_text(body)
    pts = read_prometheus(spark, str(p), now_us=42).orderBy("metric").collect()
    assert len(pts) == 2
    assert pts[0]["metric"] == "bare_metric" and pts[0]["value"] == 7.0
    assert pts[1]["metric"] == "http_total" and pts[1]["labels"]["code"] == "200"
    assert str(pts[1]["ts"]) == "1970-01-01 00:00:01"  # 1000 ms → 1e6 µs


def test_conf_loading(tmp_path, monkeypatch):
    from beamium_spark.conf import load_conf

    monkeypatch.setenv("MY_DC", "gra")
    monkeypatch.setenv("BEAMIUM_LABEL_rack", "r42")
    cfg = {
        "scrapers": {
            "node": {"format": "prometheus", "period": 10000,
                     "metrics": ["^node_"], "labels": {"dc": "env:MY_DC"}}
        },
        "sinks": {"warp": {"selector": "node_", "ttl": 7200, "size": 1048576}},
        "parameters": {"batch-size": 1000, "backoff": {"initial": 100}},
        "labels": {"team": "obs"},
    }
    conf = load_conf(cfg)
    assert conf.scrapers[0].period_s == 10
    assert conf.scrapers[0].labels == {"dc": "gra"}
    assert conf.sinks[0].ttl_hours == 2.0
    assert conf.parameters.batch_size == 1000
    assert conf.parameters.backoff_initial_s == 0.1
    assert conf.labels == {"team": "obs", "rack": "r42"}

    # JSON file path form
    import json
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    assert load_conf(str(p)).scrapers[0].name == "node"

    # env:VAR that is undefined → error (conf.rs:596-601 semantics)
    cfg_bad = {"labels": {"x": "env:DOES_NOT_EXIST_123"}}
    with pytest.raises(KeyError):
        load_conf(cfg_bad)


def test_gts_continuation_lines(spark, tmp_path):
    body = (
        "1735689600000000// cpu{host=a,dc=gra} 1.5\n"
        "=1735689660000000// 2.5\n"
        "=1735689720000000// 3.5\n"
        "1735689600000000// mem{host=b} 7\n"
        "=1735689660000000// 8\n"
    )
    p = tmp_path / "c.metrics"
    p.write_text(body)
    pts = read_gts(spark, str(tmp_path), continuation=True, metrics_only=True)
    rows = sorted(
        (r["metric"], int(r["ts"].timestamp()), r["value"], r["labels"].get("host"))
        for r in pts.collect()
    )
    assert rows == [
        ("cpu", 1735689600, 1.5, "a"),
        ("cpu", 1735689660, 2.5, "a"),
        ("cpu", 1735689720, 3.5, "a"),
        ("mem", 1735689600, 7.0, "b"),
        ("mem", 1735689660, 8.0, "b"),
    ]
    # default (non-continuation) reader drops '=' lines instead of
    # mis-parsing them
    flat = read_gts(spark, str(tmp_path))
    assert flat.count() == 2


def test_metrics_only_glob(spark, tmp_path):
    (tmp_path / "a.metrics").write_text("1735689600000000// cpu{} 1\n")
    (tmp_path / "b.txt").write_text("1735689600000000// cpu{} 2\n")
    assert read_gts(spark, str(tmp_path), metrics_only=True).count() == 1
    assert read_gts(spark, str(tmp_path)).count() == 2


def test_conf_formats_and_layering(tmp_path):
    from beamium_spark.conf import load_conf, load_conf_layered

    (tmp_path / "a.toml").write_text(
        '[parameters]\n"batch-size" = 1000\n"batch-count" = 9\n'
    )
    (tmp_path / "b.hjson").write_text(
        '{\n// comment\n# another\n"parameters": {"batch-size": 2000,},\n}\n'
    )
    (tmp_path / "c.ini").write_text("[labels]\ndc = gra\n")
    assert load_conf_layered([str(tmp_path / "a.toml")]).parameters.batch_size == 1000
    merged = load_conf_layered([str(tmp_path / "a.toml"), str(tmp_path / "b.hjson")])
    # later layer wins per key; untouched keys survive
    assert merged.parameters.batch_size == 2000
    assert merged.parameters.batch_count == 9
    ini = load_conf(str(tmp_path / "c.ini"))
    assert ini.labels["dc"] == "gra"


def test_conf_watch_debounce(tmp_path):
    from beamium_spark.conf import watch_and_rerun

    p = tmp_path / "cfg.json"
    p.write_text('{"labels": {"v": "1"}}')
    seen = []
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s
        # mutate the file on the 2nd poll; the change must only fire after
        # the 2s debounce has elapsed, and exactly once
        if len(seen) == 0 and clock["t"] >= 1.0 and p.read_text().find("2") < 0:
            p.write_text('{"labels": {"v": "2"}}')

    import time
    real_monotonic = time.monotonic
    time.monotonic = lambda: clock["t"]
    try:
        n = watch_and_rerun(
            str(p), lambda c: seen.append(c.labels["v"]),
            poll_s=0.5, debounce_s=2.0, max_iters=12, sleep=fake_sleep,
        )
    finally:
        time.monotonic = real_monotonic
    assert n == 1 and seen == ["2"]


def test_conf_reference_sample_shape(tmp_path):
    """A config written in the reference's own sample style — humanized
    durations/sizes (60s, 1h, 100Gb, 2Kb, 500ms), filtered_labels,
    selectors — loads with the documented semantics."""
    from beamium_spark.conf import load_conf

    (tmp_path / "config.yaml").write_text(
        """
scrapers:
  scraper1:
    url: http://127.0.0.1:9100/metrics
    period: 60s
    format: prometheus
    labels:
      dc: gra
    filtered_labels:
      - jobid
    metrics:
      - node.*
sinks:
  source1:
    url: WARP10_ENDPOINT
    token: WARP10_TOKEN
    selector: metrics.*
    ttl: 1h
    size: 100Gb
    parallel: 1
labels:
  env: prod
parameters:
  scan-period: 1s
  batch-count: 250
  batch-size: 2Kb
  backoff:
    initial: 500ms
    max: 1m
    multiplier: 1.5
    randomization: 0.3
"""
    )
    c = load_conf(str(tmp_path / "config.yaml"))
    s = c.scrapers[0]
    assert s.period_s == 60 and s.format == "prometheus"
    assert s.labels == {"dc": "gra"} and s.drop_label_keys == ["jobid"]
    assert s.metrics == ["node.*"]
    k = c.sinks[0]
    assert k.selector == "metrics.*" and k.ttl_hours == 1.0
    assert k.size_bytes == 100_000_000_000
    assert c.labels["env"] == "prod"
    p = c.parameters
    assert p.scan_period_s == 1.0 and p.batch_size == 2000
    assert p.backoff_initial_s == 0.5 and p.backoff_max_s == 60.0
