"""beamium_spark — a PySpark-native time-series rollup + downsample +
retention engine.

Semantics derive from ovh/beamium (a Rust scrape→relabel→route→forward
metrics daemon, see /root/reference); the architecture is Spark-first:
DataFrame/Catalyst logical plans, vectorized Arrow UDFs only where
built-ins cannot express the semantics, explicit partitioning on
(url-bucket, time-chunk), and a checkpoint manifest standing in for
beamium's disk-fail-over queue.

Layout:
    sources/    synthetic web_pages generator, table adapter, loaders
    functions/  column-level label algebra + Prometheus transcompile
    operators/  extract, rollup tiers, gap-fill, codec, retention,
                dedup, similarity, text stats, multimodal plumbing
    plans/      checkpoint manifest, job driver, metrics/lineage
    streaming/  Structured Streaming variant of the rollup
"""

__version__ = "0.1.0"
