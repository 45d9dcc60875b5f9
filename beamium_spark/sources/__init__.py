from beamium_spark.sources.synth import ensure_web_pages, web_pages_path  # noqa: F401
