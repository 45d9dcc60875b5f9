from pyspark.sql import functions as F

from beamium_spark.operators.extract import extract_points, text_invariant_violations


def test_points_shape(spark, tiny_web_pages):
    pts = extract_points(tiny_web_pages, bucket_mode="site")
    assert pts.columns == ["bucket", "metric", "labels", "ts", "value", "url", "lang"]
    n_pages = tiny_web_pages.count()
    assert pts.count() == 4 * n_pages  # 4 metrics per page


def test_doc_count_values(spark, tiny_web_pages):
    pts = extract_points(tiny_web_pages, bucket_mode="site")
    dc = pts.filter(F.col("metric") == "doc_count")
    assert dc.filter(F.col("value") != 1.0).count() == 0


def test_byte_size_matches_html_length(spark, tiny_web_pages):
    pts = extract_points(tiny_web_pages, bucket_mode="site")
    pages = tiny_web_pages.select(
        F.col("url").alias("p_url"), F.col("warc_ts").alias("p_ts"), "html"
    )
    joined = (
        pts.filter(F.col("metric") == "byte_size")
        .join(pages, (F.col("url") == F.col("p_url")) & (F.col("ts") == F.col("p_ts")))
        .filter(F.col("value") != F.coalesce(F.length("html"), F.lit(0)).cast("double"))
    )
    assert joined.count() == 0


def test_metric_whitelist(spark, tiny_web_pages):
    pts = extract_points(tiny_web_pages, bucket_mode="site", metric_whitelist="^doc_")
    assert pts.select("metric").distinct().collect()[0]["metric"] == "doc_count"


def test_relabel_hooks(spark, tiny_web_pages):
    pts = extract_points(
        tiny_web_pages, bucket_mode="site",
        static_labels={"dc": "gra"}, drop_label_keys=["lang"],
    )
    row = pts.select(F.map_keys("labels").alias("k")).first()
    assert row["k"] == ["dc"]


def test_bucket_range(spark, tiny_web_pages):
    for mode in ("hash", "site"):
        pts = extract_points(tiny_web_pages, bucket_mode=mode)
        out_of_range = pts.filter((F.col("bucket") < 0) | (F.col("bucket") >= 64)).count()
        assert out_of_range == 0


def test_text_invariant_clean_on_fixture(spark, tiny_web_pages):
    assert text_invariant_violations(tiny_web_pages).count() == 0


def test_text_invariant_detects_corruption(spark, tiny_web_pages):
    # corrupt one url's text on its re-crawl → must be flagged
    corrupted = tiny_web_pages.withColumn(
        "text",
        F.when(
            F.col("url").startswith("https://site0000."), F.concat(F.col("text"), F.lit("X"))
        ).otherwise(F.col("text")),
    )
    # corrupting *all* rows of a url keeps per-url consistency but breaks
    # html↔text extraction parity → extraction_mismatch fires
    v = text_invariant_violations(corrupted)
    assert v.filter(F.col("violation") == "extraction_mismatch").count() > 0
