"""Properties of the deterministic web_pages fixture (FIXTURES.md F-1)."""

import pyspark.sql.functions as F


def test_schema(tiny_web_pages):
    assert [(f.name, f.dataType.simpleString()) for f in tiny_web_pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]


def test_deterministic(spark, tmp_path):
    from beamium_spark.sources.synth import generate_web_pages

    p1 = generate_web_pages(0.0003, str(tmp_path / "a"))
    p2 = generate_web_pages(0.0003, str(tmp_path / "b"))
    df1 = spark.read.parquet(p1)
    df2 = spark.read.parquet(p2)
    assert df1.count() == df2.count()
    assert df1.exceptAll(df2).count() == 0


def test_recrawl_text_byte_identical(tiny_web_pages):
    # the end-to-end invariant: every reappearance of a url carries the
    # exact same text bytes (BASELINE.json input_hint)
    bad = (
        tiny_web_pages.groupBy("url")
        .agg(F.countDistinct(F.sha2(F.col("text"), 256)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert bad == 0
    # and re-crawls exist at all
    dups = tiny_web_pages.groupBy("url").count().filter("count > 1").count()
    assert dups > 0


def test_hot_site_share(tiny_web_pages):
    total = tiny_web_pages.count()
    hot = tiny_web_pages.filter(F.col("url").startswith("https://site0000.")).count()
    assert hot / total >= 0.25  # zipf + boost → one hot url-bucket


def test_text_extractable_from_html(tiny_web_pages):
    # html == b"<html><body>" + text + b"</body></html>" (or b"" edge row)
    bad = tiny_web_pages.filter(
        (F.length("html") > 0)
        & (
            F.decode(
                F.substring(
                    F.col("html"), 13, F.greatest(F.length("html") - 26, F.lit(0))
                ),
                "UTF-8",
            )
            != F.col("text")
        )
    ).count()
    assert bad == 0


def test_single_point_series(tiny_web_pages):
    assert (
        tiny_web_pages.filter(F.col("url").startswith("https://site0199.")).count() == 1
    )


def test_gap_present(tiny_web_pages):
    # site 3 has no rows inside the forced 17-minute silence
    from beamium_spark.sources.synth import BASE_TS_US

    gap_start = (BASE_TS_US + 2 * 3600 * 1000000) // 1000000
    gap_end = gap_start + 17 * 60
    n = tiny_web_pages.filter(
        F.col("url").startswith("https://site0003.")
        & (F.unix_timestamp("warc_ts") >= gap_start)
        & (F.unix_timestamp("warc_ts") < gap_end)
    ).count()
    assert n == 0
