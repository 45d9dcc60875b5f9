"""Deterministic sampling/splitting: reproducibility under repartition,
stratified fractions, split disjointness/exhaustiveness."""

import pyspark.sql.functions as F
import pytest

from beamium_spark.operators.sampling import (
    hash_sample,
    split_corpus,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang"
    )


def test_hash_sample_deterministic_under_repartition(spark, docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, 0.3).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.3).collect()
    )
    assert a == b and len(a) > 0


def test_hash_sample_fraction_approximate(spark, docs):
    n = docs.count()
    got = hash_sample(docs, 0.3).count()
    assert abs(got / n - 0.3) < 0.05


def test_hash_sample_seed_changes_set(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=2).collect()}
    assert a != b


def test_hash_sample_portable_matches_duckdb(spark, docs):
    """portable=True must reproduce bit-for-bit in DuckDB with plain SQL —
    the property that makes samples auditable outside Spark."""
    import duckdb

    got = sorted(
        r["doc_id"] for r in hash_sample(docs, 0.25, portable=True).collect()
    )
    want = [
        r[0]
        for r in duckdb.sql(
            """
            SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet'
            WHERE CAST(('0x' || substring(md5(doc_id::VARCHAR || '#42'), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0 < 0.25
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_stratified_fractions(spark, docs):
    fr = {"en": 0.2, "de": 1.0}
    out = stratified_sample(docs, fr, stratum_col="lang")
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("de", 0) == base.get("de", 0)  # kept whole
    assert abs(counts.get("en", 0) / base["en"] - 0.2) < 0.07
    # strata not listed drop entirely (default_fraction=0)
    assert set(counts) <= {"en", "de"}


def test_split_disjoint_exhaustive(spark, docs):
    out = split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).cache()
    n = docs.count()
    by = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(by.values()) == n  # exhaustive
    assert set(by) == {"train", "val", "test"}
    assert abs(by["train"] / n - 0.8) < 0.05
    # stable under repartition
    again = split_corpus(docs.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (
        out.join(again.withColumnRenamed("split", "s2"), "doc_id")
        .filter(F.col("split") != F.col("s2"))
        .count()
        == 0
    )


def test_validation_errors(spark, docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -0.1})
    with pytest.raises(ValueError):
        split_corpus(docs, {"a": 0.0})


def test_mix_corpora_fractions_and_determinism(spark):
    from pyspark.sql import Row

    from beamium_spark.operators.sampling import mix_corpora

    a = spark.createDataFrame([Row(doc_id=i, text=f"a{i}") for i in range(400)])
    b = spark.createDataFrame([Row(doc_id=i, text=f"b{i}") for i in range(400)])
    mix = mix_corpora([("a", a), ("b", b)], {"a": 3.0, "b": 1.0}, 200)
    rows = mix.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.mix_source, set()).add(r.doc_id)
    # expected fractions: a → 150/400, b → 50/400; hash sampling is
    # approximate at n=400, allow generous tolerance
    assert 100 <= len(by_src["a"]) <= 200
    assert 20 <= len(by_src["b"]) <= 90
    assert len(by_src["a"]) > len(by_src["b"])
    # overlapping id spaces draw INDEPENDENT samples (name-salted hash)
    assert by_src["a"] != by_src["b"]
    # deterministic under re-evaluation
    rows2 = mix_corpora([("a", a), ("b", b)], {"a": 3.0, "b": 1.0}, 200).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_mix_corpora_caps_and_validation(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from beamium_spark.operators.sampling import mix_corpora

    small = spark.createDataFrame([Row(doc_id=i) for i in range(5)])
    big = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    # small source can't fill its share: keeps everything, no upsampling
    mix = mix_corpora([("s", small), ("g", big)], {"s": 0.5, "g": 0.5}, 400)
    by = {r.mix_source for r in mix.collect()}
    got_s = mix.filter("mix_source = 's'").count()
    assert got_s == 5 and "g" in by
    with _pytest.raises(ValueError, match="must match"):
        mix_corpora([("s", small)], {"x": 1.0}, 10)
    with _pytest.raises(ValueError, match="positive"):
        mix_corpora([("s", small)], {"s": 0.0}, 10)
