"""Hashed TF-IDF vectorization: deterministic weights, dense assembly,
and end-to-end compatibility with the similarity operators."""

import math

import pyspark.sql.functions as F
import pytest

from beamium_spark.operators.vectorize import assemble_dense, hashed_tfidf


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple banana apple"),      # near-identical to 1
            (4, "durian elderberry fig"),   # unrelated
        ],
        "doc_id long, text string",
    )


def test_tfidf_weights(spark, docs):
    sp = hashed_tfidf(docs, dim=64)
    rows = {(r["id"], r["bucket"]): r["weight"] for r in sp.collect()}
    # doc 1: 'apple' tf=2; its bucket weight = 2 * (ln(5/(df+1)) + 1)
    # apple appears in docs 1 and 3 -> df=2 for its bucket (no collisions
    # at this vocab size), idf = ln(5/3)+1
    apple_weights = [w for (i, b), w in rows.items() if i == 1 and w > 2]
    assert len(apple_weights) == 1
    assert math.isclose(apple_weights[0], 2 * (math.log(5 / 3) + 1), rel_tol=1e-9)


def test_dense_assembly_and_norm(spark, docs):
    dense = assemble_dense(hashed_tfidf(docs, dim=32), dim=32)
    vecs = {r["id"]: r["vec"] for r in dense.collect()}
    for v in vecs.values():
        assert len(v) == 32
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
    # identical docs -> identical vectors; unrelated -> orthogonal-ish
    assert vecs[1] == vecs[3]
    dot_14 = sum(a * b for a, b in zip(vecs[1], vecs[4]))
    assert dot_14 < 0.2


def test_tfidf_feeds_similarity_ops(spark, docs):
    """The dense vectors plug straight into cosine_topk: each doc's
    nearest neighbour is its duplicate (or its closest shared-vocab
    doc), proving the bridge to the ANN operators."""
    from beamium_spark.operators.similarity import cosine_topk

    dense = assemble_dense(hashed_tfidf(docs, dim=32), dim=32).select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    qs = dense.filter(F.col("vec_id") == 1)
    top = cosine_topk(dense, qs, k=2).collect()
    got = [(r["vec_id"], r["rank"]) for r in top]
    # self-matches are excluded: rank 1 is the identical doc 3 (cos 1.0),
    # rank 2 the shared-vocab doc 2
    assert (3, 1) in got and (2, 2) in got
    assert math.isclose(
        [r["cos"] for r in top if r["vec_id"] == 3][0], 1.0, rel_tol=1e-9
    )


def test_empty_doc_zero_vector(spark):
    docs = spark.createDataFrame([(9, "   ")], "doc_id long, text string")
    sp = hashed_tfidf(docs, dim=8)
    assert sp.count() == 0  # no tokens -> no sparse rows
    # dense assembly of an absent doc is the caller's concern (left join);
    # a doc with rows but zero weight stays zero, never NaN
    zero = spark.createDataFrame([(9, 0, 0.0)], "id long, bucket int, weight double")
    v = assemble_dense(zero, dim=8).collect()[0]["vec"]
    assert v == [0.0] * 8


def test_tfidf_lazy_and_precomputed_n_match(spark, docs):
    """The lazy corpus-count branch (N derived inside the plan) and the
    precomputed n_docs fast path produce identical weights, and the lazy
    form triggers no driver job at build time."""
    lazy = hashed_tfidf(docs, dim=64)          # no action should run here
    pre = hashed_tfidf(docs, dim=64, n_docs=4)
    a = {(r["id"], r["bucket"]): r["weight"] for r in lazy.collect()}
    b = {(r["id"], r["bucket"]): r["weight"] for r in pre.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-12)
