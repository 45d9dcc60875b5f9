"""Similarity search: brute-force exactness, LSH/IVF recall, near-dup pairs."""

import pytest
from pyspark.sql import functions as F

from beamium_spark.operators.similarity import (
    cosine,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(vecs):
    return vecs.orderBy("vec_id").limit(5)


def test_cosine_column(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    out = [r["c"] for r in df.select(F.round(cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert out == [1.0, 0.0, 1.0]


def test_brute_topk_shape(vecs, queries):
    out = cosine_topk(vecs, queries, k=10).cache()
    assert out.groupBy("query_id").count().filter("count != 10").count() == 0
    # rank 1 has the max cos per query
    mx = out.groupBy("query_id").agg(F.max("cos").alias("m"))
    r1 = out.filter("rank = 1").join(mx, "query_id")
    assert r1.filter(F.col("cos") != F.col("m")).count() == 0
    # self excluded
    assert out.filter(F.col("vec_id") == F.col("query_id")).count() == 0


def _recall(approx, exact, k):
    a = {(r["query_id"], r["vec_id"]) for r in approx.filter(F.col("rank") <= k).collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.filter(F.col("rank") <= k).collect()}
    return len(a & e) / len(e)


def test_lsh_recall(vecs, queries):
    exact = cosine_topk(vecs, queries, k=10).cache()
    # these embeddings are unclustered — few bits + multiprobe is the right
    # operating point (measured: 2 bits/2 probes → 0.82, 8 bits → 0.04)
    approx = lsh_topk(vecs, queries, k=10, bits=2, multiprobe=2, dim=64).cache()
    assert _recall(approx, exact, 10) >= 0.6


def test_lsh_topk_requires_dim(vecs, queries):
    with pytest.raises(ValueError, match="dim"):
        lsh_topk(vecs, queries, k=10, bits=2)


def test_ivf_recall(vecs, queries):
    exact = cosine_topk(vecs, queries, k=10).cache()
    approx = ivf_topk(vecs, queries, k=10, n_centroids=8, nprobe=6).cache()
    assert _recall(approx, exact, 10) >= 0.9


def test_near_dup_pairs_symmetric_threshold(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = embedding_near_dup_pairs(df, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_ivf_kmeans_refined_recall(vecs, queries):
    exact = cosine_topk(vecs, queries, k=10).cache()
    approx = ivf_topk(vecs, queries, k=10, n_centroids=8, nprobe=6, kmeans_iters=1).cache()
    assert _recall(approx, exact, 10) >= 0.9


def test_ivf_plan_has_no_crossjoin(vecs, queries):
    # the round-1 shape shuffled n·n_centroids rows through a per-vector
    # window; the assignment is now a pure projection over a broadcast
    # codebook — no cartesian/nested-loop join anywhere in the plan
    plan = ivf_topk(vecs, queries, k=10, n_centroids=8, nprobe=6)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _planted(vecs):
    base = vecs.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    pert = vecs.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x.cast("double") + 0.01 * ((i % 5) - 2).cast("double")
        ).alias("embedding"),
    )
    return base.unionByName(pert)


def test_near_dup_lsh_equals_bruteforce_on_planted(spark, vecs):
    from beamium_spark.operators.similarity import embedding_near_dup_lsh

    planted = _planted(vecs).cache()
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(planted, threshold=0.95).collect()
    }
    lsh = embedding_near_dup_lsh(planted, threshold=0.95, dim=64).cache()
    got = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    n = vecs.count()
    assert len(brute) == n  # exactly the planted (v, v') pairs
    assert got == brute  # recall 1.0 at this threshold (P[miss] ~ 1e-23)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_groups_and_survivors(spark):
    from beamium_spark.operators.similarity import semantic_dedup

    # ids 1 and 2 seed the 2-cell codebook (region archetypes); the
    # near-dups arrive later and must land in their archetype's cell
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),     # region A seed
        (2, [0.0, 1.0, 0.0, 0.0]),     # region B seed
        (3, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 1
        (4, [0.0, 0.98, 0.02, 0.0]),   # near-dup of 2
        (5, [0.0, 0.0, 1.0, 0.0]),     # singleton
        (6, [0.5, 0.5, 0.0, 0.0]),     # cos 0.707 vs 1 — below threshold
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r for r in semantic_dedup(vecs, threshold=0.95, n_clusters=2).collect()}
    assert len(out) == 6
    assert out[3].rep == 1 and not out[3].keep
    assert out[4].rep == 2 and not out[4].keep
    for i in (1, 2, 5, 6):
        assert out[i].rep == i and out[i].keep
    # near-dup pairs must share a cell for within-cluster search to see them
    assert out[1].cent_id == out[3].cent_id
    assert out[2].cent_id == out[4].cent_id


def test_semantic_dedup_transitive_chain(spark):
    import math

    import pytest as _pytest

    from beamium_spark.operators.similarity import semantic_dedup

    # angles 0°,10°,20°: cos(10°)≈0.985 ≥ 0.97 links neighbors, but
    # cos(20°)≈0.940 < 0.97 — a≈b≈c must still collapse to ONE group
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    vecs = spark.createDataFrame(
        [(10, v(0)), (11, v(10)), (12, v(20))],
        "vec_id long, embedding array<double>",
    )
    out = {r.id: r for r in semantic_dedup(vecs, threshold=0.97, n_clusters=1).collect()}
    assert out[10].rep == 10 and out[11].rep == 10 and out[12].rep == 10
    assert out[10].keep and not out[11].keep and not out[12].keep

    with _pytest.raises(ValueError, match="threshold"):
        semantic_dedup(vecs, threshold=0.0)
