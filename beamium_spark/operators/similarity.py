"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``   — brute-force exact top-k per query: broadcast the
                      query set, JVM-side dot products via ``F.zip_with``/
                      ``F.aggregate``, per-query ``row_number`` window.
                      The correctness baseline; O(n·q).
- ``lsh_topk``      — random-hyperplane LSH (sign bits of seeded
                      projections) bucketing; candidates searched only
                      within matching buckets (+ optional multi-probe on
                      1-bit flips). The scale path: shuffle keyed on
                      bucket, candidate count ~n/2^bits per probe.
- ``ivf_topk``      — IVF-style coarse quantizer: k seed centroids chosen
                      deterministically, vectors assigned to nearest
                      centroid (one broadcast join), queries probe the
                      ``nprobe`` nearest centroids only.

All distance math stays in Catalyst expressions (zip_with + aggregate →
whole-stage codegen); no Python in the hot path. Cosines are rounded to
9 dp for engine-neutral ordering; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k: (query_id, vec_id, cos, rank). Query set broadcast —
    the data side never shuffles; one window per query partition."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("v_vec")), 9).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(
            proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (plus ``multiprobe`` 1-bit-flip neighbor buckets). Recall improves with
    probes; cost ~ (1+probes)·n/2^bits candidates per query."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("b0"),
    )
    probe_buckets = F.array(
        F.col("b0"),
        *[
            F.col("b0").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(min(multiprobe, bits))
        ],
    )
    q = q_base.select(
        "query_id", "q_vec", F.explode(F.array_distinct(probe_buckets)).alias("bucket")
    )
    scored = (
        v.join(q, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("v_vec")), 9).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style: the first ``n_centroids`` vectors (by id — deterministic)
    act as the coarse codebook; vectors live in the inverted list of their
    nearest centroid; a query scans only its ``nprobe`` closest lists."""
    cents = (
        vectors.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("c_vec"))
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "v_vec", "cent_id",
            F.round(cosine(F.col("v_vec"), F.col("c_vec")), 9).alias("ccos"),
        )
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select("vec_id", "v_vec", "cent_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "q_vec", "cent_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 9).alias("qcos"),
        )
        .withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "q_vec", "cent_id")
    )
    scored = (
        assigned.join(probes, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("v_vec")), 9).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding-space near-dup
    detection. Brute-force form (oracle baseline); at scale, route through
    ``lsh_topk`` buckets first."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 9).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )
