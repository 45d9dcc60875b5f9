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
    # norms hoisted off the pair row (one per query / one per vector row
    # instead of one per SCORED PAIR; r6): cos stays the exact expression
    # dot/(norm_q*norm_v) — _norm is deterministic per array, so the value
    # is float-identical to computing it inline.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("__nq"),
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v_vec"),
        _norm(vec_col).alias("__nv"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_vec"), F.col("v_vec"))
                / (F.col("__nq") * F.col("__nv")),
                9,
            ).alias("cos"),
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
    """Sign-bit bucket id from random hyperplane projections. Projections
    are rounded to 9 dp before the sign test so the bucket id is
    engine-neutral (a DuckDB oracle computing the same literal-plane dot
    products lands in the same bucket even at float-noise boundaries)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.round(_dot(vec, F.array(*[F.lit(x) for x in p])), 9)
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
    probes; cost ~ (1+probes)·n/2^bits candidates per query.

    ``dim`` is required: deriving it would take a driver action (a
    ``.first()`` over the query set) at plan-build time — a hidden job in
    the middle of declaring a plan."""
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim= (the embedding dimension); deriving it "
            "would run a hidden driver action at plan-build time"
        )
    planes = _hyperplanes(dim, bits, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        _norm(vec_col).alias("__nv"),
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("b0"),
        _norm(vec_col).alias("__nq"),
    )
    probe_buckets = F.array(
        F.col("b0"),
        *[
            F.col("b0").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(min(multiprobe, bits))
        ],
    )
    q = q_base.select(
        "query_id",
        "q_vec",
        "__nq",
        F.explode(F.array_distinct(probe_buckets)).alias("bucket"),
    )
    # norms hoisted to the per-row projections above (not per candidate
    # pair); dot/(nq*nv) is float-identical to the inline cosine
    scored = (
        v.join(q, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_vec"), F.col("v_vec"))
                / (F.col("__nq") * F.col("__nv")),
                9,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _cent_lit(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vals])


def _nearest_centroid(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Shuffle-free argmax over a broadcast codebook: an array of
    (cos, -cent_id) structs reduced with ``array_max`` — struct ordering
    gives max cosine, ties to the SMALLEST cent_id (via negated id). Pure
    projection: no exchange, no window, whole-stage codegen."""
    entries = [
        F.struct(
            F.round(cosine(vec, _cent_lit(c)), 9).alias("c"),
            F.lit(-int(cid)).cast("long").alias("nid"),
        )
        for cid, c in cents
    ]
    return (-F.array_max(F.array(*entries))["nid"]).cast("long")


def _probe_centroids(vec: Column, cents: list[tuple[int, list[float]]], nprobe: int) -> Column:
    """The ``nprobe`` nearest centroid ids, best-first (ties → smaller id),
    as an array — again a pure projection over the broadcast codebook."""
    entries = [
        F.struct(
            F.round(cosine(vec, _cent_lit(c)), 9).alias("c"),
            F.lit(-int(cid)).cast("long").alias("nid"),
        )
        for cid, c in cents
    ]
    ranked = F.reverse(F.array_sort(F.array(*entries)))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: -s["nid"])


def train_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    kmeans_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Codebook for IVF: seeds are the first ``n_centroids`` vectors by id
    (deterministic); each ``kmeans_iters`` pass reassigns every vector with
    the shuffle-free argmax and recomputes element-wise means (one narrow
    posexplode aggregate per pass — shuffle rows = n·dim, keyed by
    (cent, dim), bounded by key cardinality k·dim on the reduce side).
    Means are rounded to 6 dp so the codebook is engine-reproducible.
    Empty cells keep their previous centroid."""
    seed_rows = (
        vectors.orderBy(id_col).limit(n_centroids).select(id_col, vec_col).collect()
    )
    cents = [(int(r[0]), [float(x) for x in r[1]]) for r in seed_rows]
    for _ in range(kmeans_iters):
        # two selects: a generator (posexplode) in the same projection as
        # struct-building expressions clobbers struct field aliases
        assigned = vectors.select(
            _nearest_centroid(
                F.transform(F.col(vec_col), lambda x: x.cast("double")), cents
            ).alias("cent_id"),
            F.col(vec_col).alias("__v"),
        ).select("cent_id", F.posexplode("__v").alias("pos", "val"))
        means = (
            assigned.groupBy("cent_id", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .collect()
        )
        by_cent: dict[int, dict[int, float]] = {}
        for r in means:
            by_cent.setdefault(int(r["cent_id"]), {})[int(r["pos"])] = float(r["m"])
        cents = [
            (
                cid,
                [by_cent[cid][i] for i in range(len(old))]
                if cid in by_cent
                else old,
            )
            for cid, old in cents
        ]
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style approximate top-k: vectors live in the inverted list of
    their nearest codebook centroid; a query scans only its ``nprobe``
    closest lists.

    Scale shape: centroid assignment is a **projection** against the
    broadcast codebook (no crossJoin, no per-vector window exchange — the
    round-1 n·n_centroids shuffle is gone); the only data shuffle is the
    (cent_id) candidate join, sized by the probed lists. With
    ``kmeans_iters=0`` the whole pipeline is deterministic from the input
    and carries a full DuckDB oracle; ``kmeans_iters≥1`` trains the
    codebook for recall (measured in tests/test_similarity.py and
    BENCH/BASELINE.md)."""
    cents = train_centroids(vectors, n_centroids, kmeans_iters, vec_col, id_col)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v_vec"),
        _norm(vec_col).alias("__nv"),
    ).withColumn("cent_id", _nearest_centroid(F.col("v_vec"), cents))
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("__nq"),
        F.explode(_probe_centroids(F.col(vec_col), cents, nprobe)).alias("cent_id"),
    )
    # norms hoisted off the candidate rows; dot/(nq*nv) float-identical
    scored = (
        v.join(F.broadcast(probes), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(
                _dot(F.col("q_vec"), F.col("v_vec"))
                / (F.col("__nq") * F.col("__nv")),
                9,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _band_keys_arrow(planes: list[list[float]], band_bits: int):
    """Arrow-vectorized banded bucket keys: one BLAS matmul computes every
    plane projection per batch, then sign bits pack into per-band keys.

    Projections are rounded to 9 dp before the sign test (same contract as
    :func:`lsh_bucket`), so keys are stable against summation-order float
    noise except within 5e-10 of a plane — and a key flip there only
    perturbs the CANDIDATE set; the exact-cosine verify filter fixes the
    output (a true near-dup pair at the operator's thresholds misses all
    bands w.p. ~1e-23, see ``embedding_near_dup_lsh``). r6: the previous
    per-dimension Python loop (64 allocations of an (n, 128) temp per
    batch, kept for bit-identical fold order) measured ~8× slower than the
    matmul for zero observed key difference on the gate corpora."""
    import numpy as np
    import pandas as pd

    P = np.array(planes, dtype=np.float64)  # (nplanes, dim)
    n_bands = len(planes) // band_bits
    weights = 1 << np.arange(band_bits, dtype=np.int64)

    def _fn(vs):
        V = np.vstack(vs.to_numpy()).astype(np.float64, copy=False)
        acc = V @ P.T
        bits = (np.round(acc, 9) >= 0).astype(np.int64)
        keys = bits.reshape(V.shape[0], n_bands, band_bits) @ weights
        return pd.Series(list(keys))

    return F.pandas_udf(_fn, "array<long>")


def embedding_near_dup_lsh(
    vectors: DataFrame,
    threshold: float = 0.95,
    bands: int = 16,
    band_bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH — the scale path.

    Each vector gets ``bands`` independent bucket keys of ``band_bits``
    sign bits; pairs colliding in ANY band become candidates; candidates
    are verified by exact cosine ≥ threshold. No crossJoin anywhere: the
    plan is a (band, key) self-equi-join over narrow (id, band, key) rows
    plus two id-joins to fetch vectors for the surviving candidates only.

    Recall: a pair at cosine c collides per band w.p. p^band_bits,
    p = 1 − arccos(c)/π; missing all bands = (1−p^r)^B — at the defaults
    and c ≥ 0.99 that is ~1e-23, so the output equals the brute-force
    answer for real near-duplicates (verified against the exact oracle in
    CORRECTNESS). Candidate count on far pairs stays ~n²·0.5^r·B /
    bucket-balance, i.e. pruned by ~2^8 per band vs all-pairs."""
    if dim is None:
        raise ValueError(
            "embedding_near_dup_lsh requires dim= (the embedding dimension); "
            "deriving it would run a hidden driver action at plan-build time"
        )
    planes = _hyperplanes(dim, bands * band_bits, seed)
    # cached: ``v`` feeds the band-key pass plus BOTH candidate vector
    # fetches, ``banded`` feeds both sides of the self-join — without the
    # cache each python-UDF subtree canonicalizes unequal (no
    # ReuseExchange), so the plan scanned the vector source 6× and ran the
    # band-key UDF twice (r6 plan audit). Caller owns the caches (same
    # contract as minhash_lsh_pairs' internal sigs cache).
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).cache()
    keys = _band_keys_arrow(planes, band_bits)(F.col("vec"))
    banded = v.select("id", F.posexplode(keys).alias("band", "key")).cache()
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    # norms ride the (broadcast) vector fetch: one _norm per VECTOR on the
    # build side instead of two per candidate pair (the candidate set is
    # ~100x the corpus at these banding params — r6 measured the verify
    # stage dominated by the interpreted norm folds). cos stays the exact
    # expression dot/(norm_a*norm_b): _norm is deterministic per array, so
    # hoisting it off the pair row is float-identical.
    va = v.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"), _norm("vec").alias("__na")
    )
    vb = v.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"), _norm("vec").alias("__nb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb")), 9
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding-space near-dup
    detection, brute-force O(n²) form. **Oracle/baseline only**: the
    production path is ``embedding_near_dup_lsh`` (banded hyperplane LSH,
    no crossJoin)."""
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


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    kmeans_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iters: int = 20,
) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al., arXiv
    2303.09540): k-means-partition the embedding space with the IVF
    codebook, then look for near-duplicate pairs ONLY within each
    cluster — pairwise cost drops from O(n²) to Σ|cluster|², and the
    paper's observation is that semantic duplicates land in the same
    cell. Duplicate groups collapse to one representative: pairs with
    cosine ≥ ``threshold`` form edges, connected components resolve
    transitive groups (a≈b≈c is ONE group even when cos(a,c) dips under
    the threshold), the min-id member survives.

    Output: one row per input vector — (id, cent_id, rep, keep) with
    ``keep = (rep == id)``; ``vectors.filter(keep)`` is the deduped
    corpus, ``rep`` the join key back to the survivor.

    Scale shape: centroid assignment is a pure projection against the
    broadcast codebook (no exchange — :func:`_nearest_centroid`); the
    only data shuffle keys on ``cent_id`` for the within-cluster
    self-join. Pick ``n_clusters ∝ corpus/target_cell_size`` (SemDeDup
    uses 50k cells for ~1B embeddings) so cells stay ~10³-10⁴ vectors;
    a skewed cell costs |cell|² pairs — if the space is known to
    collapse onto few modes, prefer
    :func:`embedding_near_dup_lsh` + :func:`~beamium_spark.operators.
    dedup.cluster_representatives`, whose banding bounds candidate
    fan-out per bucket. With ``kmeans_iters=0`` the codebook is the
    deterministic first-``n_clusters`` seeds and the whole pipeline is
    DuckDB-reproducible (the gate oracle re-derives codebook,
    assignment, pairs, and components in SQL); ``kmeans_iters≥1``
    trains the cells for recall.

    Components reuse :func:`~beamium_spark.operators.dedup.
    cluster_representatives` (pointer-jumping, O(log diameter) rounds,
    ``max_iters`` bound).
    """
    from beamium_spark.operators.dedup import cluster_representatives

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    cents = train_centroids(vectors, n_clusters, kmeans_iters, vec_col, id_col)
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("cent_id", _nearest_centroid(F.col("v"), cents))
    # norms hoisted to one per vector row (the within-cell join emits
    # Σ|cell|² pair rows; dot/(na*nb) is float-identical to inline cosine)
    left = v.select(
        "cent_id",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        _norm("v").alias("__na"),
    )
    right = v.select(
        "cent_id",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        _norm("v").alias("__nb"),
    )
    pairs = (
        left.join(right, "cent_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb")), 9
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    reps = cluster_representatives(pairs, max_iters=max_iters)
    return (
        v.select("id", "cent_id")
        .join(reps, "id", "left")
        .select(
            "id",
            "cent_id",
            F.coalesce(F.col("rep"), F.col("id")).alias("rep"),
            (F.coalesce(F.col("rep"), F.col("id")) == F.col("id")).alias("keep"),
        )
    )
