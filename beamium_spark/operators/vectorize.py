"""Text vectorization: hashing-trick TF-IDF document vectors.

The similarity operators (cosine/LSH/IVF top-k, embedding near-dup) take
an ``array<float>`` column; production pipelines fill it from a model,
but a large-scale corpus needs a model-free baseline that works at
10^12 docs — classic hashed TF-IDF (the "feature hashing" trick:
Weinberger et al., ICML'09): every token hashes into one of ``dim``
buckets, term frequency × inverse document frequency weights the bucket,
and the dense form L2-normalizes so cosine = dot product.

Spark-first shape:

- token explode → (id, bucket) partial+final count — ONE corpus shuffle,
  keyed (id, bucket), rows bounded by nnz (≤ tokens), payload 16 bytes;
- document frequencies per bucket: a second narrow agg over the distinct
  (id, bucket) pairs (at most dim distinct buckets survive — tiny);
- idf joins back by broadcast (dim rows);
- dense assembly is a per-document map lookup over ``sequence(0, dim)``
  — no shuffle beyond the groupBy(id).

Token hashing uses the engine-neutral md5-60bit (dedup.portable_hash60)
so an external SQL engine reproduces every weight bit-for-bit — which is
what pins the gate oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beamium_spark.operators.dedup import portable_hash60
from beamium_spark.operators.textstats import words


def hashed_tfidf(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """Sparse hashed TF-IDF: (id, bucket, weight) rows, weight = tf ×
    (ln((N+1)/(df+1)) + 1) with N = corpus size, df = docs containing the
    bucket — the smoothed-idf form, deterministic and engine-neutral.
    Dense/normalized form via :func:`assemble_dense`.

    Fully LAZY: when ``n_docs`` is not supplied, N is a one-row
    ``count(*)`` aggregate broadcast-cross-joined into the (≤ dim rows)
    idf frame, so it computes inside the same action as the rest of the
    plan — no eager driver job at build time, and the corpus count scan
    is column-pruned to row-group metadata on parquet sources. Callers
    that already know the corpus size pass ``n_docs`` to skip that branch
    entirely."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("tok"),
    ).select("id", F.pmod(portable_hash60(F.col("tok")), F.lit(dim)).alias("bucket"))
    tf = toks.groupBy("id", "bucket").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("bucket").agg(F.count("*").alias("df"))
    if n_docs is not None:
        n_col = F.lit(float(n_docs))
    else:
        n_row = docs.agg(F.count("*").cast("double").alias("__n"))
        df_ = df_.crossJoin(F.broadcast(n_row))
        n_col = F.col("__n")
    idf = df_.select(
        "bucket",
        (F.log((n_col + 1) / (F.col("df") + 1)) + 1).alias("idf"),
    )
    return tf.join(F.broadcast(idf), "bucket").select(
        "id", "bucket", (F.col("tf") * F.col("idf")).alias("weight")
    )


def assemble_dense(
    sparse: DataFrame, dim: int = 64, normalize: bool = True
) -> DataFrame:
    """(id, bucket, weight) → (id, vec: array<double>[dim]), L2-normalized
    by default so cosine similarity reduces to a dot product — the form
    ``similarity.cosine_topk`` / ``embedding_near_dup_lsh`` consume.
    Per-document map lookup over the bucket range; empty docs get a zero
    vector (normalize leaves it zero, never NaN)."""
    m = sparse.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "weight"))
        ).alias("__m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("__m", i.cast("int")), F.lit(0.0)),
    )
    out = m.withColumn("vec", vec).drop("__m")
    if normalize:
        norm = F.sqrt(
            F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x)
        )
        out = out.withColumn(
            "vec",
            F.when(
                norm > 0, F.transform("vec", lambda x: x / norm)
            ).otherwise(F.col("vec")),
        )
    return out
