"""Bigram language-model quality scoring for corpus curation.

The production filter CCNet (Wenzek et al., LREC 2020) and the Gopher /
RefinedWeb pipelines score every crawled document with a small n-gram
language model (KenLM) and drop the low-likelihood tail — gibberish,
OCR noise, non-linguistic boilerplate.  This module is the
Spark-native analog: an add-k-smoothed bigram model trained with plain
aggregations, then a per-document mean log-probability scored with
joins.  No Python in the data path — tokenization is
``regexp_extract_all`` (JVM), counting is hash aggregation, scoring is
two narrow joins plus one grouped average.

Scale shape (trained on the corpus it scores, or on a clean reference
corpus):

- ``train``: TWO corpus scans — one explode→count for unigrams, one
  explode→count for bigram pairs.  Both hash-aggregate with map-side
  combine, so the shuffle carries (token, partial count) pairs, not
  positions.  Vocabulary mapping (``min_count`` cutoff → ``<unk>``)
  is applied to the COUNT TABLES, never to the corpus: the unigram
  table remaps itself with a ``when()`` (its own count decides vocab
  membership — zero joins), and the bigram table joins the vocab twice
  on its distinct-pair rows (≪ corpus positions, Zipf).
- ``score``: corpus pairs join the vocab (×2), the unigram table, and
  the bigram table, then one grouped average per document.  The model
  tables are candidates for broadcast (``broadcast_model=True``, the
  default — a pruned web vocab is tens of MB); pass ``False`` to fall
  back to shuffle joins when the model outgrows the driver, mirroring
  the ``broadcast_ids`` contract in ``operators.dedup``.

Determinism: the vocabulary is ``count >= min_count`` — a pure
per-token predicate with no top-k tie-breaking — so training is exactly
reproducible and the DuckDB gate oracle can re-derive the whole model.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
UNK = "<unk>"


def _tokens(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def _pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair.  Docs with < 2 tokens
    are filtered BEFORE the slice so ANSI mode never sees a negative
    slice length."""
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("ts")).filter(
        F.size("ts") >= 2
    )
    zipped = F.arrays_zip(
        F.slice("ts", 1, F.size("ts") - 1).alias("w1"),
        F.slice("ts", 2, F.size("ts") - 1).alias("w2"),
    )
    return toks.select(id_col, F.explode(zipped).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


@dataclass(frozen=True)
class BigramLM:
    """Trained model: ``uni`` (tok, c) and ``big`` (w1, w2, c) counts
    over ``<unk>``-mapped tokens, plus a ONE-ROW ``vsize`` frame
    (|vocab| + 1 for ``<unk>``) kept lazy so training triggers no job
    until the score is executed (the tfidf ``n_docs`` lesson,
    ADVICE r4)."""

    uni: DataFrame
    big: DataFrame
    vsize: DataFrame


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    broadcast_vocab: bool = True,
) -> BigramLM:
    """Fit add-k-ready bigram counts; see module docstring for shape."""
    uni_raw = (
        docs.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # vocab membership is the token's own count — remap without a join
    uni = (
        uni_raw.select(
            F.when(F.col("c") >= min_count, F.col("tok")).otherwise(UNK).alias("tok"),
            "c",
        )
        .groupBy("tok")
        .agg(F.sum("c").alias("c"))
    )
    vocab = uni_raw.filter(F.col("c") >= min_count).select("tok")
    vb = F.broadcast(vocab) if broadcast_vocab else vocab
    big_raw = (
        _pairs(docs.select(F.lit(1).alias("__one"), text_col), "__one", text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        big_raw.join(vb.withColumnRenamed("tok", "w1").withColumn("__v1", F.lit(1)), "w1", "left")
        .join(vb.withColumnRenamed("tok", "w2").withColumn("__v2", F.lit(1)), "w2", "left")
        .select(
            F.when(F.col("__v1").isNotNull(), F.col("w1")).otherwise(UNK).alias("w1"),
            F.when(F.col("__v2").isNotNull(), F.col("w2")).otherwise(UNK).alias("w2"),
            "c",
        )
        .groupBy("w1", "w2")
        .agg(F.sum("c").alias("c"))
    )
    vsize = vocab.agg((F.count(F.lit(1)) + F.lit(1)).alias("vsize"))
    return BigramLM(uni=uni, big=big, vsize=vsize)


def score_bigram_lm(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document mean bigram log-probability.

    Output: ``(id_col, n_bigrams, avg_logprob, ppl)`` — every input doc
    appears; docs with < 2 tokens carry ``n_bigrams = 0`` and NULL
    score/ppl.  ``avg_logprob`` is the mean over positions of
    ``ln((c(w1 w2) + k) / (c(w1) + k·V))`` with ``V = |vocab| + 1``;
    ``ppl = exp(-avg_logprob)`` (per-bigram perplexity).  Unseen mapped
    tokens/pairs (held-out corpora) count as zero via ``coalesce``.
    """
    vocab = lm.uni.filter(F.col("tok") != UNK).select("tok")
    hint = F.broadcast if broadcast_model else (lambda d: d)
    vb = hint(vocab)
    pairs = _pairs(docs, id_col, text_col)
    mapped = (
        pairs.join(vb.withColumnRenamed("tok", "w1").withColumn("__v1", F.lit(1)), "w1", "left")
        .join(vb.withColumnRenamed("tok", "w2").withColumn("__v2", F.lit(1)), "w2", "left")
        .select(
            id_col,
            F.when(F.col("__v1").isNotNull(), F.col("w1")).otherwise(UNK).alias("w1"),
            F.when(F.col("__v2").isNotNull(), F.col("w2")).otherwise(UNK).alias("w2"),
        )
    )
    scored = (
        mapped.join(hint(lm.uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "cu")), "w1", "left")
        .join(hint(lm.big.withColumnRenamed("c", "cb")), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(lm.vsize))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(k) * F.col("vsize"))
            ).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("lp").alias("avg_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("ppl"),
        )
    )
