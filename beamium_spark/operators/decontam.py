"""Benchmark decontamination: flag training docs that leak eval data.

Standard practice for LLM training corpora (the C4/GPT-3/PaLM reports
all describe a variant): a document that shares long word n-grams with a
benchmark's prompts/answers contaminates downstream evaluation and must
be dropped or scrubbed. The canonical configuration is 13-gram overlap.

Spark-first shape, built for "10^12 docs vs a few MB of benchmarks":

1. the benchmark side (eval sets — thousands of rows) explodes to
   distinct n-gram hashes: a FEW-MB frame that **broadcasts**;
2. the corpus side explodes to (doc_id, gram_hash) — wide in rows but
   8 bytes of payload, and the broadcast hash join filters it MAP-SIDE:
   only matching grams (a vanishing fraction) ever reach an exchange;
3. per-doc aggregation of the hits shuffles just those survivors.

So the only all-corpus work is the map-side explode+probe — no corpus
shuffle, no benchmark-side scaling concern. Grams hash with the
engine-neutral md5-60bit (`dedup.portable_hash60`), so an external SQL
engine reproduces the verdict bit-for-bit (the gate's DuckDB oracle
does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beamium_spark.operators.dedup import _word_ngrams, portable_hash60


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Distinct n-gram hashes of the benchmark corpus → one narrow column
    ``bh``. Materialize once per benchmark release and reuse."""
    grams = _word_ngrams(F.col(text_col), n)
    return (
        benchmark.select(F.explode(grams).alias("g"))
        .select(portable_hash60(F.col("g")).alias("bh"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document contamination report: (id, n_grams, hit_grams,
    hit_frac) for every document with ≥1 benchmark n-gram collision.
    Texts shorter than ``n`` words contribute their whole text as one
    gram (the ``_word_ngrams`` convention, both sides) — so a short
    benchmark prompt still matches its verbatim copy.
    """
    bench = F.broadcast(benchmark_ngrams(benchmark, n, bench_text_col))
    grams = _word_ngrams(F.col(text_col), n)
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.size(grams).alias("n_grams"),
        F.explode(grams).alias("g"),
    ).select("id", "n_grams", portable_hash60(F.col("g")).alias("gh"))
    hits = doc_grams.join(bench, doc_grams["gh"] == bench["bh"], "inner")
    return (
        hits.groupBy("id", "n_grams")
        .agg(F.count_distinct("gh").alias("hit_grams"))
        .select(
            "id",
            "n_grams",
            "hit_grams",
            F.round(F.col("hit_grams") / F.col("n_grams"), 6).alias("hit_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated documents: anti-join ``docs`` against the ids
    whose benchmark collisions reach ``min_hits``. The flagged-id set is
    tiny (real contamination rates are ≪1%), so the anti-join broadcasts.
    """
    flagged = (
        contamination(docs, benchmark, n, text_col, id_col, bench_text_col)
        .filter(F.col("hit_grams") >= min_hits)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
