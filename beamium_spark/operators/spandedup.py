"""Exact duplicate-SPAN detection at word-n-gram granularity.

Document-level dedup (``operators/dedup.py``) removes whole near-identical
pages; this module finds *repeated passages inside otherwise-distinct
pages* — boilerplate navigation, license blocks, syndicated paragraphs —
the operation Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022) showed matters independently of document dedup.
Their suffix-array ExactSubstr is inherently sequential; the Spark-first
re-expression here is the standard distributed approximation: slide a
word n-gram window (default n=13, the benchmark-decontamination
convention also used by ``operators/decontam.py``), mark every n-gram
that occurs ≥2 times corpus-wide (across documents OR repeated within
one), and merge runs of consecutive duplicated positions into maximal
spans per document. A span of w words ≥ n means a verbatim repeated
passage of at least w words.

Relation to the reference: the reference pipeline filters whole lines by
regex (/root/reference/src/filter.rs); span dedup is the corpus-scale
generalization the north-star LLM-pipeline mandate adds on top.

Scale shape (the reason this form is used at 10^12 documents):

- n-gram construction is a pure projection (``sequence`` + ``slice``
  inside Catalyst) — no shuffle, no Python.
- ONE shuffle keyed by the 128-bit gram hash finds duplicated grams
  (hash-agg with map-side partial ``count``); the positions then attach
  back via an equi-join on the same key, so AQE can reuse the exchange.
  A "subscribe to our newsletter"-grade gram with 10^9 occurrences
  reduces map-side in the count; the join fan-out is bounded by real
  occurrence count (those rows ARE the answer).
- Island-merging windows partition by ``doc_id`` — bounded by a single
  document's length, never by corpus size.

Gram identity is the 128-bit double hash (xxhash64 seed-default +
seed-42) mirroring ``exact_dedup``: at 10^12 docs × ~10² grams a single
64-bit key would see birthday collisions, a 128-bit pair does not. The
DuckDB oracles group on the raw gram text instead, so a collision would
surface as a gate mismatch.

Tokenization is raw whitespace split — NOT lowercased, unlike the
Jaccard shingles in ``dedup.py`` — because span removal must only fire
on verbatim repeats; case-folding would merge near-quotes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _words_raw(text: Column) -> Column:
    """Raw whitespace tokens, case-preserving, empties dropped."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def _gram_occurrences(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, h1, h2): one row per n-gram occurrence. Documents with
    fewer than ``n`` words emit nothing — they cannot contain a span."""
    words = _words_raw(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.concat_ws(" ", F.slice(words, i + 1, n)).alias("gram"),
        ),
    )
    return (
        docs.where(F.size(words) >= n)
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .select(
            "id",
            F.col("g.pos").alias("pos"),
            F.xxhash64("g.gram").alias("h1"),
            F.xxhash64("g.gram", F.lit(42)).alias("h2"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, span_start, span_end, span_words): one row per maximal
    duplicated span. ``span_start`` is the 0-based index of the span's
    first word, ``span_end`` the exclusive end index (covers the last
    duplicated gram's ``pos + n``), ``span_words = span_end - span_start``.
    Maximal spans never overlap, so per-doc coverage is the plain sum.
    """
    occ = _gram_occurrences(docs, n, id_col, text_col)

    # One shuffle: duplicated gram keys (corpus-wide occurrence ≥ 2).
    dup_keys = (
        occ.groupBy("h1", "h2").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .select("h1", "h2")
    )
    dup_pos = occ.join(dup_keys, ["h1", "h2"]).select("id", "pos")

    # Gaps-and-islands per document: consecutive duplicated positions
    # chain into one island (windows overlap word-wise up to n-1).
    w = Window.partitionBy("id").orderBy("pos")
    islands = (
        dup_pos.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > 1), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w))
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_words"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplication report → (id, total_words, dup_words,
    n_spans, dup_fraction). Every input document appears (zero rows for
    clean docs) — this is the frame a Gopher/FineWeb-style threshold
    filter consumes (``dup_fraction <= t``), mirroring how
    ``repetition_stats`` feeds ``curate()``.
    """
    spans = duplicate_spans(docs, n, id_col, text_col)
    per_doc = spans.groupBy("id").agg(
        F.sum("span_words").alias("dup_words"),
        F.count("*").alias("n_spans"),
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(_words_raw(F.col(text_col))).alias("total_words"),
    )
    return (
        base.join(per_doc, "id", "left")
        .select(
            "id",
            "total_words",
            F.coalesce("dup_words", F.lit(0)).alias("dup_words"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.when(F.col("total_words") > 0,
                   F.coalesce("dup_words", F.lit(0)) / F.col("total_words"))
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Destructive form: cut every duplicated span EXCEPT its corpus-first
    occurrence and reassemble the text — Lee et al.'s ExactSubstr-cut at
    n-gram granularity, the span-level sibling of
    ``dedup_paragraphs_rewrite``.

    Winner per duplicated gram = min (id, pos) occurrence struct — an
    AGGREGATION, so boilerplate grams reduce map-side (same hazard note
    as dedup_paragraphs_rewrite). Losing occurrences merge into cut
    intervals; surviving words re-join with single spaces. Whitespace is
    therefore normalized in rewritten docs — callers needing byte-exact
    text for *clean* docs should join this frame's ids against the
    original column. Returns (id, text, total_words, cut_words).
    """
    occ = _gram_occurrences(docs, n, id_col, text_col)
    winners = occ.groupBy("h1", "h2").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("id", "pos")).alias("w"),
    )
    losers = (
        occ.join(winners, ["h1", "h2"])
        .where(
            (F.col("cnt") > 1)
            & ~((F.col("id") == F.col("w.id")) & (F.col("pos") == F.col("w.pos")))
        )
        .select("id", "pos")
    )
    w = Window.partitionBy("id").orderBy("pos")
    cuts = (
        losers.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > 1), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w))
        .groupBy("id", "island")
        .agg(F.min("pos").alias("lo"), (F.max("pos") + n).alias("hi"))
        .groupBy("id")
        .agg(F.collect_list(F.struct("lo", "hi")).alias("cuts"))
    )
    words = _words_raw(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("id"), words.alias("words")
    )
    kept = F.filter(
        F.transform(
            F.col("words"),
            lambda x, i: F.struct(i.alias("i"), x.alias("x")),
        ),
        # a word survives unless some cut interval covers its index
        lambda s: ~F.exists(
            F.col("cuts"),
            lambda c: (s["i"] >= c["lo"]) & (s["i"] < c["hi"]),
        ),
    )
    return (
        base.join(cuts, "id", "left")
        .withColumn("cuts", F.coalesce("cuts", F.array()))
        .select(
            "id",
            F.concat_ws(" ", F.transform(kept, lambda s: s["x"])).alias("text"),
            F.size("words").alias("total_words"),
            F.aggregate(
                "cuts",
                F.lit(0),
                lambda acc, c: acc + (c["hi"] - c["lo"]).cast("int"),
            ).alias("cut_words"),
        )
    )
