"""Distributed BPE tokenizer training (Sennrich et al., ACL'16) — the
merge-table pass a training-data pipeline runs before tokenizing a
corpus. Completes the tokenizer story next to ``token_frequencies``
(the vocabulary pass) and ``ngram_frequencies`` (first-merge pair
counting): this module runs the FULL merge loop.

The reference forwards raw series and leaves analysis downstream
(/root/reference/README.md:17-24); the corpus analogue mandated by the
north_star is first-class here.

Scale shape (the classic trick every production BPE trainer uses):

- The corpus is touched ONCE — one hash-aggregated (word, count) pass.
  Every merge iteration then works on the word-VOCABULARY table
  (10^6-10^7 rows at web scale, vs 10^12 corpus tokens).
- A word's symbol sequence is kept as a SENTINEL-BRACKETED string
  (``\\x02 sym \\x03`` per symbol), so applying a merge is ONE literal
  ``replace()`` — a pure projection, no shuffle, and exactly
  left-to-right non-overlapping (string replace semantics == BPE's
  scan order; the brackets make symbol boundaries unambiguous, so a
  pair pattern can never match inside a longer symbol).
- Per iteration: one narrow (l, r, count) hash agg with map-side
  combine + a TakeOrdered argmax (deterministic tiebreak: count desc,
  then lexicographic) — one 1-row driver collect per merge, the
  bounded control plane.
- ``localCheckpoint`` every ``checkpoint_every`` merges bounds both
  lineage depth and the replace-expression stack.

``apply_bpe`` tokenizes a corpus with a trained merge list as a chained
replace projection per word — shuffle-free; fine for the few-hundred-
merge vocabularies the tests train. For production-size merge tables
(30k+) chain depth would blow the codegen budget: tokenize via a
broadcast merge dict inside ``mapInPandas`` with a per-batch word memo
instead (the unique-words cache is the standard tokenizer fast path) —
that variant is deliberately NOT included until needed; the trainer is
the scale-critical half.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: symbol-boundary sentinels (control chars; words containing them are
#: dropped at word-count time — they cannot occur in valid text)
SENT_L = "\x02"
SENT_R = "\x03"

#: end-of-word symbol (Sennrich'16 convention — makes merges word-internal)
EOW = "</w>"

_SYM_SPLIT = f"[{SENT_L}{SENT_R}]+"


def _encode_word(word: Column) -> Column:
    """word → bracketed character-symbol string: ``⟨h⟩⟨i⟩⟨</w>⟩``."""
    per_char = F.transform(
        F.split(word, ""), lambda c: F.concat(F.lit(SENT_L), c, F.lit(SENT_R))
    )
    return F.concat(
        F.array_join(per_char, ""), F.lit(SENT_L + EOW + SENT_R)
    )


def _symbols(enc: Column) -> Column:
    return F.filter(F.split(enc, _SYM_SPLIT), lambda x: x != "")


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (word, cnt, enc): the vocabulary table every
    merge iteration re-reads instead of the corpus. Lowercased
    whitespace tokens (:func:`~beamium_spark.operators.textstats.words`
    — the module's shared segmentation); words carrying a sentinel
    byte are dropped (cannot be represented; never valid text)."""
    from beamium_spark.operators.textstats import words

    w = docs.select(F.explode(words(F.col(text_col))).alias("word")).filter(
        (~F.col("word").contains(SENT_L)) & (~F.col("word").contains(SENT_R))
    )
    return (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("enc", _encode_word(F.col("word")))
    )


def _pair_counts(wc: DataFrame) -> DataFrame:
    syms = _symbols(F.col("enc"))
    pairs = F.expr(
        "filter(transform(__syms, (s, i) -> struct(s AS l, get(__syms, i + 1) AS r)),"
        " p -> p.r IS NOT NULL)"
    )
    return (
        wc.select("cnt", syms.alias("__syms"))
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_pattern(left: str, right: str) -> tuple[str, str]:
    return (
        SENT_L + left + SENT_R + SENT_L + right + SENT_R,
        SENT_L + left + right + SENT_R,
    )


def train_bpe(
    docs: DataFrame,
    num_merges: int = 100,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn the BPE merge table: ``num_merges`` iterations of
    count-pairs → argmax → apply-merge over the word-vocabulary table.
    Returns ``[(left, right, pair_count), ...]`` in merge-rank order —
    control-plane data (one small tuple per merge), intentionally a
    driver list like :func:`~beamium_spark.operators.similarity.
    train_centroids`'s codebook.

    Stops early when no pair reaches ``min_count`` (merging noise pairs
    wastes vocabulary slots). Deterministic: integer counts, tiebreak
    count desc then (l, r) lexicographic — replayable in SQL, which is
    exactly how the gate oracle re-derives the whole table.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    wc = word_counts(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for rank in range(num_merges):
        best = (
            _pair_counts(wc)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((left, right, n))
        pat, rep = _merge_pattern(left, right)
        wc = wc.withColumn("enc", F.replace(F.col("enc"), F.lit(pat), F.lit(rep)))
        if (rank + 1) % checkpoint_every == 0:
            wc = wc.localCheckpoint()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize with a trained merge list: per word, the same bracketed
    encoding and the merge chain applied IN RANK ORDER as literal
    replaces — one shuffle-free projection (see the module docstring
    for the production-size alternative). Adds ``out_col``
    (array<string>, ``</w>``-terminated subwords)."""
    from beamium_spark.operators.textstats import words

    def _tokenize(word: Column) -> Column:
        e = _encode_word(word)
        for m in merges:
            pat, rep = _merge_pattern(m[0], m[1])
            e = F.replace(e, F.lit(pat), F.lit(rep))
        return _symbols(e)

    toks = F.flatten(
        F.transform(
            F.filter(
                words(F.col(text_col)),
                lambda x: (~x.contains(SENT_L)) & (~x.contains(SENT_R)),
            ),
            _tokenize,
        )
    )
    return docs.withColumn(out_col, toks)
