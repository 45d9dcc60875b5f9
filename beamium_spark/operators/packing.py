"""Sequence packing: lay a document corpus out as fixed-length training
sequences (concat-and-chunk, the GPT-style packing FineWeb/SlimPajama
consumers feed to causal-LM trainers).

Documents are concatenated into a per-shard token stream (one EOD token
between docs) and the stream is chunked into ``seq_len``-token windows;
a document may straddle a window boundary. This policy — unlike greedy
no-split bin packing — is a pure PREFIX-SUM, so it distributes as plain
Catalyst window aggregation with no sequential state and the layout is
reproducible from the data alone (no RNG, no driver loop).

Scale shape: the corpus is hashed into ``n_shards`` independent streams
(shard = xxhash64(id) % n_shards — deterministic, rebalanced by hashing,
not data order). The only shuffle is the per-shard window sort; a shard
is bounded by corpus_size / n_shards, so task memory is capped by a
config knob, never by corpus growth: at 10^12 docs, n_shards=10^6 keeps
~10^6 docs/shard. Each shard's token stream is independent — trainers
consume shards as separate files, the standard sharded-dataset layout.

Token counts use the whitespace tokenizer (`textstats.token_count_ws`)
by default so every count is reproducible in ANSI SQL (the gate oracle
re-derives the full layout); pass ``tokens_col`` to plug in real
tokenizer counts computed upstream (e.g. by a pandas_udf BPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beamium_spark.operators.textstats import token_count_ws


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    eod_tokens: int = 1,
    portable: bool = False,
) -> DataFrame:
    """→ (shard, id, n_tokens, tok_start, tok_end, seq_first, seq_last):
    each document's half-open token interval [tok_start, tok_end) in its
    shard's stream (``n_tokens`` own tokens + ``eod_tokens`` separator,
    charged to the document that precedes it, trailing separator
    included — the stream length is exactly the sum of charged widths),
    plus the first/last ``seq_len``-window its OWN tokens land in.
    ``seq_last - seq_first > 0`` means the doc straddles a boundary.

    Within a shard the order is ascending ``id_col`` — deterministic
    under replay, independent of input partitioning. Empty documents
    (0 tokens) still occupy their separator slot and report
    ``seq_first = seq_last`` = the window holding it.

    ``portable=True`` swaps the xxhash64 shard hash for the md5 form
    (same convention as ``sampling.hash_sample``) so an external SQL
    engine reproduces the identical layout — the gate oracle uses it.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if eod_tokens < 0:
        raise ValueError(f"eod_tokens must be >= 0, got {eod_tokens}")
    n_tokens = (
        F.col(tokens_col) if tokens_col else token_count_ws(F.col(text_col))
    )
    shard_hash = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        if portable
        else F.xxhash64(F.col(id_col))
    )
    base = docs.select(
        F.pmod(shard_hash, F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).alias("id"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("id")
    width = F.col("n_tokens") + F.lit(eod_tokens)
    laid = base.withColumn("tok_end_sep", F.sum(width).over(w)).select(
        "shard",
        "id",
        "n_tokens",
        (F.col("tok_end_sep") - width).alias("tok_start"),
        (F.col("tok_end_sep") - F.lit(eod_tokens)).alias("tok_end"),
    )
    # windows the document's OWN tokens touch; an empty doc owns no
    # tokens, so report the window its separator slot starts in
    last_own = F.greatest(F.col("tok_end") - 1, F.col("tok_start"))
    return laid.select(
        "shard",
        "id",
        "n_tokens",
        "tok_start",
        "tok_end",
        F.floor(F.col("tok_start") / seq_len).cast("long").alias("seq_first"),
        F.floor(last_own / seq_len).cast("long").alias("seq_last"),
    )


def sequence_manifest(
    packed: DataFrame, seq_len: int = 2048
) -> DataFrame:
    """Per-sequence summary of a :func:`pack_sequences` layout →
    (shard, seq_id, n_docs, first_id, last_id): how many documents
    contribute own-tokens to each ``seq_len`` window and the id range —
    the manifest a loader uses to fetch a window's source docs. Explodes
    each doc over the (typically 1-2) windows it touches; fan-out per doc
    is ``ceil(n_tokens / seq_len) + 1``, data-bounded only for documents
    longer than ``seq_len``.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    touched = packed.select(
        "shard",
        "id",
        F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id"),
    )
    return touched.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.min("id").alias("first_id"),
        F.max("id").alias("last_id"),
    )
