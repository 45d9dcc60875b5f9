"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All engine-neutral Catalyst expressions (no hash functions whose value
differs across engines) so every op carries a DuckDB-equivalent SQL oracle.
Heuristics are deliberately simple and deterministic; the value here is the
distributed shape — one narrow projection pass, no shuffle, column-pruned
to ``text`` only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles (public common-word lists)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "ich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "con"],
}


def words(text: Column) -> Column:
    w = F.split(F.trim(F.lower(text)), r"\s+")
    return F.filter(w, lambda x: x != "")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: count of maximal alphanumeric runs plus
    single non-space punctuation — the segmentation a byte-level BPE's
    pre-tokenizer (GPT-2 style regex) produces, minus merges. Uses
    regexp_extract_all with an RE2-portable pattern (no lookarounds) so
    the oracle computes the identical count."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )


def _stopword_hits(text: Column, lang: str) -> Column:
    lst = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda x: F.array_contains(lst, x)))


def langid_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    return {lang: _stopword_hits(text, lang) for lang in STOPWORDS}


def langid(text: Column) -> Column:
    """argmax over stopword-profile hits; 'und' (undetermined) when no
    profile matches at all. Deterministic tie-break: language name order."""
    scores = langid_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-signal features used by web-corpus filters (C4/Gopher-style
    rules): length, mean word length, punctuation/digit/space ratios,
    stopword density."""
    n_chars = F.length(text)
    w = words(text)
    n_words = F.size(w)
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        / n_words,
    ).otherwise(F.lit(0.0))
    stop_hits = _stopword_hits(text, "en")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_wlen, 6),
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        "digit_ratio": F.round(digits / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            stop_hits / F.greatest(n_words, F.lit(1)), 6
        ),
    }


def quality_score(text: Column) -> Column:
    """Scalar [0,1] quality score: inside-range length, real words, some
    stopwords, not digit/punct-soup. Weights are fixed and documented —
    the point is the deterministic, vectorizable shape."""
    f = quality_features(text)
    score = (
        F.when((f["n_words"] >= 10) & (f["n_words"] <= 100000), 0.25).otherwise(0.0)
        + F.when((f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 12), 0.25).otherwise(0.0)
        + F.when(f["stopword_ratio"] >= 0.05, 0.25).otherwise(0.0)
        + F.when((f["digit_ratio"] < 0.2) & (f["punct_ratio"] < 0.2), 0.25).otherwise(0.0)
    )
    return F.round(score, 2)


def fingerprint(text: Column, base: int = 131, mod: int = (1 << 31) - 1) -> Column:
    """Order-sensitive rolling-hash document fingerprint: fold over word
    lengths, h = (h·base + len(word)+1) mod m. Engine-neutral (no string
    hash) so the oracle can reproduce it; production would swap the word
    feature for xxhash64(word) — same fold shape."""
    return F.aggregate(
        words(text),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * base + F.length(x) + 1, F.lit(mod)),
    )


# PII patterns — deliberately conservative, RE2-portable (no lookarounds),
# identical semantics in Spark and DuckDB so the scrub is oracle-able.
# Scrub order is fixed (email, then IPv4, then phone) and counts run on
# the progressively-scrubbed text, so kinds never double-count overlap.
# The email form requires an alphabetic TLD (an IP-domain address is not
# an email match; its IP part scrubs as an IP). The phone form is
# intentionally narrow (+ followed by 9-15 digits); broader phone
# heuristics overmatch ordinary numbers — callers with region-specific
# needs pass their own patterns.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{9,15}\b", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """Replace emails / IPv4s / international phone numbers with typed
    placeholders — the C4-style pre-training scrub, pure Catalyst
    (vectorized regexp_replace chain, no shuffle, no Python)."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (the audit column next to the scrub).
    Counted on the same progressively-scrubbed text the replacements see,
    so kinds never double-count each other's matches."""
    out = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, repl)
    return out


def word_ngrams_all(text: Column, n: int) -> Column:
    """ALL word n-grams in order (duplicates kept — frequency semantics,
    unlike dedup's distinct-set form). Texts shorter than n words yield
    an empty array."""
    w = words(text)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_frequencies(docs, n: int = 2, k: int = 100, text_col: str = "text"):
    """Corpus-wide word n-gram frequency table, top-``k`` by count. For
    ``n=2`` this is exactly the adjacent-pair count a BPE trainer's first
    merge iteration needs (most frequent symbol pair over the corpus);
    higher n feeds phrase mining / contamination heuristics.

    Same scale shape as :func:`token_frequencies`: explode → one
    partial+final hash agg keyed on the gram → TakeOrderedAndProject
    top-k; never a global window over the gram vocabulary."""
    from pyspark.sql import Window

    counted = (
        docs.select(F.explode(word_ngrams_all(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
    )
    topk = counted.orderBy(F.desc("n"), F.asc("gram")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("gram"))  # k rows only
    return topk.withColumn("rank", F.row_number().over(w))


def repetition_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document repetition signals (the Gopher/MassiveText repetition
    filters, Rae et al. 2021 §A1.1): heavily repeated lines or n-grams
    mark boilerplate/spam.

    - ``n_lines``          — non-empty lines
    - ``dup_line_frac``    — 1 − distinct/total over non-empty lines
    - ``top_bigram_frac``  — occurrences of the most frequent word
                             2-gram / total 2-grams (0 when < 2 words)

    Scale shape: line stats are pure per-row expressions (no shuffle);
    the bigram mode needs one (id, gram) hash agg then an (id) re-agg —
    both narrow, both bounded by per-doc gram counts."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    line_stats = docs.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines))
            / F.greatest(F.size(lines), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
    )
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams_all(F.col(text_col), 2)).alias("g"),
    )
    bigram_mode = (
        grams.groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
        )
    )
    return line_stats.join(bigram_mode, "id", "left").select(
        "id",
        "n_lines",
        "dup_line_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


def token_frequencies(docs, k: int = 100, text_col: str = "text"):
    """Corpus-wide token frequency table, top-``k`` by count (vocabulary
    building — the first pass of any tokenizer training run over the
    corpus). Ties break on token asc so the cut is deterministic.

    Scale shape: explode → ONE partial+final hash aggregate keyed on
    token (map-side combine collapses each partition to its distinct
    tokens before the exchange — shuffle rows are bounded by vocabulary
    size per partition, not corpus token count) → distributed
    ``orderBy(...).limit(k)`` (TakeOrderedAndProject: each partition
    contributes its local top-k, the driver merges k·parts rows — never a
    single-partition global window over the vocabulary). Rank is attached
    afterwards over the k-row result only."""
    from pyspark.sql import Window

    counted = (
        docs.select(F.explode(words(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    topk = counted.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))  # k rows only
    return topk.withColumn("rank", F.row_number().over(w))


def domain_stats(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    min_score: float = 0.5,
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """Per-domain reputation aggregates for crawl curation (the
    domain-level pass RefinedWeb/C4-style pipelines run BEFORE per-doc
    filtering: a host whose pages are mostly duplicated or low-quality is
    dropped wholesale, which is both cheaper and safer than judging its
    pages one by one).

    Output per domain: ``n_docs``, ``mean_score`` (mean of the per-doc
    :func:`quality_score`), ``dup_frac`` (1 − distinct/total by the
    128-bit double text hash — same identity contract as
    ``dedup.exact_dedup``), and ``flagged`` (mean_score < ``min_score``
    OR dup_frac > ``max_dup_frac``).

    Scale shape: ONE hash aggregation keyed by domain over narrow rows
    (domain, score, h1, h2) — the score is computed map-side as a pure
    projection, so nothing wider than ~40 bytes per doc enters the
    exchange, and the output is bounded by the domain count (~10^8 hosts
    at web scale, trivially partitioned). The distinct-count inside the
    group uses ``count_distinct(h1, h2)`` — exact, no second shuffle.
    """
    score = quality_score(F.col(text_col))
    narrow = docs.select(
        F.col(domain_col).alias("domain"),
        score.alias("__s"),
        F.xxhash64(text_col).alias("__h1"),
        F.xxhash64(F.lit("bmds2"), F.col(text_col)).alias("__h2"),
    )
    agg = narrow.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("__s"), 6).alias("mean_score"),
        F.round(
            F.lit(1.0) - F.count_distinct("__h1", "__h2") / F.count(F.lit(1)), 6
        ).alias("dup_frac"),
    )
    return agg.withColumn(
        "flagged",
        (F.col("mean_score") < min_score) | (F.col("dup_frac") > max_dup_frac),
    )


def flag_by_domain(
    docs: DataFrame,
    domains: DataFrame,
    domain_col: str = "source",
    broadcast_domains: bool = True,
) -> DataFrame:
    """Join the :func:`domain_stats` verdicts back onto the corpus:
    adds ``domain_flagged`` (False for domains absent from ``domains``,
    e.g. when stats came from an earlier snapshot). The domain table is
    broadcast by default (bounded by host count, narrow columns); pass
    ``broadcast_domains=False`` to sort-merge when it outgrows the
    driver — the ``broadcast_ids`` contract of ``operators.dedup``."""
    d = domains.select(
        F.col("domain").alias(domain_col), F.col("flagged").alias("domain_flagged")
    )
    if broadcast_domains:
        d = F.broadcast(d)
    return docs.join(d, domain_col, "left").withColumn(
        "domain_flagged", F.coalesce("domain_flagged", F.lit(False))
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """ONE-ROW corpus health summary — the dashboard aggregate a curation
    run starts and ends with: ``n_docs``, ``n_distinct_texts`` (128-bit
    double-hash identity), ``dup_frac``, ``total_ws_tokens``,
    ``avg_chars``, ``mean_score`` (mean per-doc :func:`quality_score`).

    Scale shape: a single hash aggregation over map-side-computed narrow
    scalars (two 8-byte hashes, token/char counts, the score) — one
    reduce to one row; the exact distinct-count is the only part that
    keeps per-key state and it runs over 16-byte pairs, the same
    contract as ``dedup.exact_dedup``.
    """
    t = F.col(text_col)
    narrow = docs.select(
        F.xxhash64(text_col).alias("__h1"),
        F.xxhash64(F.lit("bmcr2"), t).alias("__h2"),
        F.size(words(t)).cast("long").alias("__w"),
        F.length(t).cast("long").alias("__c"),
        quality_score(t).alias("__s"),
    )
    return narrow.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("__h1", "__h2").alias("n_distinct_texts"),
        F.round(
            F.lit(1.0) - F.count_distinct("__h1", "__h2") / F.count(F.lit(1)), 6
        ).alias("dup_frac"),
        F.sum("__w").alias("total_ws_tokens"),
        F.round(F.avg("__c"), 6).alias("avg_chars"),
        F.round(F.avg("__s"), 6).alias("mean_score"),
    )


def trending_terms(
    pages: DataFrame,
    window: str = "1 day",
    k: int = 10,
    n: int = 1,
    salt_factor: int = 64,
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Top-k word n-grams per time window over the crawl — the text ×
    time composition (what's trending in the corpus per day), the
    vocabulary analog of ``rollup.top_urls``.

    Same lossless three-phase shape as top_urls, because a window of a
    10^12-doc corpus holds ~10^8 distinct terms and a single per-window
    rank would sort them all in one task:

    1. count per (window, term) — explode + one partial+final hash agg;
    2. LOCAL top-k per (window, term-hash-salt) slice — no task ranks
       more than ~cardinality/salt_factor terms of one window;
    3. global rank over the ≤ k·salt_factor survivors per window.

    A global top-k term is necessarily in its salt slice's top-k, so the
    prune is lossless. Ties break on term asc — deterministic,
    oracle-able. Output: (window_start, term, n, rank).
    """
    from pyspark.sql import Window as W

    src = (
        word_ngrams_all(F.col(text_col), n)
        if n > 1
        else words(F.col(text_col))
    )
    exploded = pages.select(
        F.col(ts_col).alias("__ts"), F.explode(src).alias("term")
    )
    from beamium_spark.operators.rollup import window_start

    counted = (
        exploded.where(F.col("__ts").isNotNull())
        .groupBy(window_start("__ts", window).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = counted.withColumn(
        "__salt", F.pmod(F.xxhash64("term"), F.lit(salt_factor)).cast("int")
    )
    local_w = W.partitionBy("w", "__salt").orderBy(F.desc("n"), F.asc("term"))
    pruned = (
        salted.withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__salt")
    )
    rank_w = W.partitionBy("w").orderBy(F.desc("n"), F.asc("term"))
    return (
        pruned.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(F.col("w").alias("window_start"), "term", "n", "rank")
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    line_blocklist: tuple[str, ...] = ("javascript",),
    min_lines: int = 3,
    doc_blocklist: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al., JMLR'20 §2.2 — the
    rules behind the public C4 corpus): per-LINE retention + per-DOC
    rejection, the first cleaning pass of a web-corpus pipeline.

    Line rules (a line survives when ALL hold):
    - ≥ ``min_words_per_line`` whitespace words (C4 uses 5);
    - ends in terminal punctuation ``. ! ? "`` (toggleable);
    - contains no ``line_blocklist`` substring, case-insensitive
      (C4 drops lines carrying the word "javascript").

    Doc rules: ``keep`` = at least ``min_lines`` surviving lines (C4's
    ≥3-sentence floor approximated at line grain, as the public
    re-implementations do) AND no ``doc_blocklist`` substring in the
    ORIGINAL text, case-insensitive (C4 drops "lorem ipsum" pages and
    any page containing "{" — code). Span-level dedup (C4's
    three-sentence rule) is :func:`~beamium_spark.operators.spandedup`'s
    job and deliberately not duplicated here; curly-brace pages die
    wholesale rather than per-line, matching the paper.

    Output: (id, clean_text — surviving lines joined by ``\\n``,
    n_lines, n_lines_kept, keep). Pure Catalyst projection (split /
    filter / array_join over the line array) — zero shuffle, zero
    Python; the plan is a scan + project whatever the corpus size.
    """
    if min_words_per_line < 1:
        raise ValueError(
            f"min_words_per_line must be >= 1, got {min_words_per_line}"
        )
    if min_lines < 1:
        raise ValueError(f"min_lines must be >= 1, got {min_lines}")

    def _line_ok(line: Column) -> Column:
        t = F.trim(line)
        wc = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        ok = wc >= min_words_per_line
        if require_terminal_punct:
            ok = ok & t.rlike('[.!?"]$')
        for s in line_blocklist:
            ok = ok & (~F.contains(F.lower(t), F.lit(s.lower())))
        return ok

    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _line_ok)
    doc_ok = F.lit(True)
    for s in doc_blocklist:
        doc_ok = doc_ok & (~F.contains(F.lower(F.col(text_col)), F.lit(s.lower())))
    return docs.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        ((F.size(kept) >= min_lines) & doc_ok).alias("keep"),
    )


def corpus_composition(
    docs: DataFrame,
    dims: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus composition matrix: per ``dims`` cell (lang × source by
    default) — docs, whitespace tokens, chars, and each cell's fraction
    of the corpus by docs and by tokens. The first table in any dataset
    card; the mixture check :func:`~beamium_spark.operators.sampling.
    mix_corpora` runs against.

    One hash agg + one scalar-total window (cells are dimension-bounded,
    never data-bounded)."""
    cells = docs.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_ws(F.col(text_col))).alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    return cells.select(
        *dims,
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_docs") / F.sum("n_docs").over(tot), 6).alias("doc_frac"),
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(tot), 6).alias("token_frac"),
    )


def token_length_histogram(
    docs: DataFrame,
    bin_width: int = 50,
    max_bins: int = 40,
    text_col: str = "text",
) -> DataFrame:
    """Document-length distribution in whitespace tokens: fixed-width
    bins with an overflow bucket (``bin = min(len // width, max_bins)``)
    — the length histogram sequence-packing and truncation policies are
    tuned against. One hash agg keyed by bin."""
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    n = token_count_ws(F.col(text_col))
    b = F.least(F.floor(n / bin_width), F.lit(max_bins)).cast("int")
    return (
        docs.select(b.alias("bin"), n.alias("__n"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("n_tokens"),
            F.min("__n").alias("min_tokens"),
            F.max("__n").alias("max_tokens"),
        )
        .withColumn("bin_lo", F.col("bin") * bin_width)
    )
