"""Corpus curation: the composed training-data pipeline as one pass.

A migrating user doesn't run dedup/decontam/quality as separate scripts —
they want ONE call that turns a raw crawl table into a training-ready
corpus plus an audit trail of what was dropped and why. ``curate()`` is
that surface, composing the library's hardened operators:

1. exact dedup          — keep the smallest id per distinct text
                          (operators.dedup.exact_dedup — narrow 128-bit
                          double-hash shuffle, collision-safe)
2. near-dedup (optional)— MinHash-LSH clusters at a Jaccard threshold;
                          every non-representative member drops
                          (operators.dedup.minhash_lsh_pairs +
                          cluster_representatives — banded narrow
                          exchanges, exact-verified candidates)
3. decontamination      — drop docs sharing ≥ min_hits benchmark
                          n-grams (operators.decontam — broadcast probe)
4. quality filter       — operators.textstats.quality_score ≥ threshold
5. repetition filter    — dup-line / top-bigram fractions under caps
                          (operators.textstats.repetition_stats)
6. span-dup filter (opt)— corpus-wide duplicated-passage coverage cap
                          (operators.spandedup.duplicate_span_stats)
7. domain gate (opt)    — drop flagged hosts wholesale
                          (operators.textstats.domain_stats)
8. LM fluency (opt)     — bigram-LM mean log-likelihood floor
                          (operators.lm — CCNet-style)
9. sampling (optional)  — deterministic hash_sample fraction

Everything materializes in ONE job: verdict columns are computed lazily,
drop reasons resolve by fixed precedence (duplicate > near_duplicate >
contaminated > bad_domain > low_quality > lm_low > repetitive >
span_dup > sampled_out), and the report is a single
aggregation over the verdict frame — no per-stage count() round trips
re-scanning the corpus.

Scale shape: three narrow id-keyed joins (dedup winners, contaminated
ids, repetition stats — each id + a few scalars), quality and sampling
are pure row expressions. The corpus body is scanned once and never
shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_broadcast(df: DataFrame, broadcast_ids: bool | int) -> DataFrame:
    """Apply the small-side broadcast hint per the ``broadcast_ids`` knob:
    True → always hint; False → leave the join shape to Catalyst/AQE (a
    narrow id-keyed sort-merge, or a runtime broadcast if AQE measures the
    side as genuinely small); int N → hint only when the frame holds ≤ N
    rows (one bounded count job — the frames this guards are id + flag
    columns only)."""
    if broadcast_ids is True:
        return F.broadcast(df)
    if broadcast_ids is False:
        return df
    return F.broadcast(df) if df.count() <= int(broadcast_ids) else df


def curation_verdicts(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    min_quality: float = 0.5,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.5,
    sample_fraction: float | None = None,
    decontam_n: int = 13,
    decontam_min_hits: int = 1,
    near_dup_threshold: float | None = None,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.95,
    semantic_clusters: int = 16,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    max_span_dup_frac: float | None = None,
    span_n: int = 13,
    min_lm_logprob: float | None = None,
    lm_min_count: int = 5,
    domain_col: str | None = None,
    domain_min_score: float = 0.5,
    domain_max_dup_frac: float = 0.5,
    seed: int = 42,
    portable_sample: bool = False,
    broadcast_ids: bool | int = True,
    materialize: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs + (kept boolean, reason string|NULL) — the full audit frame.

    ``reason`` is the FIRST failing stage in precedence order
    (duplicate > near_duplicate > semantic_dup > contaminated >
    bad_domain > low_quality > lm_low > repetitive > span_dup >
    sampled_out); ``kept`` ⇔ reason IS NULL. Benchmark None
    skips decontamination; sample_fraction None skips sampling;
    ``near_dup_threshold`` (a Jaccard level, e.g. 0.8) adds MinHash-LSH
    near-dedup — each cluster keeps its min-id representative, every
    other member drops as 'near_duplicate' (exact copies still report
    'duplicate': that stage wins precedence).

    ``embeddings`` (a frame of ``emb_id_col``/``emb_vec_col`` whose ids
    are the corpus ``id_col`` values) adds the SemDeDup stage: documents
    that are near-duplicates in EMBEDDING space — paraphrases and
    template rewrites lexical MinHash misses — drop as 'semantic_dup',
    each group keeping its min-id representative
    (:func:`~beamium_spark.operators.similarity.semantic_dedup`;
    ``semantic_threshold`` cosine, ``semantic_clusters`` cells — size it
    ∝ corpus/cell so within-cell pair cost stays bounded). The doomed-id
    join-back rides the same ``broadcast_ids`` contract as the other
    dedup stages.

    ``max_span_dup_frac`` (e.g. 0.5) adds the duplicated-passage filter:
    docs whose corpus-wide duplicated-span coverage
    (operators.spandedup.duplicate_span_stats at ``span_n``-gram
    granularity) exceeds the cap drop as 'span_dup' — boilerplate-heavy
    pages that survive document-level dedup. This stage adds one
    gram-hash shuffle over the corpus (the only curation stage whose
    cost is token-bounded rather than id-bounded); leave it None when
    the cheap per-doc repetition caps suffice.

    ``min_lm_logprob`` (e.g. -6.0) adds the CCNet-style fluency filter:
    a bigram LM is trained ON the corpus (operators.lm, vocab cutoff
    ``lm_min_count``) and docs whose mean bigram log-likelihood falls
    below the threshold drop as 'lm_low' — gibberish/OCR noise that
    per-doc ratio features miss. Adds two token-bounded corpus scans
    (unigram + bigram counting) and one scoring pass.

    ``domain_col`` (e.g. 'source') adds the domain-reputation gate:
    domains whose mean quality score < ``domain_min_score`` or exact-dup
    fraction > ``domain_max_dup_frac`` (operators.textstats.domain_stats)
    drop wholesale as 'bad_domain'. One narrow domain-keyed aggregation;
    the verdict table is broadcast-joined back (bounded by host count).

    ``broadcast_ids`` governs the small-side hints on the doomed/flagged
    id joins (and flows into MinHash verification): the default True is
    right at sane dup/contamination rates; on a mostly-duplicate corpus
    (fresh crawl snapshots) pass False — the ids are narrow, so the
    fallback sort-merge join is cheap and can never blow the broadcast
    limit — or an int row-count threshold for the adaptive form.
    """
    from beamium_spark.operators.dedup import exact_dedup
    from beamium_spark.operators.textstats import quality_score, repetition_stats

    winners = exact_dedup(docs, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.lit(True).alias("__dup_keep")
    )
    v = docs.join(winners, id_col, "left").withColumn(
        "__dup_keep", F.coalesce("__dup_keep", F.lit(False))
    )

    if near_dup_threshold is not None:
        from beamium_spark.operators.dedup import (
            cluster_representatives,
            minhash_lsh_pairs,
        )

        pairs = minhash_lsh_pairs(
            docs,
            threshold=near_dup_threshold,
            text_col=text_col,
            id_col=id_col,
            broadcast_ids=broadcast_ids,
            materialize=materialize,
        )
        doomed = (
            cluster_representatives(pairs)
            .filter(F.col("id") != F.col("rep"))
            .select(F.col("id").alias(id_col), F.lit(True).alias("__near"))
        )
        if materialize:
            # cluster_representatives ran eagerly against the materialized
            # pair cache; its labels are checkpointed (self-contained), so
            # the pair cache is dead weight from here on
            pairs.unpersist()
        # non-representative members are ≪ corpus at any sane dup rate;
        # broadcast_ids=False/int covers the mostly-duplicate corpus case
        v = v.join(_maybe_broadcast(doomed, broadcast_ids), id_col, "left").withColumn(
            "__near", F.coalesce("__near", F.lit(False))
        )
    else:
        v = v.withColumn("__near", F.lit(False))

    if embeddings is not None:
        from beamium_spark.operators.similarity import semantic_dedup

        sem_doomed = (
            semantic_dedup(
                embeddings,
                threshold=semantic_threshold,
                n_clusters=semantic_clusters,
                vec_col=emb_vec_col,
                id_col=emb_id_col,
            )
            .filter(~F.col("keep"))
            .select(F.col("id").alias(id_col), F.lit(True).alias("__sem"))
        )
        # non-representative members ≪ corpus at sane dup rates; same
        # broadcast_ids escape hatch as the other dedup join-backs
        v = v.join(_maybe_broadcast(sem_doomed, broadcast_ids), id_col, "left").withColumn(
            "__sem", F.coalesce("__sem", F.lit(False))
        )
    else:
        v = v.withColumn("__sem", F.lit(False))

    if benchmark is not None:
        from beamium_spark.operators.decontam import contamination

        flagged = (
            contamination(docs, benchmark, decontam_n, text_col, id_col)
            .filter(F.col("hit_grams") >= decontam_min_hits)
            .select(F.col("id").alias(id_col), F.lit(True).alias("__contam"))
        )
        v = v.join(_maybe_broadcast(flagged, broadcast_ids), id_col, "left").withColumn(
            "__contam", F.coalesce("__contam", F.lit(False))
        )
    else:
        v = v.withColumn("__contam", F.lit(False))

    if domain_col is not None:
        from beamium_spark.operators.textstats import domain_stats

        bad = (
            domain_stats(
                docs,
                domain_col=domain_col,
                text_col=text_col,
                min_score=domain_min_score,
                max_dup_frac=domain_max_dup_frac,
            )
            .filter(F.col("flagged"))
            .select(F.col("domain").alias(domain_col), F.lit(True).alias("__bad_dom"))
        )
        # bounded by host count — same small-side contract as the id joins
        v = v.join(_maybe_broadcast(bad, broadcast_ids), domain_col, "left").withColumn(
            "__bad_dom", F.coalesce("__bad_dom", F.lit(False))
        )
    else:
        v = v.withColumn("__bad_dom", F.lit(False))

    v = v.withColumn("__q", quality_score(F.col(text_col)))

    if min_lm_logprob is not None:
        from beamium_spark.operators.lm import score_bigram_lm, train_bigram_lm

        lm = train_bigram_lm(docs, text_col=text_col, min_count=lm_min_count)
        lp = score_bigram_lm(docs, lm, id_col=id_col, text_col=text_col).select(
            id_col, "avg_logprob"
        )
        # corpus-sized narrow frame: plain id equi-join, never broadcast
        v = v.join(lp, id_col, "left")
        lm_bad = F.col("avg_logprob") < min_lm_logprob  # NULL (short doc) passes
    else:
        lm_bad = F.lit(False)

    rep = repetition_stats(docs, id_col=id_col, text_col=text_col).select(
        F.col("id").alias(id_col), "dup_line_frac", "top_bigram_frac"
    )
    v = v.join(rep, id_col, "left")
    rep_bad = (F.col("dup_line_frac") > max_dup_line_frac) | (
        F.col("top_bigram_frac") > max_top_bigram_frac
    )

    if max_span_dup_frac is not None:
        from beamium_spark.operators.spandedup import duplicate_span_stats

        sd = duplicate_span_stats(
            docs, n=span_n, id_col=id_col, text_col=text_col
        ).select(F.col("id").alias(id_col), "dup_fraction")
        # corpus-sized narrow frame: plain id equi-join, never broadcast
        v = v.join(sd, id_col, "left")
        span_bad = F.col("dup_fraction") > max_span_dup_frac
    else:
        span_bad = F.lit(False)

    if sample_fraction is not None:
        from beamium_spark.operators.sampling import _md5_unit_hash, _unit_hash

        u = (
            _md5_unit_hash(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
            if portable_sample
            else _unit_hash(F.col(id_col), seed)
        )
        sampled_in = u < F.lit(sample_fraction)
    else:
        sampled_in = F.lit(True)

    reason = (
        F.when(~F.col("__dup_keep"), F.lit("duplicate"))
        .when(F.col("__near"), F.lit("near_duplicate"))
        .when(F.col("__sem"), F.lit("semantic_dup"))
        .when(F.col("__contam"), F.lit("contaminated"))
        .when(F.col("__bad_dom"), F.lit("bad_domain"))
        .when(F.col("__q") < min_quality, F.lit("low_quality"))
        .when(lm_bad, F.lit("lm_low"))
        .when(rep_bad, F.lit("repetitive"))
        .when(span_bad, F.lit("span_dup"))
        .when(~sampled_in, F.lit("sampled_out"))
    )
    return (
        v.withColumn("reason", reason)
        .withColumn("kept", F.col("reason").isNull())
        .drop(
            "__dup_keep", "__near", "__sem", "__contam", "__bad_dom", "__q",
            "dup_line_frac", "top_bigram_frac", "dup_fraction", "avg_logprob",
        )
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    scrub: bool = False,
    materialize: bool = False,
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """(clean corpus, report) — the one-call curation surface.

    ``clean`` is ``docs``' columns for kept rows; ``report`` is one row
    per drop reason plus 'kept' with counts (the audit the reference's
    scraped/filtered/forwarded counters become at corpus scale).
    ``scrub=True`` additionally PII-scrubs the kept documents' text
    (operators.textstats.scrub_pii — a pure projection, applied only to
    survivors so dropped rows never pay it).

    Cache lifecycle — two modes:

    - default (``materialize=False``): the verdict frame is cached so
      collecting BOTH outputs scans the corpus once; the cache (and any
      internal near-dedup caches) is the caller's to release
      (``spark.catalog.clearCache()``) — right for one-shot batch jobs.
    - ``materialize=True`` — the long-lived-daemon form: NOTHING is left
      cached. The report (≤ 10 rows, one per outcome) is computed eagerly
      and returned as a driver-local frame, near-dedup internals release
      their caches as they finish, and ``clean`` stays a pure lazy plan
      that re-derives verdicts at the caller's action — one extra corpus
      scan traded for zero residual executor storage per tick."""
    text_col = kwargs.get("text_col", "text")
    if materialize:
        v = curation_verdicts(docs, benchmark, materialize=True, **kwargs)
    else:
        v = curation_verdicts(docs, benchmark, **kwargs).cache()
    clean = v.filter(F.col("kept")).drop("kept", "reason")
    if scrub:
        from beamium_spark.operators.textstats import scrub_pii

        clean = clean.withColumn(text_col, scrub_pii(F.col(text_col)))
    report = (
        v.groupBy(F.coalesce("reason", F.lit("kept")).alias("outcome"))
        .agg(F.count("*").alias("n"))
    )
    if materialize:
        spark = docs.sparkSession
        report = spark.createDataFrame(report.collect(), schema=report.schema)
    return clean, report
