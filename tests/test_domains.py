"""Domain reputation stats: aggregates, flag thresholds, corpus join-back."""

from pyspark.sql import Row

from beamium_spark.operators.textstats import domain_stats, flag_by_domain

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs back "
    "to the barn where the farmer keeps the grain for the long winter"
)
SPAM = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15"


def _docs(spark):
    rows = [
        Row(doc_id=1, source="good.com", text=GOOD),
        Row(doc_id=2, source="good.com", text=GOOD + " indeed"),
        Row(doc_id=3, source="dupfarm.net", text=SPAM),
        Row(doc_id=4, source="dupfarm.net", text=SPAM),
        Row(doc_id=5, source="dupfarm.net", text=SPAM),
        Row(doc_id=6, source="dupfarm.net", text=GOOD),
    ]
    return spark.createDataFrame(rows)


def test_domain_stats_values(spark):
    out = {r.domain: r for r in domain_stats(_docs(spark)).collect()}
    g = out["good.com"]
    assert g.n_docs == 2 and g.dup_frac == 0.0 and not g.flagged
    assert g.mean_score == 1.0
    d = out["dupfarm.net"]
    assert d.n_docs == 4
    assert abs(d.dup_frac - 0.5) < 1e-9  # 2 distinct texts / 4 docs
    assert d.flagged  # mean score low AND dup_frac at threshold edge


def test_flag_thresholds(spark):
    # loose thresholds: nothing flagged
    out = domain_stats(_docs(spark), min_score=0.0, max_dup_frac=0.9).collect()
    assert not any(r.flagged for r in out)


def test_flag_by_domain_join_back(spark):
    docs = _docs(spark)
    stats = domain_stats(docs)
    flagged = flag_by_domain(docs, stats)
    got = {r.doc_id: r.domain_flagged for r in flagged.collect()}
    assert got == {1: False, 2: False, 3: True, 4: True, 5: True, 6: True}
    # unseen domain defaults to not-flagged
    extra = spark.createDataFrame([Row(doc_id=9, source="new.org", text=GOOD)])
    got2 = flag_by_domain(extra, stats).collect()[0]
    assert got2.domain_flagged is False


def test_no_broadcast_fallback_matches(spark):
    docs = _docs(spark)
    stats = domain_stats(docs)
    a = sorted(map(tuple, flag_by_domain(docs, stats, broadcast_domains=True).collect()))
    b = sorted(map(tuple, flag_by_domain(docs, stats, broadcast_domains=False).collect()))
    assert a == b


def test_corpus_report_values(spark):
    from pyspark.sql import Row as _Row

    from beamium_spark.operators.textstats import corpus_report

    docs = spark.createDataFrame(
        [_Row(doc_id=1, text=GOOD), _Row(doc_id=2, text=GOOD), _Row(doc_id=3, text=SPAM)]
    )
    r = corpus_report(docs).collect()[0]
    assert r.n_docs == 3 and r.n_distinct_texts == 2
    assert abs(r.dup_frac - (1 - 2 / 3)) < 1e-6
    assert r.total_ws_tokens == 2 * len(GOOD.split()) + len(SPAM.split())
    # mean_score must equal the average of the per-doc quality scores
    from pyspark.sql import functions as F

    from beamium_spark.operators.textstats import quality_score

    scores = [
        row[0]
        for row in docs.select(quality_score(F.col("text"))).collect()
    ]
    assert r.mean_score == round(sum(scores) / len(scores), 6)
    assert abs(
        r.avg_chars - round((2 * len(GOOD) + len(SPAM)) / 3, 6)
    ) < 1e-9


def test_trending_terms_ranks_and_windows(spark):
    import datetime as dt

    from pyspark.sql import Row as _Row

    from beamium_spark.operators.textstats import trending_terms

    d1 = dt.datetime(2025, 1, 1, 10)
    d2 = dt.datetime(2025, 1, 2, 10)
    rows = [
        _Row(warc_ts=d1, text="apple apple banana"),
        _Row(warc_ts=d1, text="apple cherry"),
        _Row(warc_ts=d2, text="durian durian durian banana"),
    ]
    out = trending_terms(spark.createDataFrame(rows), "1 day", k=2)
    got = {(r.window_start.day, r.rank): (r.term, r.n) for r in out.collect()}
    assert got[(1, 1)] == ("apple", 3)
    assert got[(1, 2)] == ("banana", 1)  # tie with cherry → term asc
    assert got[(2, 1)] == ("durian", 3)
    assert got[(2, 2)] == ("banana", 1)
    # bigram mode
    out2 = trending_terms(spark.createDataFrame(rows), "1 day", k=1, n=2)
    top = {r.window_start.day: r.term for r in out2.collect()}
    assert top[1] == "apple apple" and top[2] == "durian durian"
