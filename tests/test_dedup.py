"""Dedup operators over the driver documents table + synthetic near-dups."""

import pytest
from pyspark.sql import functions as F

from beamium_spark.operators.dedup import (
    cluster_representatives,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # graft exact copies and near-copies with known ids
    src = base.filter(F.col("doc_id") < 5).collect()
    extra = []
    for r in src:
        extra.append((10_000 + r["doc_id"], r["text"]))  # exact dup
        extra.append((20_000 + r["doc_id"], r["text"] + " tail tweak words"))  # near dup
    extra_df = spark.createDataFrame(extra, "doc_id long, text string")
    return base.unionByName(extra_df).cache()


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).cache()
    assert out.count() == docs.select("text").distinct().count()
    # kept id is the min id of each text group
    dup = out.filter(F.col("n_copies") > 1)
    assert dup.count() >= 5
    assert dup.filter(F.col("doc_id") >= 10_000).count() == 0


def test_ngram_jaccard_finds_planted_pairs(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).cache()
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(5):
        assert (i, 10_000 + i) in got  # exact dup → jaccard 1.0
    assert pairs.filter((F.col("jaccard") > 1.0) | (F.col("jaccard") < 0.5)).count() == 0


def test_minhash_lsh_matches_bruteforce(spark, docs):
    brute = ngram_jaccard_pairs(docs, threshold=0.8)
    lsh = minhash_lsh_pairs(docs, threshold=0.8)
    assert brute.exceptAll(lsh).count() == 0
    assert lsh.exceptAll(brute).count() == 0


def test_simhash_finds_exact_dups(spark, docs):
    pairs = simhash_pairs(docs, max_hamming=3).cache()
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(5):
        assert (i, 10_000 + i) in got
    assert pairs.filter(F.col("hamming") > 3).count() == 0


def test_cluster_representatives(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    labels = {r["id"]: r["rep"] for r in cluster_representatives(pairs).collect()}
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10
    assert labels[20] == labels[21] == labels[22] == labels[23] == 20


def test_exact_dedup_matches_full_text_groupby(spark, docs):
    from pyspark.sql import functions as F

    out = {
        (r["doc_id"], r["text_len"], r["n_copies"])
        for r in exact_dedup(docs).collect()
    }
    brute = {
        (r["doc_id"], r["text_len"], r["n_copies"])
        for r in docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", F.length("text").alias("text_len"), "n_copies")
        .collect()
    }
    assert out == brute


def test_exact_dedup_keep_text(spark, docs):
    from pyspark.sql import functions as F

    out = exact_dedup(docs, keep_text=True)
    assert "text" in out.columns
    bad = out.filter(F.length("text") != F.col("text_len")).count()
    assert bad == 0


def test_simhash_xxhash64_mode(spark, docs):
    # the cheaper engine-specific production hash finds the same planted
    # exact dups as the portable md5 mode
    pairs = simhash_pairs(docs, max_hamming=3, jaccard_verify=None, hash_mode="xxhash64")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(5):
        assert (i, 10_000 + i) in got


def test_cluster_representatives_deep_path(spark):
    """A 40-hop path (deeper than max_iters) must converge via the
    pointer-jumping shortcut — O(log diameter), not O(diameter)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    labels = {r["id"]: r["rep"] for r in cluster_representatives(pairs).collect()}
    assert all(rep == 0 for rep in labels.values())


def test_cluster_representatives_raises_on_nonconvergence(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        cluster_representatives(pairs, max_iters=2)


def test_canonical_url_edges(spark):
    from beamium_spark.operators.dedup import canonical_url

    cases = [
        ("HTTPS://Example.COM/Path#frag", "https://example.com/Path"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com/a/", "https://example.com/a/"),  # only bare-path slash
        ("https://example.com/x?q=1#f", "https://example.com/x?q=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_earliest_wins(spark):
    import datetime as dt

    from beamium_spark.operators.dedup import url_dedup

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        ("https://a.example/x", t0),
        ("HTTPS://A.example/x#f", t0 + dt.timedelta(hours=1)),
        ("https://b.example/y", t0),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    out = {r["canonical_url"]: (r["kept_url"], r["n_crawls"]) for r in url_dedup(pages).collect()}
    assert out["https://a.example/x"] == ("https://a.example/x", 2)
    assert out["https://b.example/y"] == ("https://b.example/y", 1)


def test_paragraph_dedup_stats(spark):
    from beamium_spark.operators.dedup import paragraph_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\ngamma delta"),
            (2, "gamma delta\n \nunique two"),   # blank-ish separator
            (3, "solo paragraph"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: (r["n_paragraphs"], r["n_dup_paragraphs"]) for r in paragraph_dedup_stats(docs).collect()}
    assert out[1] == (2, 1)  # "gamma delta" shared with doc 2
    assert out[2] == (2, 1)
    assert out[3] == (1, 0)


def test_dedup_paragraphs_rewrite(spark):
    """First occurrence (min doc_id, pos) of each paragraph survives;
    cross-doc and within-doc repeats are removed; texts reassemble in
    order; fully-claimed docs come back empty."""
    from beamium_spark.operators.dedup import dedup_paragraphs_rewrite

    docs = spark.createDataFrame(
        [
            (1, "alpha one\n\nshared boiler\n\nalpha two"),
            (2, "shared boiler\n\nbeta one\n\nshared boiler"),  # within-doc repeat too
            (3, "shared boiler"),                               # fully claimed
            (4, "gamma\n \n  \ngamma tail"),                    # blank-ish separators
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in dedup_paragraphs_rewrite(docs).collect()}
    assert out[1]["text"] == "alpha one\n\nshared boiler\n\nalpha two"
    assert (out[1]["n_paragraphs"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text"] == "beta one"
    assert (out[2]["n_paragraphs"], out[2]["n_kept"]) == (3, 1)
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["text"] == "gamma\n\ngamma tail"  # separators normalized


def test_paragraph_rewrite_matches_bruteforce(spark):
    """Property: rewrite == a dict-based reference over random corpora
    (first (doc, pos) occurrence of each paragraph survives)."""
    import random
    import re

    rng = random.Random(7)
    vocab = [f"p{i}" for i in range(6)]  # small vocab forces collisions
    rows = []
    for did in range(12):
        paras = [rng.choice(vocab) for _ in range(rng.randint(1, 5))]
        rows.append((did, "\n\n".join(paras)))
    from beamium_spark.operators.dedup import dedup_paragraphs_rewrite

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["text"], r["n_paragraphs"], r["n_kept"])
           for r in dedup_paragraphs_rewrite(docs).collect()}

    seen = set()
    want = {}
    for did, text in rows:  # rows are in (doc_id, pos) order already
        paras = [p for p in re.split(r"\n\s*\n", text) if p.strip()]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[did] = ("\n\n".join(kept), len(paras), len(kept))
    assert got == want


def test_minhash_high_dup_rate_without_broadcast(spark):
    """A 90%-duplicate corpus (the fresh-crawl-snapshot case that would
    overflow the candidate-id broadcast) must produce identical verified
    pairs with broadcast_ids=False and the planner's auto-broadcast fully
    disabled, and the adaptive int form must match too."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long familiar song about rivers and rain in the late evening"
    )
    # 10 distinct texts; 90 more docs repeat the first one → 90% dups
    rows = [(i, f"{base} variant {i}") for i in range(10)]
    rows += [(100 + i, base + " variant 0") for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        want = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
        )
        got_plain = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in minhash_lsh_pairs(
                docs, threshold=0.8, broadcast_ids=False
            ).collect()
        )
        # threshold of 5 ids: far exceeded here → takes the plain-join arm
        got_adaptive = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in minhash_lsh_pairs(
                docs, threshold=0.8, broadcast_ids=5
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # one-word variants of a ~25-word text sit at jaccard ≈ 0.92 ≥ 0.8, so
    # ALL docs pair mutually: C(100,2) — the worst case for the id prune
    assert len(want) == 100 * 99 // 2
    assert got_plain == want
    assert got_adaptive == want


def test_pairs_materialize_releases_internal_caches(spark, docs):
    """materialize=True: the returned pair frame is the ONLY cached object
    left (caller-owned); releasing it returns storage to baseline. Both
    LSH families, identical answers to the lazy form."""
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()

    want = sorted(
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    )
    spark.catalog.clearCache()

    pairs = minhash_lsh_pairs(docs, threshold=0.8, materialize=True)
    assert not cm.isEmpty()  # exactly the result cache
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == want
    pairs.unpersist()
    assert cm.isEmpty(), "internal caches survived materialize=True"

    sim = simhash_pairs(docs, max_hamming=3, jaccard_verify=0.8, materialize=True)
    sim.count()
    sim.unpersist()
    assert cm.isEmpty()


def test_exact_dedup_incremental(spark):
    from beamium_spark.operators.dedup import (
        exact_dedup_incremental,
        signature_frame,
    )

    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], ["doc_id", "text"]
    )
    kept1, sigs1 = exact_dedup_incremental(b1)
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]
    assert sigs1.count() == 2

    # batch 2: one cross-batch dup, one in-batch dup pair, one fresh doc
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        ["doc_id", "text"],
    )
    kept2, sigs2 = exact_dedup_incremental(b2, sigs1)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [11, 13]
    # kept keeps ALL original columns
    assert set(kept2.columns) == {"doc_id", "text"}
    assert sigs2.count() == 2

    # appending sigs makes a third batch drop everything seen so far
    store = sigs1.unionByName(sigs2)
    b3 = spark.createDataFrame(
        [(20, "alpha"), (21, "gamma"), (22, "delta")], ["doc_id", "text"]
    )
    kept3, _ = exact_dedup_incremental(b3, store)
    assert kept3.count() == 0

    # signature_frame of the kept union == the store contents
    full = b1.unionByName(b2)
    kept_all = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (11, "gamma"), (13, "delta")],
        ["doc_id", "text"],
    )
    a = {tuple(r) for r in signature_frame(kept_all).collect()}
    b = {tuple(r) for r in store.collect()}
    assert a == b


def test_url_filter_stats_rules_and_precedence(spark):
    from beamium_spark.operators.dedup import url_filter_stats

    urls = [
        ("https://good.example/article.html",            None),
        ("http://good.example/path/page",                None),
        ("ftp://files.example/a.txt",                    "bad_scheme"),
        ("no-scheme-at-all",                             "bad_scheme"),
        ("https://user:pw@trap.example/page",            "userinfo"),
        ("https://192.168.10.1/admin",                   "ip_host"),
        ("https://cdn.example/logo.PNG",                 "bad_extension"),
        ("https://cdn.example/app.js?v=3",               "bad_extension"),
        ("https://shop.example/f?" + "&".join(f"p{i}=1" for i in range(12)),
                                                         "too_many_params"),
        ("https://long.example/" + "a" * 3000,           "too_long"),
        ("https://ads.blocked.example/page",             "blocked_host"),
        # precedence: userinfo fires before the bad extension
        ("https://u@trap.example/x.zip",                 "userinfo"),
    ]
    pages = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = {r.url: (r.reason, r.keep) for r in url_filter_stats(
        pages, host_blocklist=("blocked.example",)
    ).collect()}
    for u, want in urls:
        reason, keep = got[u]
        assert reason == want, (u, reason, want)
        assert keep == (want is None)
    # host extraction strips userinfo and port
    host = {r.url: r.host for r in url_filter_stats(
        spark.createDataFrame([("https://u@h.example:8443/p",)], "url string")
    ).collect()}
    assert host["https://u@h.example:8443/p"] == "h.example"
