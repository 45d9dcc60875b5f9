"""Bigram LM: hand-computed probabilities, unk mapping, held-out scoring."""

import math

from pyspark.sql import Row

from beamium_spark.operators.lm import UNK, score_bigram_lm, train_bigram_lm


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_train_counts_and_unk_mapping(spark):
    # 'a' x4, 'b' x3 in vocab (min_count=2); 'z' and 'q' collapse to <unk>
    docs = _docs(spark, ["a b a z", "b a q b a"])
    lm = train_bigram_lm(docs, min_count=2)
    uni = {r.tok: r.c for r in lm.uni.collect()}
    assert uni == {"a": 4, "b": 3, UNK: 2}
    big = {(r.w1, r.w2): r.c for r in lm.big.collect()}
    # doc0 pairs: (a,b)(b,a)(a,z->unk); doc1: (b,a)(a,q->unk)(unk,b)(b,a)(a... wait
    # doc1 tokens: b a q b a → (b,a)(a,q)(q,b)(b,a)
    assert big == {
        ("a", "b"): 1,
        ("b", "a"): 3,
        ("a", UNK): 2,
        (UNK, "b"): 1,
    }
    assert lm.vsize.collect()[0].vsize == 3  # {a, b} + <unk>


def test_score_hand_computed(spark):
    docs = _docs(spark, ["a b a z", "b a q b a"])
    lm = train_bigram_lm(docs, min_count=2)
    out = {r.doc_id: r for r in score_bigram_lm(docs, lm).collect()}
    V = 3
    def lp(cb, cu):
        return math.log((cb + 1.0) / (cu + 1.0 * V))
    # doc0 mapped pairs: (a,b) cb=1 cu(a)=4; (b,a) cb=3 cu(b)=3; (a,unk) cb=2 cu(a)=4
    exp0 = (lp(1, 4) + lp(3, 3) + lp(2, 4)) / 3
    assert out[0].n_bigrams == 3
    assert abs(out[0].avg_logprob - exp0) < 1e-12
    assert abs(out[0].ppl - math.exp(-exp0)) < 1e-9
    # doc1: (b,a) cb=3 cu=3; (a,unk) cb=2 cu=4; (unk,b) cb=1 cu(unk)=2; (b,a)
    exp1 = (lp(3, 3) + lp(2, 4) + lp(1, 2) + lp(3, 3)) / 4
    assert out[1].n_bigrams == 4
    assert abs(out[1].avg_logprob - exp1) < 1e-12


def test_short_docs_get_zero_bigrams(spark):
    docs = _docs(spark, ["hello hello hello", "one", ""])
    lm = train_bigram_lm(docs, min_count=1)
    out = {r.doc_id: r for r in score_bigram_lm(docs, lm).collect()}
    assert out[1].n_bigrams == 0 and out[1].avg_logprob is None and out[1].ppl is None
    assert out[2].n_bigrams == 0
    assert out[0].n_bigrams == 2


def test_held_out_scoring_unseen_tokens(spark):
    train = _docs(spark, ["the cat sat on the mat " * 3])
    lm = train_bigram_lm(train, min_count=2)  # vocab: the(6) cat(3) sat(3) on(3) mat(3)
    held = _docs(spark, ["the dog sat"])  # dog unseen → <unk>; (unk,sat) unseen pair
    r = score_bigram_lm(held, lm).collect()[0]
    V = 6  # 5 vocab + unk
    # mapped: (the,unk) cb=0 cu(the)=6; (unk,sat) cb=0 cu(unk)=0
    exp = (math.log(1.0 / (6 + V)) + math.log(1.0 / (0 + V))) / 2
    assert r.n_bigrams == 2
    assert abs(r.avg_logprob - exp) < 1e-12


def test_gibberish_scores_below_fluent(spark):
    fluent = "the cat sat on the mat and the cat sat on the mat again"
    corpus = [fluent] * 20 + ["zq xv qq zx vq xz qv zz xx vv"]
    docs = _docs(spark, corpus)
    lm = train_bigram_lm(docs, min_count=3)
    out = {r.doc_id: r.avg_logprob for r in score_bigram_lm(docs, lm).collect()}
    assert out[20] < out[0]  # gibberish tail is less likely than fluent text


def test_no_broadcast_fallback_matches(spark):
    docs = _docs(spark, ["a b a z", "b a q b a", "a a b b"])
    lm_b = train_bigram_lm(docs, min_count=2, broadcast_vocab=True)
    lm_p = train_bigram_lm(docs, min_count=2, broadcast_vocab=False)
    got_b = sorted(map(tuple, score_bigram_lm(docs, lm_b, broadcast_model=True).collect()))
    got_p = sorted(map(tuple, score_bigram_lm(docs, lm_p, broadcast_model=False).collect()))
    assert got_b == got_p
