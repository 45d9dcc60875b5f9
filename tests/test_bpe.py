"""BPE trainer vs an independent pure-python reference implementation
(same deterministic tiebreak), plus tokenization equivalence."""

from collections import Counter

import pytest


def _ref_train(texts, num_merges, min_count=2):
    wc = Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    syms = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_count:
            break
        merges.append((left, right, n))
        for w in syms:
            syms[w] = _ref_apply(syms[w], left, right)
    return merges, syms


def _ref_apply(s, a, b):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that hat is the hat the cat had",
    "low lower lowest low low",
    "newer newest new news",
    "the the the that that",
]


def test_train_bpe_matches_reference(spark):
    from beamium_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                                 "doc_id long, text string")
    got = train_bpe(docs, num_merges=12, min_count=2, checkpoint_every=4)
    exp, _ = _ref_train(TEXTS, 12, min_count=2)
    assert got == exp
    assert len(got) == 12  # this corpus supports 12 real merges
    # the first merge on this corpus must be a 'the'-family pair
    assert got[0][2] == max(n for _, _, n in got)

    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(docs, num_merges=0)
    with pytest.raises(ValueError, match="min_count"):
        train_bpe(docs, num_merges=1, min_count=0)


def test_train_bpe_min_count_stops_early(spark):
    from beamium_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    # every pair occurs once — min_count=2 stops before the first merge
    assert train_bpe(docs, num_merges=5, min_count=2) == []
    # min_count=1 merges on, deterministically (lexicographic ties)
    got = train_bpe(docs, num_merges=2, min_count=1)
    exp, _ = _ref_train(["ab cd"], 2, min_count=1)
    assert got == exp


def test_apply_bpe_matches_reference_tokens(spark):
    from beamium_spark.operators.bpe import apply_bpe, train_bpe

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                                 "doc_id long, text string")
    merges = train_bpe(docs, num_merges=10, min_count=2)
    out = {r.doc_id: r.tokens for r in apply_bpe(docs, merges).collect()}

    _, _ = _ref_train(TEXTS, 10, min_count=2)
    for i, t in enumerate(TEXTS):
        exp_tokens = []
        for w in t.lower().split():
            s = list(w) + ["</w>"]
            for left, right, _n in merges:
                s = _ref_apply(s, left, right)
            exp_tokens.extend(s)
        assert out[i] == exp_tokens, (i, out[i], exp_tokens)
    # every word's tokens re-concatenate to the word + end marker
    joined = "".join(out[0]).replace("</w>", " ").strip()
    assert joined == TEXTS[0].lower()


def test_bpe_tokens_feed_sequence_packing(spark):
    """The composition a pretraining pipeline runs: train BPE on the
    corpus, tokenize with it, and pack the REAL subword counts into
    fixed-length sequences (pack_sequences' tokens_col plug point)."""
    from pyspark.sql import functions as F

    from beamium_spark.operators.bpe import apply_bpe, train_bpe
    from beamium_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                                 "doc_id long, text string")
    merges = train_bpe(docs, num_merges=8, min_count=2)
    tok = apply_bpe(docs, merges).withColumn("n_bpe", F.size("tokens"))
    packed = pack_sequences(
        tok, seq_len=16, n_shards=2, tokens_col="n_bpe"
    ).collect()
    by_id = {r.id: r for r in packed}
    assert len(by_id) == len(TEXTS)
    tok_counts = {r.doc_id: r.n_bpe for r in tok.collect()}
    for r in packed:
        assert r.n_tokens == tok_counts[r.id]        # real subword counts
        assert r.tok_end - r.tok_start == r.n_tokens
        assert r.seq_first == r.tok_start // 16
        assert r.seq_last == max(r.tok_start, r.tok_end - 1) // 16
    # within a shard, the next doc starts after the EOD separator slot
    for shard in (0, 1):
        rows = sorted((r for r in packed if r.shard == shard),
                      key=lambda r: r.tok_start)
        for a, b in zip(rows, rows[1:]):
            assert b.tok_start == a.tok_end + 1
