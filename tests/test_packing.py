"""Sequence packing (operators/packing.py): concat-and-chunk layout
invariants, straddle detection, empty docs, and the per-sequence
manifest."""

import pytest

from beamium_spark.operators.packing import pack_sequences, sequence_manifest


@pytest.fixture(scope="module")
def packed(spark):
    # one shard so the layout is a single known stream; seq_len 10
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # 4 tokens -> [0, 4), sep at 4
            (2, ""),                 # 0 tokens -> [5, 5), sep at 5
            (3, " ".join(["x"] * 12)),  # 12 tokens -> [6, 18) straddles
            (4, "y z"),              # 2 tokens -> [19, 21)
        ],
        ["doc_id", "text"],
    )
    return pack_sequences(docs, seq_len=10, n_shards=1, eod_tokens=1)


def test_layout_is_gapless_prefix_sum(packed):
    rows = {r["id"]: r for r in packed.collect()}
    assert (rows[1]["tok_start"], rows[1]["tok_end"]) == (0, 4)
    assert (rows[2]["tok_start"], rows[2]["tok_end"]) == (5, 5)
    assert (rows[3]["tok_start"], rows[3]["tok_end"]) == (6, 18)
    assert (rows[4]["tok_start"], rows[4]["tok_end"]) == (19, 21)
    # every doc's slot (incl. separator) abuts the next doc's start
    ordered = sorted(rows.values(), key=lambda r: r["tok_start"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["tok_end"] + 1 == b["tok_start"]


def test_window_assignment_and_straddle(packed):
    rows = {r["id"]: r for r in packed.collect()}
    assert (rows[1]["seq_first"], rows[1]["seq_last"]) == (0, 0)
    # empty doc: own-token window = window of its slot start
    assert (rows[2]["seq_first"], rows[2]["seq_last"]) == (0, 0)
    # doc 3 spans tokens 6..17 -> windows 0 and 1
    assert (rows[3]["seq_first"], rows[3]["seq_last"]) == (0, 1)
    assert (rows[4]["seq_first"], rows[4]["seq_last"]) == (1, 2)


def test_manifest(packed):
    m = {
        (r["shard"], r["seq_id"]): r
        for r in sequence_manifest(packed, seq_len=10).collect()
    }
    assert m[(0, 0)]["n_docs"] == 3 and m[(0, 0)]["first_id"] == 1
    assert m[(0, 1)]["n_docs"] == 2  # doc 3 tail + doc 4 head
    assert m[(0, 2)]["n_docs"] == 1 and m[(0, 2)]["last_id"] == 4


def test_sharding_is_deterministic_and_partition_independent(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w w w") for i in range(200)], ["doc_id", "text"]
    )
    a = pack_sequences(docs, seq_len=16, n_shards=8).collect()
    b = pack_sequences(docs.repartition(7), seq_len=16, n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    shards = {r["shard"] for r in a}
    assert shards <= set(range(8)) and len(shards) > 1
    # per shard: intervals are disjoint, ascending by id, gapless
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["id"])
        pos = 0
        for r in rows:
            assert r["tok_start"] == pos
            pos = r["tok_end"] + 1


def test_portable_matches_md5(spark):
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], ["doc_id", "text"]
    )
    import hashlib

    out = pack_sequences(docs, seq_len=8, n_shards=4, portable=True).collect()
    for r in out:
        h = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:15], 16)
        assert r["shard"] == h % 4


def test_validation(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, n_shards=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, eod_tokens=-1)
