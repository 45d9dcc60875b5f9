"""Incremental MinHash-LSH near-dup: store semantics, bucket-winner rule,
portable hash mode equivalence."""

from pyspark.sql import Row

from beamium_spark.operators.dedup import (
    band_frame,
    minhash_dedup_incremental,
    minhash_signatures,
)

FLUENT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
NEAR = FLUENT.replace("warm", "cold")  # one word changed → high jaccard
OTHER = (
    "completely different content about spark shuffle partitioning and "
    "adaptive query execution at terabyte scale with skew salting"
)


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_within_batch_near_dup_dropped(spark):
    docs = _df(spark, [(1, FLUENT), (2, NEAR), (3, OTHER)])
    kept, new_bands = minhash_dedup_incremental(docs, None, num_hashes=64, bands=32)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {1, 3}  # 2 collides with smaller id 1
    band_ids = {r.id for r in new_bands.collect()}
    assert band_ids == {1, 3}  # only kept docs feed the store


def test_cross_batch_dup_dropped_via_store(spark):
    b1 = _df(spark, [(1, FLUENT), (2, OTHER)])
    kept1, bands1 = minhash_dedup_incremental(b1, None, num_hashes=64, bands=32)
    assert {r.doc_id for r in kept1.collect()} == {1, 2}
    # batch 2 re-sends a near-dup of doc 1 plus fresh content
    b2 = _df(spark, [(10, NEAR), (11, "fresh unseen text about gorilla xor compression of timestamps")])
    kept2, bands2 = minhash_dedup_incremental(b2, bands1, num_hashes=64, bands=32)
    assert {r.doc_id for r in kept2.collect()} == {11}
    assert {r.id for r in bands2.collect()} == {11}


def test_exact_duplicate_always_caught(spark):
    b1 = _df(spark, [(1, FLUENT)])
    _, bands1 = minhash_dedup_incremental(b1, None)
    b2 = _df(spark, [(9, FLUENT)])  # byte-identical → identical signature
    kept2, _ = minhash_dedup_incremental(b2, bands1)
    assert kept2.count() == 0


def test_md5_mode_matches_xxhash_decisions(spark):
    docs = _df(spark, [(1, FLUENT), (2, NEAR), (3, OTHER), (4, FLUENT)])
    k_x, _ = minhash_dedup_incremental(docs, None, num_hashes=64, bands=32)
    k_m, _ = minhash_dedup_incremental(
        docs, None, num_hashes=64, bands=32, hash_mode="md5"
    )
    assert {r.doc_id for r in k_x.collect()} == {r.doc_id for r in k_m.collect()}


def test_band_frame_shape_and_portability(spark):
    docs = _df(spark, [(1, FLUENT)])
    bf = band_frame(docs, num_hashes=32, bands=8, hash_mode="md5")
    rows = bf.collect()
    assert len(rows) == 8
    assert rows[0].bh.count("-") == 3  # 4 sig values joined per band
    # portable band key equals the dash-join of the signature slice
    sig = minhash_signatures(docs, 32, hash_mode="md5").collect()[0].sig
    got = {(r.band, r.bh) for r in rows}
    want = {
        (b, "-".join(str(v) for v in sig[b * 4:(b + 1) * 4])) for b in range(8)
    }
    assert got == want


def test_signatures_hash_modes_differ_but_stable(spark):
    docs = _df(spark, [(1, FLUENT)])
    s1 = minhash_signatures(docs, 16).collect()[0].sig
    s2 = minhash_signatures(docs, 16).collect()[0].sig
    s3 = minhash_signatures(docs, 16, hash_mode="md5").collect()[0].sig
    assert s1 == s2
    assert s1 != s3


def test_snapshot_diff_statuses(spark):
    from beamium_spark.operators.dedup import snapshot_diff

    old = _df(spark, [(1, "alpha"), (2, "beta"), (3, "gamma")])
    new = _df(spark, [(2, "beta"), (3, "gamma CHANGED"), (4, "delta")])
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
