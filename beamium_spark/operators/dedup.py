"""Deduplication operators for training-data pipelines.

Four tiers of dedup over a ``documents(doc_id, text, ...)`` table, each
Spark-first:

- ``exact_dedup``          — hash-groupBy, keep min doc_id (one shuffle)
- ``ngram_jaccard_pairs``  — exact all-pairs Jaccard over word n-grams
                             (token-explode + equi-join; the brute-force
                             baseline and the verifier for the LSH paths)
- ``minhash_lsh_pairs``    — MinHash signatures → banded LSH bucket join →
                             exact-Jaccard verification of candidates
- ``simhash_pairs``        — 64-bit SimHash, banded by 16-bit chunks →
                             Hamming-distance candidates → exact verify

Scale notes (the whole point of LSH here):

- exact all-pairs is O(n²) in candidate generation — the token join
  explodes on common n-grams; usable for oracles/small corpora only.
- MinHash: signature build is one narrow pass (no shuffle); the bucket
  join shuffles on (band, band_hash) — cardinality ~n·B rows, and only
  colliding docs meet. With B bands of R rows, a pair at Jaccard j is
  missed with probability (1-j^R)^B — 1e-7 at j=0.8, B=32, R=4 — so the
  exact-verify stage makes the output equal to the brute-force answer
  w.h.p. while scaling ~linearly.
- Exchange payloads stay narrow end-to-end: band joins ship only
  (id, band, key) rows for BOTH minhash and simhash, and the verify
  stages prune gram arrays to candidate docs via a broadcast semi-join
  before attaching them (``_verify_jaccard_pruned``) — the corpus's
  n-gram text never enters a shuffle. Pinned by
  tests/test_plans_shape.py::test_lsh_band_exchanges_are_narrow.
- dedup *clusters* come from connected components over pairs; we provide
  one union-find pass per partition + iterative min-propagation
  (``cluster_representatives``) bounded by component diameter.

MinHash background: Broder, "On the resemblance and containment of
documents" (1997); banding analysis per Leskovec/Rajaraman/Ullman, MMDS
ch.3. SimHash: Charikar (2002), Manku et al. (WWW 2007).

Cache lifecycle: ``minhash_lsh_pairs`` and ``simhash_pairs`` cache small
intermediates (signatures; candidate pairs) that the returned LAZY frame
references more than once — unpersisting inside the function would force
recomputation (or eager materialization, breaking plan inspection). The
cached blocks live until the caller releases them: one-shot batch jobs
drop them with the session; a long-lived session that runs dedup
repeatedly should call ``spark.catalog.clearCache()`` (or
``df.unpersist()`` on the inputs it holds) between passes, or cached
blocks accumulate in executor storage memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime — MinHash permutation field. 31 bits keeps the
# affine products a·h (< 2^62) inside int64 so the whole signature build
# stays in Catalyst long arithmetic (ANSI-safe), at collision odds
# (~n²/2³¹) irrelevant for shingle sets.
_P = (1 << 31) - 1


def _word_ngrams(text: Column, n: int) -> Column:
    """text → array of distinct word n-gram strings (engine-neutral
    tokens: the joined words themselves, not engine-specific hashes)."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return F.array_distinct(grams)


def exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Exact dedup: one row per distinct text, keeping the smallest id.
    Returns (id, text_len, n_copies) [+ text when ``keep_text``].

    Scale shape: the shuffle carries only (h1, h2, id, len) — ~28 bytes per
    row, never the document body. h1 = xxhash64(text) is the grouping key;
    h2 is an independent second hash used as a collision detector: a group
    whose members disagree on h2 holds ≥2 distinct texts behind one h1
    value (~n²/2⁶⁴ of them), and exactly those groups are re-resolved with
    a full-text aggregation over the tiny collided subset (broadcast
    semi-join back to the corpus). Undetected collisions would need a
    simultaneous 128-bit double collision (~n²/2¹²⁸) — negligible at 10¹²
    docs. ``keep_text`` re-joins winners to the corpus by id instead of
    dragging the body through the exchange."""
    h1 = F.xxhash64(text_col)
    h2 = F.xxhash64(F.lit("bmx2"), F.col(text_col))
    narrow = docs.select(
        F.col(id_col).alias("__id"),
        h1.alias("__h"),
        h2.alias("__h2"),
        F.length(text_col).alias("text_len"),
    )
    g = narrow.groupBy("__h").agg(
        F.min("__id").alias(id_col),
        F.count("*").alias("n_copies"),
        F.min("text_len").alias("text_len"),
        F.count_distinct("__h2").alias("__nd"),
    )
    clean = g.filter(F.col("__nd") == 1).select(id_col, "text_len", "n_copies")
    collided = g.filter(F.col("__nd") > 1).select(F.col("__h").alias("__hc"))
    resolved = (
        docs.withColumn("__h", h1)
        .join(F.broadcast(collided), F.col("__h") == F.col("__hc"))
        .groupBy("__h", text_col)
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, F.length(text_col).alias("text_len"), "n_copies")
    )
    out = clean.unionByName(resolved)
    if keep_text:
        body = docs.select(F.col(id_col), F.col(text_col))
        out = out.join(body, id_col)
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs (a < b) with exact n-gram Jaccard ≥ threshold.
    Token equi-join + pair aggregation — the brute-force baseline."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_word_ngrams(F.col(text_col), n)).alias("tok")
    )
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_perms(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """The seeded affine-permutation constants (a_k, b_k) shared by every
    MinHash path — exposed so oracle/SQL generators can embed the exact
    same literals."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(num_hashes)]


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 128,
    n: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<long>) — MinHash over word n-gram xxhash64 values
    with ``num_hashes`` seeded affine permutations h_k(x) = (a_k·x+b_k) mod P.

    No shuffle; both impls produce bit-identical signatures (pure int64
    math) in ONE pass over the token hashes:

    - ``impl='arrow'`` (default): tokenize + xxhash64 JVM-side, then one
      Arrow-batched numpy broadcast for the (num_hashes × tokens) min
      reduction — measured ~10× the Catalyst fold at 128 perms.
    - ``impl='catalyst'``: zero-Python fold (aggregate + zip_with against
      literal (a_k, b_k) arrays).

    The naive form — num_hashes separate ``array_min(transform(...))``
    columns — re-inlines the whole gram+hash build into every permutation
    (Catalyst collapses the projections), costing 128× the tokenization
    work per row; both impls here avoid that."""
    perms = minhash_perms(num_hashes, seed)
    grams = _word_ngrams(F.col(text_col), n)
    token_hash = portable_hash60 if hash_mode == "md5" else F.xxhash64
    hashes = F.transform(grams, lambda g: F.pmod(token_hash(g), F.lit(_P)))
    base = docs.select(
        F.col(id_col).alias("id"), hashes.alias("__h"), grams.alias("__grams")
    )
    if impl == "arrow":
        # Arrow-vectorized minima: token hashing stays JVM-side; the
        # (num_hashes × tokens) min-reduction is one numpy broadcast per
        # batch. Products a·h < 2^62 stay inside int64.
        import numpy as np

        A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
        B = np.array([b for _, b in perms], dtype=np.int64)[:, None]

        def _sig_fn(hs):
            def one(h):
                hv = np.asarray(h, dtype=np.int64)[None, :]
                return ((A * hv + B) % _P).min(axis=1)

            return hs.map(one)

        sig = F.pandas_udf(_sig_fn, "array<long>")(F.col("__h"))
    else:
        # pure-Catalyst one-pass fold: all num_hashes running minima
        # updated per token via indexed zip_with against literal (a, b)
        # arrays
        a_arr = F.array(*[F.lit(a).cast("long") for a, _ in perms])
        b_arr = F.array(*[F.lit(b).cast("long") for _, b in perms])
        sig = F.aggregate(
            F.col("__h"),
            F.array_repeat(F.lit(_P).cast("long"), num_hashes),
            lambda acc, h: F.zip_with(
                F.zip_with(
                    acc, a_arr, lambda m, a: F.struct(m.alias("m"), a.alias("a"))
                ),
                b_arr,
                lambda ma, b: F.least(ma["m"], F.pmod(h * ma["a"] + b, F.lit(_P))),
            ),
        )
    return base.select("id", sig.alias("sig"), "__grams")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_ids: bool | int = True,
    materialize: bool = False,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified by **exact** Jaccard on the
    n-gram sets. Shuffles: one on (band, band_hash) for the bucket join,
    one pair aggregation. Output matches the brute-force answer whenever
    LSH recall holds (P[miss] = (1-j^R)^B, ~1e-7 at the defaults).
    ``broadcast_ids`` — see :func:`_verify_jaccard_pruned`: set False (or
    an id-count threshold) on mostly-duplicate corpora where the
    candidate-id set would outgrow the broadcast limit.

    ``materialize=True`` is the long-lived-session form (see the module
    docstring's cache-lifecycle note): the result is computed eagerly
    into its own cache and every INTERNAL cache (signatures, candidate
    pairs) is released before return — the one cached object left behind
    is the returned pair frame itself, which the caller owns
    (``.unpersist()`` when done). The default keeps the plan fully lazy
    and inspectable, with internal caches living until the caller clears
    them."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, n, seed, text_col, id_col).cache()
    registry: list[DataFrame] = [sigs]
    banded = _band_keys(sigs, bands, rows)
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    verified = _verify_jaccard_pruned(
        cand, sigs.select("id", "__grams"), threshold, broadcast_ids, registry
    )
    out = verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    return _materialize_and_release(out, registry) if materialize else out


def _materialize_and_release(out: DataFrame, registry: list[DataFrame]) -> DataFrame:
    """Eager-cache ``out`` (one count forces the whole pipeline while the
    internal caches are still live and doing their de-duplication-of-work
    job), then release every registered internal cache. Afterward the
    result's blocks are the only storage footprint; should they be
    evicted, lineage recomputes without the internal caches — slower,
    never wrong."""
    out = out.cache()
    out.count()
    for df in registry:
        df.unpersist()
    return out


def _verify_jaccard_pruned(
    cand: DataFrame,
    grams_src: DataFrame,
    threshold: float,
    broadcast_ids: bool | int = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs with the gram
    arrays pruned to candidate docs FIRST.

    The distinct candidate-id set (≪ corpus at any sane dup rate) is
    broadcast into a semi-join against ``grams_src`` (id, __grams), so the
    full corpus's gram arrays never enter an exchange — grams leave their
    scan only for docs that actually appear in a candidate pair, then flow
    through two candidate-sized id-joins. A plain semi/inner join without
    the broadcast hint would sort-merge and ship EVERY doc's __grams array
    through the shuffle — the shape this replaces at sane dup rates.

    ``broadcast_ids`` governs that hint for corpora where the candidate
    set is NOT small (a fresh crawl snapshot that is mostly duplicates
    would blow the driver/executor broadcast limit):

    - ``True`` (default): always hint — right whenever dup rate is sane;
    - ``False``: plain shuffled semi-join on the narrow id key (grams
      arrays ship once, hash-partitioned by id — the unavoidable cost
      when the id set exceeds broadcast range); AQE may still pick a
      runtime broadcast if the set turns out genuinely small;
    - ``int N``: adaptive — count the candidate-id set (one bounded job
      over the already-cached narrow candidate frame) and hint only when
      it holds ≤ N ids.

    ``cand`` may carry extra columns (e.g. simhash hamming); they pass
    through. Adds ``jaccard``; keeps pairs ≥ threshold.
    """
    cand = cand.cache()  # referenced three times: id set + both id-joins
    if cache_registry is not None:
        cache_registry.append(cand)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    if isinstance(broadcast_ids, bool):
        hint = broadcast_ids
    else:
        hint = cand_ids.count() <= int(broadcast_ids)
    pruned = grams_src.join(
        F.broadcast(cand_ids) if hint else cand_ids, "id", "left_semi"
    )
    return (
        cand.join(
            pruned.select(F.col("id").alias("id_a"), F.col("__grams").alias("g_a")),
            "id_a",
        )
        .join(
            pruned.select(F.col("id").alias("id_b"), F.col("__grams").alias("g_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("g_a", "g_b"))
            / F.size(F.array_union("g_a", "g_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .drop("g_a", "g_b")
    )


def portable_hash60(c: Column) -> Column:
    """Engine-neutral 60-bit token hash: the first 15 hex chars of md5.
    DuckDB reproduces it exactly (``CAST('0x'||substring(md5(x),1,15) AS
    BIGINT)``), which is what lets the simhash pipeline carry a full SQL
    oracle instead of a rows-only check. md5 is JVM-side (no Python)."""
    return F.conv(F.substring(F.md5(F.encode(c, "UTF-8")), 1, 15), 16, 10).cast("long")


def simhash(text: Column, n: int = 3, bits: int = 60, hash_mode: str = "md5") -> Column:
    """SimHash over word n-grams: bit b of the result is the majority vote
    of bit b across all token hashes (Charikar 2002). Catalyst-only — the
    per-bit popcounts are unrolled expressions, each of which re-inlines
    the tokenization after projection collapse; fine for one-off column
    use, but the production pipeline (``simhash_pairs``) computes token
    hashes once and reduces them with the Arrow-vectorized
    ``_simhash_from_hashes`` instead (bit-identical output).

    ``hash_mode='md5'`` (default) uses the engine-neutral 60-bit md5-prefix
    token hash so a DuckDB oracle reproduces the result bit-for-bit;
    ``'xxhash64'`` is the cheaper 64-bit production hash (engine-specific).
    """
    if hash_mode == "md5":
        bits = min(bits, 60)
        token_hash = portable_hash60
    else:
        def token_hash(g):
            return F.xxhash64(g)
    grams = _word_ngrams(text, n)
    hashes = F.transform(grams, token_hash)
    n_tok = F.size(hashes)

    def _bit_pred(b: int):
        return lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1

    total = F.lit(0).cast("long")
    for b in range(bits):
        bit_val = F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
        cnt_b = F.size(F.filter(hashes, _bit_pred(b)))
        total = total + F.when(cnt_b * 2 > n_tok, bit_val).otherwise(
            F.lit(0).cast("long")
        )
    return total


def _simhash_from_hashes(hashes: Column, bits: int) -> Column:
    """Token-hash array → SimHash, Arrow-vectorized: one numpy broadcast
    for the (tokens × bits) popcount instead of ``bits`` unrolled
    per-bit filter expressions, each of which would re-inline the whole
    tokenization (the same Catalyst projection-collapse trap the MinHash
    signature build hits). Produces bit-identical values to
    :func:`simhash`."""
    import numpy as np

    idx = np.arange(bits, dtype=np.uint64)

    def _fn(hs):
        def one(h):
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64)
            cnt = ((hv[:, None] >> idx[None, :]) & np.uint64(1)).sum(axis=0)
            maj = np.nonzero(2 * cnt > len(hv))[0]
            val = 0
            for b in maj:
                val |= 1 << int(b)
            if val >= 1 << 63:
                val -= 1 << 64
            return val

        return hs.map(one)

    return F.pandas_udf(_fn, "long")(hashes)


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    jaccard_verify: float | None = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "md5",
    broadcast_ids: bool | int = True,
    materialize: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the hash into 4 equal-width keys
    (Hamming ≤ 3 ⇒ at least one band equal, Manku et al. WWW'07),
    bucket-join, filter by exact Hamming distance, optionally verify by
    exact n-gram Jaccard. With the default engine-neutral hash the whole
    pipeline is reproducible in DuckDB — banding, Hamming, and verify.
    ``broadcast_ids`` / ``materialize`` — same contract as
    :func:`minhash_lsh_pairs`."""
    bits = 60 if hash_mode == "md5" else 64
    band_bits = bits // 4
    band_mask = (1 << band_bits) - 1
    token_hash = portable_hash60 if hash_mode == "md5" else (lambda g: F.xxhash64(g))
    grams = _word_ngrams(F.col(text_col), n)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.transform(grams, token_hash).alias("__h"),
        grams.alias("__grams"),
    )
    sh = base.select(
        "id", _simhash_from_hashes(F.col("__h"), bits).alias("sh"), "__grams"
    ).cache()
    registry: list[DataFrame] = [sh]
    # scale shape: the banded self-join exchanges ONLY (id, band, bh) —
    # ~20 B/row × 4 bands — never the simhash (refetched by id below) and
    # never the gram arrays (refetched for hamming-surviving pairs only).
    # Mirrors minhash_lsh_pairs' narrow banding; the round-2 form carried
    # sh + __grams through the exchange 4× per doc.
    banded = sh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("sh", bi * band_bits)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bh"),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sh_narrow = sh.select("id", "sh")
    out = (
        cand.join(sh_narrow.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh_narrow.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    if jaccard_verify is not None:
        out = _verify_jaccard_pruned(
            out, sh.select("id", "__grams"), jaccard_verify, broadcast_ids, registry
        )
    out = out.select("id_a", "id_b", "hamming")
    return _materialize_and_release(out, registry) if materialize else out


def cluster_representatives(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over dup pairs → (id, rep) with rep = min id of
    the component.

    Min-label propagation over edges, plus a pointer-jumping shortcut per
    round (rep := rep-of-rep — the label graph halves in depth every
    iteration, the public parent-doubling idea behind large-star/small-star,
    Kiveris et al., SoCC'14), so convergence takes O(log diameter) rounds:
    a 1000-hop path converges in ~10 iterations instead of 1000. Each round
    is two narrow (id, rep) joins; one driver-synced convergence count per
    round (bounded control plane).

    Raises ``RuntimeError`` if the loop exits without converging — silent
    partial labels would split a dup cluster downstream."""
    edges = (
        pairs.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
        .union(pairs.select(F.col("id_b"), F.col("id_a")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("rep", F.col("id"))
    )
    converged = False
    for _ in range(max_iters):
        prop = (
            edges.join(labels.withColumnRenamed("id", "y2"), F.col("y") == F.col("y2"))
            .groupBy("x")
            .agg(F.min("rep").alias("nrep"))
        )
        new_labels = (
            labels.join(prop, labels.id == prop.x, "left")
            .select(
                "id", F.least(F.col("rep"), F.coalesce("nrep", F.col("rep"))).alias("rep")
            )
        )
        # pointer jumping: rep := min(rep, rep's rep). reps are always node
        # ids present in labels, so the lookup join is total; min-monotone,
        # so the final fixpoint (min id reachable) is unchanged — only the
        # number of rounds to reach it drops from O(diameter) to O(log).
        jump = new_labels.select(
            F.col("id").alias("__rid"), F.col("rep").alias("__rrep")
        )
        new_labels = new_labels.join(
            jump, new_labels.rep == jump.__rid, "left"
        ).select(
            "id",
            F.least(F.col("rep"), F.coalesce("__rrep", F.col("rep"))).alias("rep"),
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .count()
        )
        labels = new_labels.localCheckpoint()
        if changed == 0:
            converged = True
            break
    if not converged:
        edges.unpersist()
        raise RuntimeError(
            f"cluster_representatives did not converge in {max_iters} iterations"
        )
    # labels is checkpointed (self-contained) — the edge cache is dead
    # weight from here on; release it instead of leaking it to the caller
    edges.unpersist()
    return labels


def canonical_url(url: Column) -> Column:
    """URL canonicalization for crawl dedup: lowercase scheme+host, strip
    the fragment, default ports, and a trailing slash on a bare path.
    Pure engine-neutral regex/string ops (the DuckDB oracle applies the
    identical expressions), zero shuffle."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment never reaches a server
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    rest = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(https://[^/?]*):443$", r"$1")
    head = F.regexp_replace(head, r"^(http://[^/?]*):80$", r"$1")
    out = F.concat(head, rest)
    return F.regexp_replace(out, r"^([a-z][a-z0-9+.-]*://[^/?]*)/$", r"$1")


def url_dedup(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """One row per canonical URL: earliest crawl wins (min ts, ties → min
    raw url). The crawl-frontier dedup every Common-Crawl-style pipeline
    runs before text dedup. One hash aggregate keyed on the canonical
    string — shuffle rows bounded by distinct-URL cardinality after
    map-side combine; no document bytes in the exchange."""
    c = canonical_url(F.col(url_col))
    return (
        pages.select(c.alias("canonical_url"), F.col(url_col).alias("url"), F.col(ts_col).alias("ts"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_crawls"),
            F.min(F.struct("ts", "url")).alias("__first"),
        )
        .select(
            "canonical_url",
            F.col("__first.url").alias("kept_url"),
            F.col("__first.ts").alias("first_ts"),
            "n_crawls",
        )
    )


#: path extensions that never carry training text (binaries/media/assets)
URL_EXT_BLOCKLIST = (
    "jpg", "jpeg", "png", "gif", "webp", "svg", "ico",
    "mp3", "mp4", "avi", "mov", "webm",
    "zip", "gz", "tar", "rar", "7z", "exe", "dmg", "iso",
    "css", "js", "woff", "woff2", "ttf",
)


def url_filter_stats(
    pages: DataFrame,
    url_col: str = "url",
    allowed_schemes: tuple[str, ...] = ("http", "https"),
    ext_blocklist: tuple[str, ...] = URL_EXT_BLOCKLIST,
    host_blocklist: tuple[str, ...] = (),
    max_len: int = 2048,
    max_query_params: int = 8,
) -> DataFrame:
    """Crawl-frontier URL filtering (the RefinedWeb/CCNet pre-fetch
    pass): verdict per URL BEFORE any text is touched — the cheapest
    stage of the pipeline, so it runs first. Complements
    :func:`canonical_url`/:func:`url_dedup` (identity) with POLICY.

    Rules, first failing one is the ``reason``:

    - ``bad_scheme``       — scheme missing or ∉ ``allowed_schemes``;
    - ``userinfo``         — credentials in the authority (crawler traps);
    - ``ip_host``          — dotted-quad host (no registrable domain);
    - ``too_long``         — > ``max_len`` chars (session-id/loop traps);
    - ``bad_extension``    — path extension ∈ ``ext_blocklist`` (binary/
      media assets that never carry text);
    - ``too_many_params``  — > ``max_query_params`` query params
      (faceted-search/calendar traps);
    - ``blocked_host``     — host contains a ``host_blocklist`` entry
      (policy lists are deployment-supplied; default empty).

    Pure projection (regex/string ops, engine-neutral — the oracle
    replays them verbatim): zero shuffle at any corpus size.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    host = F.regexp_replace(
        F.regexp_replace(authority, r"^.*@", ""), r":\d+$", ""
    )
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    ext = F.lower(F.regexp_extract(path, r"\.([a-zA-Z0-9]+)$", 1))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    blocked = F.lit(False)
    for s in host_blocklist:
        blocked = blocked | F.contains(host, F.lit(s.lower()))
    reason = (
        F.when(~scheme.isin(*[s.lower() for s in allowed_schemes]), F.lit("bad_scheme"))
        .when(F.contains(authority, F.lit("@")), F.lit("userinfo"))
        .when(host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"), F.lit("ip_host"))
        .when(F.length(url) > max_len, F.lit("too_long"))
        .when(ext.isin(*ext_blocklist), F.lit("bad_extension"))
        .when(n_params > max_query_params, F.lit("too_many_params"))
        .when(blocked, F.lit("blocked_host"))
    )
    return pages.select(
        url.alias("url"),
        host.alias("host"),
        reason.alias("reason"),
        reason.isNull().alias("keep"),
    )


def dedup_paragraphs_rewrite(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-corpus duplicate-paragraph REMOVAL with text reassembly —
    the rewrite form of :func:`paragraph_dedup_stats` (MassiveText's
    actual mutation, not just its report): every distinct paragraph text
    survives exactly once corpus-wide, at its first occurrence (min
    (doc_id, position)); all other occurrences — cross-document AND
    within-document repeats — are dropped, and each document's remaining
    paragraphs re-join in order with blank lines.

    Returns (id, text, n_paragraphs, n_kept); documents whose every
    paragraph was claimed elsewhere come back with ``text = ''`` (callers
    typically drop those rows — their content exists verbatim elsewhere).

    Scale shape — the boilerplate-paragraph hazard is handled: the
    winner per paragraph is an AGGREGATION (min struct over the hash
    key), so a paragraph with 10^9 occurrences ("subscribe to our
    newsletter") reduces map-side via partial combine, never in one
    task. Survivors attach via an equi-join on the full (hash, id, pos)
    triple — unique per row, so the join partitioning has no hot key
    either. Reassembly groups by doc (bounded by document size). The
    shuffle carries (hash, id, pos) + the surviving paragraphs' text
    only.

    Collision safety — this op DELETES text, so identity mirrors
    :func:`exact_dedup`'s 128-bit form: paragraphs group on the double
    key (ph, ph2) of two independent xxhash64 values. A single-hash
    collision (~n²/2⁶⁴, expected in the >2³² distinct paragraphs of a
    10¹²-doc corpus) would silently delete the losing paragraph's text;
    with the double key a false merge needs a simultaneous 128-bit
    collision (~n²/2¹²⁸), negligible at 10¹³ paragraphs."""
    paras = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col(text_col), r"\n\s*\n"), lambda p: F.trim(p)
                ),
                lambda p: p != "",
            )
        ).alias("pos", "para"),
    ).withColumn("ph", F.xxhash64("para")).withColumn(
        "ph2", F.xxhash64(F.lit("bmp2"), F.col("para"))
    )
    winners = paras.groupBy("ph", "ph2").agg(
        F.min(F.struct("id", "pos")).alias("w")
    ).select("ph", "ph2", F.col("w.id").alias("wid"), F.col("w.pos").alias("wpos"))
    kept = paras.join(
        winners,
        (paras["ph"] == winners["ph"])
        & (paras["ph2"] == winners["ph2"])
        & (paras["id"] == winners["wid"])
        & (paras["pos"] == winners["wpos"]),
    ).select(paras["id"], "pos", "para")
    rebuilt = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("text"),
    )
    totals = paras.groupBy("id").agg(F.count("*").alias("n_paragraphs"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("text", F.lit("")).alias("text"),
            "n_paragraphs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def paragraph_dedup_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-corpus exact paragraph dedup (the MassiveText/Gopher
    paragraph-level pass): split each doc on blank lines, count per doc how
    many of its paragraphs also appear elsewhere in the corpus.

    Returns (id, n_paragraphs, n_dup_paragraphs, dup_ratio). Shuffle
    carries (double-hash, id) tuples only — the paragraph TEXT stays in
    its scan. Paragraph identity is the same 128-bit (ph, ph2) double
    key as :func:`dedup_paragraphs_rewrite` / :func:`exact_dedup`, so
    false dup counts need a simultaneous 128-bit collision — negligible
    at 10^13 paragraphs.
    """
    paras = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.transform(
                    F.split(F.col(text_col), r"\n\s*\n"), lambda p: F.trim(p)
                ),
                lambda p: p != "",
            )
        ).alias("para"),
    ).select(
        "id",
        F.xxhash64("para").alias("ph"),
        F.xxhash64(F.lit("bmp2"), F.col("para")).alias("ph2"),
    )
    freq = paras.groupBy("ph", "ph2").agg(F.count("*").alias("n"))
    return (
        paras.join(freq, ["ph", "ph2"])
        .groupBy("id")
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.count(F.when(F.col("n") > 1, 1)).alias("n_dup_paragraphs"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_paragraphs") / F.col("n_paragraphs"), 6),
        )
    )


def signature_frame(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(h1, h2): the 128-bit double-hash identity of each document's text
    — the persistable dedup state for :func:`exact_dedup_incremental`.
    ~16 bytes/doc: at 10^12 docs the whole store is ~16 TB of narrow
    parquet, shardable by h1. Write it BUCKETED BY h1 (``.bucketBy(n,
    'h1')`` or the store's clustered-write path) so incremental anti-joins
    co-locate without reshuffling the store side."""
    return docs.select(
        F.xxhash64(text_col).alias("h1"),
        F.xxhash64(F.lit("bmx2"), F.col(text_col)).alias("h2"),
    )


def exact_dedup_incremental(
    new_docs: DataFrame,
    seen_sigs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl exact dedup: dedup ONE new batch against the
    accumulated corpus WITHOUT rescanning it, via the persisted
    :func:`signature_frame` state — the batch-wise form of
    :func:`exact_dedup`, matching the engine's chunked ingest model
    (plans/checkpoint.py discovers new chunks; this dedups them; the
    kept signatures append to the store as the chunk's lineage sibling).

    Returns ``(kept, new_sigs)``:

    - ``kept`` — the rows of ``new_docs`` (all columns) that survive:
      not present in ``seen_sigs``, and the min-``id_col`` winner of any
      within-batch duplicate group.
    - ``new_sigs`` — (h1, h2) of the kept rows; append to the store so
      the next batch sees them. The same text arriving in a later batch
      is then dropped there (first-batch-wins across the stream).

    Scale shape: the in-batch groupBy and the anti-join ship only
    (h1, h2, id) — the shuffle is bounded by the BATCH size on one side;
    the store side avoids a reshuffle when bucketed by h1 (see
    :func:`signature_frame`). Kept rows re-attach by id, so document
    bodies never enter an exchange. Identity is the 128-bit pair —
    undetected collision odds ~n²/2¹²⁸, same contract as
    :func:`exact_dedup`'s double hash.
    """
    narrow = new_docs.select(
        F.col(id_col).alias("__id"),
        F.xxhash64(text_col).alias("h1"),
        F.xxhash64(F.lit("bmx2"), F.col(text_col)).alias("h2"),
    )
    winners = narrow.groupBy("h1", "h2").agg(F.min("__id").alias("__id"))
    if seen_sigs is not None:
        winners = winners.join(
            seen_sigs.select("h1", "h2"), ["h1", "h2"], "left_anti"
        )
    kept = new_docs.join(
        winners.select(F.col("__id").alias(id_col)), id_col
    )
    return kept, winners.select("h1", "h2")


def _band_keys(
    sigs: DataFrame, bands: int, rows: int, portable: bool = False
) -> DataFrame:
    """(id, band, bh) — one LSH bucket key per band from a signature
    frame. ``portable=False`` (production) folds each band's ``rows``
    minima through xxhash64 into a cheap 8-byte key; ``portable=True``
    concatenates them as a string, which any engine (the DuckDB oracle)
    reproduces verbatim — wider keys, identical bucketing semantics."""

    def _bh(bi: int):
        vals = [F.element_at("sig", bi * rows + r + 1) for r in range(rows)]
        if portable:
            return F.concat_ws("-", *[v.cast("string") for v in vals])
        return F.xxhash64(*vals).cast("string")

    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), _bh(bi).alias("bh"))
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")


def band_frame(
    docs: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, band, bh): a document's MinHash-LSH bucket keys — the
    persistable NEAR-dup state for :func:`minhash_dedup_incremental`,
    the banded analog of :func:`signature_frame`. ``bands`` rows of
    ~(8+1+8) bytes per doc; write it clustered by (band, bh) so
    incremental probes co-locate. ``hash_mode='md5'`` +
    portable (string) band keys make the frame engine-neutral so a SQL
    oracle can rebuild it bit-for-bit; production keeps xxhash64."""
    rows = num_hashes // bands
    sigs = minhash_signatures(
        docs, num_hashes, n, seed, text_col, id_col, hash_mode=hash_mode
    )
    return _band_keys(sigs, bands, rows, portable=(hash_mode == "md5"))


def minhash_dedup_incremental(
    new_docs: DataFrame,
    seen_bands: DataFrame | None = None,
    num_hashes: int = 128,
    bands: int = 32,
    n: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl NEAR-dup dedup: drop new docs that LSH-collide
    with the accumulated corpus — without rescanning it — via the
    persisted :func:`band_frame` state; the near-dup sibling of
    :func:`exact_dedup_incremental`, matching the engine's chunked
    ingest model.

    Decision rule (bucket-winner, deterministic): a new doc is dropped
    iff some band bucket of its contains (a) any key already in
    ``seen_bands``, or (b) a smaller-``id_col`` doc of the same batch.
    This is the LSH-only approximation used by at-scale dedup pipelines:
    cross-batch there is no exact verification (the store holds band
    keys, never grams — at 10^12 docs grams don't persist), so
    collisions are accepted at the banding's false-positive rate
    (P[j] = 1-(1-j^rows)^bands; tune bands/rows to taste). Within a
    batch the rule is greedy-by-id rather than connected components —
    for the exact-verified transitive form run the batch path
    (:func:`minhash_lsh_pairs` → :func:`cluster_representatives`).

    Returns ``(kept, new_bands)``:

    - ``kept`` — surviving rows of ``new_docs`` (all columns);
    - ``new_bands`` — band keys of the kept rows; append to the store so
      the next batch sees them (first-batch-wins across the stream).

    Scale shape: band keys are ~17 bytes × bands per doc; the batch side
    of every join/aggregate is bounded by the BATCH, and the store side
    probes by (band, bh) equality — clustered store files prune to the
    touched buckets. Document bodies re-attach by id at the end and
    never enter an exchange.
    """
    bnew = band_frame(
        new_docs, num_hashes, bands, n, seed, text_col, id_col, hash_mode
    )
    # ``cache_registry`` (r5 ADVICE): both returned frames traverse
    # ``bnew`` — a caller that runs one action per frame (the streaming
    # sink writes kept docs and new band keys separately) would build the
    # whole MinHash signature + banding TWICE per batch. Passing a list
    # persists the band frame and hands its lifecycle to the caller
    # (unpersist after the actions), mirroring minhash_lsh_pairs' internal
    # sigs cache.
    if cache_registry is not None:
        bnew = bnew.persist()
        cache_registry.append(bnew)
    # (b) within-batch bucket winners: doc loses any bucket holding a
    # smaller id
    wmin = bnew.groupBy("band", "bh").agg(F.min("id").alias("__wid"))
    losers = (
        bnew.join(wmin, ["band", "bh"])
        .filter(F.col("id") != F.col("__wid"))
        .select("id")
    )
    # (a) any bucket already present in the store
    if seen_bands is not None:
        hit = bnew.join(
            seen_bands.select("band", "bh"), ["band", "bh"], "left_semi"
        ).select("id")
        losers = losers.unionByName(hit)
    dropped = losers.distinct()
    kept = new_docs.join(
        dropped.withColumnRenamed("id", id_col), id_col, "left_anti"
    )
    new_bands = bnew.join(
        dropped, "id", "left_anti"
    ).select("id", "band", "bh")
    return kept, new_bands


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Churn between two corpus snapshots: one row per key with status
    ``added`` | ``removed`` | ``changed`` | ``unchanged`` — the
    continuous-crawl bookkeeping pass (what changed since the last WARC
    drop decides what re-enters the curation pipeline; everything
    ``unchanged`` keeps its verdicts and its tier contributions).

    Keys (crawl URLs / doc ids) are assumed unique per snapshot — the
    crawl-table contract; duplicate keys should be resolved by
    :func:`exact_dedup` / ``url_dedup`` first.

    Scale shape: each side reduces to (key, h1, h2) — the same 128-bit
    double-hash identity as :func:`exact_dedup`, ~24 B/row — BEFORE a
    single full-outer key join; document bodies never enter the
    exchange. Output is key + status only, so downstream joins (e.g.
    re-curating only ``added``+``changed``) stay narrow too.
    """

    def _sig(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(key_col),
            F.xxhash64(text_col).alias(f"__h1_{tag}"),
            F.xxhash64(F.lit("bmsd2"), F.col(text_col)).alias(f"__h2_{tag}"),
        )

    j = _sig(old, "o").join(_sig(new, "n"), key_col, "full_outer")
    status = (
        F.when(F.col("__h1_o").isNull(), F.lit("added"))
        .when(F.col("__h1_n").isNull(), F.lit("removed"))
        .when(
            (F.col("__h1_o") == F.col("__h1_n"))
            & (F.col("__h2_o") == F.col("__h2_n")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(key_col, status.alias("status"))
