"""Deterministic corpus sampling / mixing for training-data pipelines.

A 100-TB corpus is never trained on raw: pipelines draw reproducible
subsets (ablations, dedup audits, eval holdouts) and mix sources by
weight. Spark's ``df.sample`` is seed-dependent-per-partitioning (a
repartition changes which rows are picked) — useless for lineage. These
operators key every decision on a HASH of stable row identity, so the
same row gets the same verdict in every run, on any cluster layout, and
the sample is exactly reproducible in any engine (the DuckDB oracles
re-derive it with the same hash).

All pure Catalyst: one xxhash64 + comparison per row, no shuffle, no
Python. Filters compose with scan pruning (a sampled scan still pushes
its predicates down).

- ``hash_sample``       — keep a deterministic p-fraction by id hash
- ``stratified_sample`` — per-stratum fractions (e.g. per-language caps)
- ``split_corpus``      — disjoint train/val/test by hash range; splits
                          are provably non-overlapping and exhaustive
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# xxhash64 output spans the full signed-64 range; bucket it to [0, 1)
# via the unsigned reinterpretation trick (add 2^63, divide by 2^64)
_HASH_SPAN = float(2**64)


def _unit_hash(col, seed: int):
    """Deterministic uniform [0, 1) per value: portable across runs,
    partitionings, and engines (DuckDB: (hash(x)::int128 + 2**63) / 2**64
    — the oracle uses xxhash64 reproduced via Spark's own function is not
    available there, so oracles re-derive with md5-based unit hash; see
    __spark_entry__ oracle builders)."""
    h = F.xxhash64(col, F.lit(seed))
    return (h.cast("double") / F.lit(_HASH_SPAN)) + F.lit(0.5)


def _md5_unit_hash(col):
    """Engine-neutral unit hash: first 15 hex chars of md5 → [0, 1).
    Slower than xxhash64 (still JVM-side, no Python) but reproducible
    verbatim in DuckDB/Trino/Postgres — used when an external oracle must
    re-derive the exact sample."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("double")
    return h / F.lit(float(16**15))


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows keyed on ``id_col``.

    The verdict depends only on (id, seed): stable under repartition,
    incremental append (old rows keep their verdict), and engine port.
    ``portable=True`` switches to the md5 unit hash so an external SQL
    engine reproduces the exact row set.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    u = (
        _md5_unit_hash(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
        if portable
        else _unit_hash(F.col(id_col), seed)
    )
    return df.filter(u < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source rebalance
    every multilingual corpus needs (e.g. downsample English to 30%, keep
    low-resource languages whole). Strata absent from ``fractions`` get
    ``default_fraction``. One map-side filter; no shuffle."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {v}")
    frac = F.lit(default_fraction)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(frac)
    u = (
        _md5_unit_hash(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
        if portable
        else _unit_hash(F.col(id_col), seed)
    )
    return df.filter(u < frac)


def split_corpus(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Assign every row to exactly one named split by hash range —
    train/val/test that is disjoint and exhaustive BY CONSTRUCTION (the
    unit interval is partitioned, not re-sampled per split). Adds a
    ``split`` column; downstream writers partition on it.

    ``weights`` need not sum to 1; they are normalized."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    u = (
        _md5_unit_hash(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
        if portable
        else _unit_hash(F.col(id_col), seed)
    )
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def mix_corpora(
    sources: list[tuple[str, DataFrame]],
    weights: dict[str, float],
    target_docs: int,
    id_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Deterministic weighted mixture of corpora — the Pile/DoReMi-style
    data-mixing pass that turns per-source corpora plus mixture weights
    into one training corpus.

    Each source ``s`` keeps fraction ``min(1, target_docs·w_s / n_s)``
    of its rows (weights normalized to sum 1), selected by the same
    per-id unit hash as :func:`hash_sample` but salted with the SOURCE
    NAME so sources draw independent samples even over overlapping id
    spaces. No upsampling: a source too small for its weight contributes
    everything it has (the achieved mixture under-fills rather than
    duplicating — repetition is a curation decision, not a sampler
    default). Output: each source's columns plus ``mix_source``.

    Scale shape: one count() per source at PLAN TIME (metadata-cheap on
    parquet/Iceberg; the eager action is documented, mirroring
    vectorize.hashed_tfidf's n_docs contract) — then the mixture itself
    is a shuffle-free filter + union; verdicts depend only on
    (id, seed, source name), so they are stable under repartition and
    incremental append. ``portable=True`` switches to the md5 unit hash
    an external SQL engine reproduces verbatim.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    names = [n for n, _ in sources]
    if set(names) != set(weights) or len(set(names)) != len(names):
        raise ValueError(
            f"weights keys {sorted(weights)} must match distinct source "
            f"names {names}"
        )
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    parts = []
    for name, df in sources:
        n = df.count()
        frac = min(1.0, target_docs * (weights[name] / total_w) / max(n, 1))
        key = F.concat(
            F.col(id_col).cast("string"), F.lit(f"#{seed}#{name}")
        )
        u = _md5_unit_hash(key) if portable else _unit_hash(key, seed)
        parts.append(
            df.filter(u < F.lit(frac)).withColumn("mix_source", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
