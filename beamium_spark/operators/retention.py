"""Retention: TTL and size-cap eviction per tier.

Beamium's sink scanner deletes files older than ``ttl`` unsent (default
1 h, /root/reference/src/sink.rs:101-146, conf src/conf.rs:350-359) and,
while the sink dir exceeds ``size`` (default 1 GiB, src/conf.rs:361-372),
pops the **oldest** queue entries and deletes them (src/sink.rs:172-222),
incrementing ``beamium_skip_ttl`` / ``beamium_skip_max_size``
(src/sink.rs:23-40).

Engine mapping: a retention *policy* per tier — the 1m tier keeps hours,
1h keeps days, 1d keeps forever — applied as partition-level deletes
(TTL) and an oldest-first running-size cutoff (size cap). Both return the
evicted count for the counters table.

Scale: TTL is partition pruning + directory unlink (no data read); the
size cap needs one global ordering of chunk sizes — computed over the
*block accounting* (bytes per chunk), thousands of rows at 10^12-doc
scale, never the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ttl_cutoff_date(now_ts: str, ttl_hours: float) -> str:
    """Partition cutoff (date granularity) for a TTL; conservative: only
    partitions strictly older than the cutoff *date* are dropped whole."""
    import datetime as dt

    now = dt.datetime.fromisoformat(now_ts)
    return (now - dt.timedelta(hours=ttl_hours)).date().isoformat()


def ttl_evict(store, table: str, now_ts: str, ttl_hours: float) -> dict:
    """Drop whole chunk partitions past TTL, then row-level trim the
    boundary partition. Returns counters (beamium_skip_ttl analogue).

    ``ttl_hours`` may be fractional (the reference accepts bare seconds
    and sub-hour humanized ttls like '30m', src/conf.rs:350-359) — the
    cutoff is carried in whole seconds, never truncated to hours."""
    cutoff_date = ttl_cutoff_date(now_ts, ttl_hours)
    parts = store.drop_partitions_older_than(table, cutoff_date)
    rows = 0
    if store.exists(table):
        cutoff_expr = F.lit(now_ts).cast("timestamp") - F.expr(
            f"interval {int(round(ttl_hours * 3600))} seconds"
        )
        rows = store.delete_where(table, F.col("chunk_start") < cutoff_expr)
    return {"expired_partitions": parts, "expired_rows": rows}


def size_cap_plan(chunk_sizes: DataFrame, cap_bytes: int) -> DataFrame:
    """chunk_sizes(chunk_start, bytes) → chunks to evict, oldest-first,
    so that the retained total is ≤ cap (src/sink.rs:185-222 semantics:
    evict oldest while over cap).

    Running sum over newest-first ordering: a chunk is KEPT while the
    cumulative bytes including it stay within cap.
    """
    w = Window.orderBy(F.desc("chunk_start")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        chunk_sizes.withColumn("running", F.sum("bytes").over(w))
        .filter(F.col("running") > cap_bytes)
        .select("chunk_start", "bytes")
    )


def size_cap_evict(
    store, table: str, cap_bytes: int, size_col: str | None = None,
    size_expr=None,
) -> dict:
    """Apply the size cap to a stored tier/block table. Sizes come from the
    table's own accounting (``size_col`` column name, or ``size_expr`` — a
    Column like length(ts_block)+length(val_block) for Gorilla blocks),
    else a fixed per-row estimate. Returns counters
    (beamium_skip_max_size analogue)."""
    if not store.exists(table):
        return {"evicted_chunks": 0, "evicted_rows": 0}
    df = store.read(table)
    if size_expr is not None:
        sizes = df.groupBy("chunk_start").agg(F.sum(size_expr).alias("bytes"))
    elif size_col:
        sizes = df.groupBy("chunk_start").agg(F.sum(size_col).alias("bytes"))
    else:
        sizes = df.groupBy("chunk_start").agg((F.count("*") * 64).alias("bytes"))
    doomed = size_cap_plan(sizes, cap_bytes)
    chunks = [r["chunk_start"] for r in doomed.collect()]
    rows = 0
    if chunks:
        rows = store.delete_where(
            table, F.col("chunk_start").isin(chunks)
        )
    return {"evicted_chunks": len(chunks), "evicted_rows": rows}
