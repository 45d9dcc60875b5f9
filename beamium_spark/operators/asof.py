"""As-of join: attach the latest tier state at-or-before each event.

The classic time-series join Spark lacks as a primitive (beamium's
forward loop always pairs a datapoint with the sink state current at send
time, src/router.rs:55-104 — this is that lookup as a declarative
operator). For every left row, find the single right row with the same
key and the greatest ``right_ts <= left_ts`` (backward, inclusive).

Spark-first implementation — the union/window form, NOT a range join:

1. tag both sides, union on (key..., ts) with right rows sorted BEFORE
   left rows at equal ts (backward-inclusive semantics);
2. one shuffle keyed on the join key, sort within partition by (ts, tag);
3. ``last(right_payload, ignorenulls)`` over the running window carries
   the most recent right row onto every left row.

Scale shape: ONE exchange of (key, ts, narrow payload structs) — the same
partitioning both inputs' aggregations already use — and a partition-local
sort; no per-row probe, no broadcast requirement, no O(n·m) range
explosion. Skewed keys shard exactly like the rollup shuffle (salting
composes if needed). DuckDB reproduces the semantics natively
(``ASOF JOIN ... ON l.ts >= r.ts``), which is what pins it in CORRECTNESS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, ...] = ("bucket", "metric"),
    left_ts: str = "ts",
    right_ts: str = "window_start",
    value_cols: tuple[str, ...] = ("cnt", "sum_value", "min_value", "max_value"),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row + ``value_cols`` from the latest ``right``
    row with ``right[right_ts] <= left[left_ts]`` per ``on`` key (NULLs
    when none precedes). ``tolerance_seconds`` drops matches older than
    the window (rows keep NULLs instead — the anti-staleness guard).
    """
    keys = list(on)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),  # right sorts first at equal ts: inclusive
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    left_null_payload = F.lit(None).cast(r.schema["__p"].dataType)
    l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        left_null_payload.alias("__p"),
        *lcols,
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    match = F.col("__m")
    if tolerance_seconds is not None:
        fresh = (
            F.unix_timestamp(F.col("__t"))
            - F.unix_timestamp(match["__rts"])
        ) <= tolerance_seconds
        match = F.when(fresh, match)
    return out.select(
        *keys,
        F.col("__t").alias(left_ts),
        *lcols,
        match["__rts"].alias("asof_" + right_ts),
        *[match[c].alias("asof_" + c) for c in value_cols],
    )
