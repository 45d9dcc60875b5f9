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
explosion.

Skew: the default (``chunk=None``) windows over the bare key, so one hot
(bucket, metric) series' full history sorts in ONE task — fine for
tier-keyed inputs (a series' tier rows are bounded by time span / window),
a straggler for raw hot-key event streams. Plain salting does NOT compose
here: a salt splits the timeline and breaks the carry-forward across salt
boundaries. The real fix is **range-chunked windowing** (``chunk='1
hour'`` etc.): the timeline splits into chunks, the running window
partitions by (key, chunk) — bounding every task by one chunk of one
series — and a second, summary-sized pass carries the last right row of
each earlier chunk across the boundary (per-(key, chunk) aggregate →
running last over chunk order → joined back as each chunk's carry-in).
Same answer, bit-for-bit, as the monolithic window — pinned by tests.

DuckDB reproduces the semantics natively (``ASOF JOIN ... ON l.ts >=
r.ts``), which is what pins correctness in CORRECTNESS_r{N}.json.
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
    chunk: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row + ``value_cols`` from the latest ``right``
    row with ``right[right_ts] <= left[left_ts]`` per ``on`` key (NULLs
    when none precedes). ``tolerance_seconds`` drops matches older than
    the window (rows keep NULLs instead — the anti-staleness guard).

    ``chunk`` (a Spark interval string, e.g. ``'1 hour'``) enables
    range-chunked windowing for hot keys: per-task work is bounded by one
    chunk of one series instead of a whole series. Identical results to
    the default; costs one extra summary aggregate + join, so leave it
    off for tier-keyed (already small per key) inputs.
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

    if chunk is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__t", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    else:
        from beamium_spark.operators.rollup import window_seconds

        step = window_seconds(chunk)
        chunk_of = F.floor(F.unix_timestamp(F.col("__t")) / F.lit(step)).cast("long")
        unioned = unioned.withColumn("__chunk", chunk_of)
        # summary pass: latest right payload per (key, chunk) — one row per
        # key×chunk, aggregated in parallel (max_by on right-side ts)
        chunk_last = (
            r.withColumn("__chunk", chunk_of)
            .groupBy(*keys, "__chunk")
            .agg(F.max_by("__p", "__t").alias("__cl"))
        )
        # carry-in for chunk c = latest right payload of any EARLIER chunk:
        # running last over chunk order, per key, over the summary frame
        # (rows per key = #chunks — bounded by time span, never row count)
        all_chunks = unioned.select(*keys, "__chunk").distinct()
        wc = (
            Window.partitionBy(*keys)
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            all_chunks.join(chunk_last, keys + ["__chunk"], "left")
            .withColumn("__carry", F.last("__cl", ignorenulls=True).over(wc))
            .select(*keys, "__chunk", "__carry")
        )
        # main pass: running last within (key, chunk) — the per-task bound —
        # then fall back to the chunk's carry-in when nothing precedes
        w = (
            Window.partitionBy(*keys, "__chunk")
            .orderBy("__t", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = (
            unioned.withColumn("__in", F.last("__p", ignorenulls=True).over(w))
            .join(carry, keys + ["__chunk"], "left")
            .withColumn("__m", F.coalesce("__in", "__carry"))
        )

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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: tuple[str, ...] = (),
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "1 hour",
) -> DataFrame:
    """Point-in-interval join: every left row paired with the right
    intervals containing its timestamp (``start <= ts < end``,
    optionally also matching the ``on`` key columns) — the other
    time-series join Spark lacks as a primitive (as-of = latest state;
    interval = containment: maintenance windows, sessions, experiment
    spans, outage annotations).

    Spark-first implementation — bucketized equi-join, NOT a raw
    inequality join (which Catalyst can only plan as a broadcast
    nested loop / cartesian — O(n·m) at corpus scale):

    1. each interval explodes to the time BUCKETS it overlaps
       (``sequence(floor(start/w), floor((end−1)/w))``);
    2. points carry their single bucket ``floor(ts/w)``;
    3. ONE hash equi-join on (on..., bucket), then the exact
       ``start <= ts < end`` post-filter.

    No dedup pass is needed: a point lives in exactly one bucket, so a
    (point, interval) pair can only meet once.

    Scale: the shuffle is keyed (on..., bucket) — time-spread keys, no
    monolithic sort anywhere. Fan-out per interval = ceil(span/w):
    pick ``bucket`` near the TYPICAL interval length so most intervals
    land in 1-2 buckets; a pathological months-long interval costs
    span/w join rows (linear, never quadratic — and such annotation
    intervals are few by nature).

    INNER semantics only: points outside every interval drop. Left
    semantics compose as the caller's anti-join (a bucket-level left
    join here would silently drop bucket-matched-but-range-failed
    points — the correct NULL-padding needs a per-point identity this
    operator doesn't demand).

    Interval columns are carried as a struct ``interval``
    (start, end, plus every other right column) to avoid name clashes.
    """
    from beamium_spark.operators.rollup import window_seconds

    # microsecond arithmetic end to end: containment keeps full
    # timestamp precision (a second-truncated compare misclassifies
    # sub-second boundaries)
    w = window_seconds(bucket) * 1_000_000
    s = F.unix_micros(F.col(start_col))
    e = F.unix_micros(F.col(end_col))
    payload_cols = [c for c in intervals.columns if c not in on]
    # empty/inverted intervals (end <= start) are dropped HERE: the
    # containment post-filter already removes every row they'd produce,
    # but sequence() auto-steps DESCENDING when end < start, so one
    # malformed interval would otherwise explode into span/bucket
    # spurious candidate rows before being filtered (r5 ADVICE —
    # unbounded fan-out masking bad data). Output is unchanged.
    intervals = intervals.filter(e > s)
    iv = intervals.select(
        *on,
        F.struct(*payload_cols).alias("interval"),
        F.explode(
            F.sequence(F.floor(s / w), F.floor((e - 1) / w))
        ).alias("__b"),
        s.alias("__s"),
        e.alias("__e"),
    )
    ts_us = F.unix_micros(F.col(ts_col))
    pts = points.withColumn("__b", F.floor(ts_us / w)).withColumn("__ts_us", ts_us)
    joined = pts.join(iv, [*on, "__b"]).filter(
        (F.col("__s") <= F.col("__ts_us")) & (F.col("__ts_us") < F.col("__e"))
    )
    return joined.drop("__b", "__s", "__e", "__ts_us")
