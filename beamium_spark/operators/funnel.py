"""Event-sequence analytics over the events stream: funnel completion
and cohort retention — the product-analytics reads a TSDB's consumers
run downstream of the forwarded series (the reference stops at
forwarding, /root/reference/README.md:17-24; the corpus-era engine
answers them first-class).

Scale notes:

- ``funnel`` groups by user AFTER pre-filtering to the funnel's own
  event types, so the per-user array is bounded by funnel-relevant
  events, not total activity; the fold is one Catalyst higher-order
  ``aggregate`` over the time-sorted array — no window, no Python, one
  (user) shuffle.
- ``retention_cohorts`` is two narrow hash aggregations and one
  (user)-keyed join — every frame is user- or (cohort, offset)-bounded,
  never event-bounded past the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    within: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user: how far through ``steps``
    (e.g. ``('view', 'click', 'purchase')``) each user progressed, each
    step STRICTLY after the previous one, the whole run optionally
    bounded to ``within`` of step 1 (a Spark interval string).

    Semantics (the standard first-touch funnel): step 1 binds to the
    user's EARLIEST matching event; each later step binds to the first
    qualifying event strictly after the bound previous step. An event
    advances at most one step (repeated step types need distinct
    events).

    Output: (user, n_steps, step_ts array<timestamp> — the bound event
    times, converted=n_steps==len(steps)).

    Implementation: pre-filter to the funnel's types, collect each
    user's (ts, type) structs, ``array_sort`` (total struct order:
    ties at equal ts break by type name — deterministic), then ONE
    higher-order ``aggregate`` fold that appends a step timestamp when
    the element matches the next wanted type, succeeds the previous
    step, and fits the window. Whole-stage-codegen Catalyst; one
    exchange keyed on user.
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {list(steps)}")
    within_us = None
    if within is not None:
        from beamium_spark.operators.rollup import window_seconds

        within_us = window_seconds(within) * 1_000_000

    step_lit = F.array(*[F.lit(s) for s in steps])
    n = len(steps)

    per_user = (
        events.filter(F.col(type_col).isin(*steps))
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros(F.col(ts_col)).alias("t"),
                        F.col(type_col).alias("y"),
                    )
                )
            ).alias("evs")
        )
    )

    def _fold(acc, x):
        # try_element_at: once all n steps are complete the index is n+1,
        # out of bounds — try_ yields NULL (ok stays false) instead of
        # relying on And's left-to-right short-circuit past the size guard
        # (a latent INVALID_ARRAY_INDEX under ANSI if evaluation order
        # ever changes; r5 ADVICE)
        wants = F.try_element_at(step_lit, F.size(acc) + 1)
        ok = (F.size(acc) < n) & (x["y"] == wants)
        # strict succession: the next step must be strictly later
        ok = ok & ((F.size(acc) == 0) | (x["t"] > F.element_at(acc, -1)))
        if within_us is not None:
            ok = ok & (
                (F.size(acc) == 0)
                | (x["t"] - F.element_at(acc, 1) <= F.lit(within_us))
            )
        return F.when(ok, F.concat(acc, F.array(x["t"]))).otherwise(acc)

    bound = per_user.select(
        "user",
        F.aggregate(
            "evs", F.array().cast("array<long>"), _fold
        ).alias("__ts"),
    )
    return bound.select(
        "user",
        F.size("__ts").alias("n_steps"),
        F.transform("__ts", lambda t: F.timestamp_micros(t)).alias("step_ts"),
        (F.size("__ts") == n).alias("converted"),
    )


def retention_cohorts(
    events: DataFrame,
    period: str = "1 week",
    horizon: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort retention matrix: users cohorted by the period of
    their FIRST event; a cohort is retained at offset ``k`` if the user
    has any event in cohort-period + k. Emits one row per (cohort,
    offset ≤ horizon): (cohort_start, offset, n_active, n_cohort,
    retention — n_active/n_cohort rounded to 6).

    Offset 0 is the cohort itself (retention 1.0 by construction — kept
    as the sanity row). Periods are fixed UTC-epoch-aligned windows
    (``floor(epoch/period)``), the convention that makes cohorts
    replayable from the data alone.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    from beamium_spark.operators.rollup import window_seconds

    p = window_seconds(period)
    idx = F.floor(F.unix_timestamp(F.col(ts_col)) / p)
    user = F.col(user_col).alias("user")
    firsts = events.groupBy(user).agg(F.min(idx).alias("cohort"))
    activity = events.select(user, idx.alias("pidx")).distinct()
    joined = (
        activity.join(firsts, "user")
        .withColumn("offset", (F.col("pidx") - F.col("cohort")).cast("int"))
        .filter((F.col("offset") >= 0) & (F.col("offset") <= horizon))
    )
    active = joined.groupBy("cohort", "offset").agg(
        F.countDistinct("user").alias("n_active")
    )
    sizes = firsts.groupBy("cohort").agg(F.countDistinct("user").alias("n_cohort"))
    return (
        active.join(sizes, "cohort")
        .select(
            F.timestamp_seconds(F.col("cohort") * p).alias("cohort_start"),
            "offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
        )
    )


def event_paths(
    events: DataFrame,
    k: int = 3,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Top event-type PATHS: the most common length-``k`` contiguous
    event sequences across users ("view > click > purchase") — the
    exploratory read that tells you which funnels to define. N-gram
    counting over per-user event sequences.

    Output: (path — ' > '-joined, n, rank ≤ ``top``), tiebreak n desc
    then path asc (deterministic).

    Scale: per-user ordered type arrays (one user-keyed exchange;
    arrays bounded by a user's own activity), length-k windows sliced
    by a higher-order transform (no self-join), then a map-side-combined
    count and a TakeOrdered top-k — no global sort.
    """
    if k < 2:
        raise ValueError(f"paths need k >= 2, got {k}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros(F.col(ts_col)).alias("t"),
                        F.col(type_col).alias("y"),
                    )
                )
            ),
            lambda s: s["y"],
        ).alias("types")
    )
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("types") - k + 1, F.lit(0))),
        lambda i: F.slice("types", i, k),
    )
    paths = (
        per_user.filter(F.size("types") >= k)
        .select(F.explode(windows).alias("w"))
        .select(F.array_join("w", " > ").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = paths.orderBy(F.desc("n"), F.asc("path")).limit(top)
    from pyspark.sql import Window

    return ranked.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("path"))),
    )
