"""Funnel completion + cohort retention vs hand-computed fixtures."""

import datetime as dt

import pytest


T0 = dt.datetime(2025, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), t) for u, m, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_binding_and_window(spark):
    from beamium_spark.operators.funnel import funnel

    rows = [
        # u1 converts in order
        (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
        # u2: click BEFORE the first view never counts; no purchase
        (2, 0, "click"), (2, 3, "view"), (2, 10, "click"),
        # u3: completes but the purchase falls outside within=15m
        (3, 0, "view"), (3, 5, "click"), (3, 30, "purchase"),
        # u4: noise types interleave freely
        (4, 0, "signup"), (4, 1, "view"), (4, 2, "error"),
        (4, 3, "click"), (4, 4, "purchase"),
        # u5: only noise -> absent from the output (no funnel-type events)
        (5, 0, "error"),
    ]
    out = {
        r.user: r
        for r in funnel(
            _ev(spark, rows), ("view", "click", "purchase"), within="15 minutes"
        ).collect()
    }
    assert out[1].converted and out[1].n_steps == 3
    assert [t.minute for t in out[1].step_ts] == [0, 5, 9]
    assert not out[2].converted and out[2].n_steps == 2
    assert [t.minute for t in out[2].step_ts] == [3, 10]  # first-touch view at m3
    assert out[3].n_steps == 2                            # purchase out of window
    assert out[4].converted and [t.minute for t in out[4].step_ts] == [1, 3, 4]
    assert 5 not in out

    # strict succession: same-timestamp second step does NOT advance
    same = _ev(spark, [(7, 0, "view")]).union(
        _ev(spark, [(7, 0, "click")])
    )
    r = funnel(same, ("view", "click")).collect()[0]
    assert r.n_steps == 1

    with pytest.raises(ValueError, match="steps"):
        funnel(_ev(spark, rows), ("view",))


def test_retention_cohorts_matrix(spark):
    from beamium_spark.operators.funnel import retention_cohorts

    # day-aligned cohorts (epoch weeks start on Thursdays — day periods
    # keep the fixture readable)
    def ev(u, day, minute=30):
        return (u, day * 24 * 60 + minute, "view")

    rows = [
        # cohort day 0: users 1,2,3 — u1 active d1+d2, u2 d1, u3 never again
        ev(1, 0), ev(1, 1), ev(1, 2),
        ev(2, 0), ev(2, 1),
        ev(3, 0),
        # cohort day 1: user 4, active d2
        ev(4, 1, minute=45), ev(4, 2),
    ]
    out = {
        (r.cohort_start, r.offset): r
        for r in retention_cohorts(_ev(spark, rows), period="1 day", horizon=4).collect()
    }
    starts = sorted({k[0] for k in out})
    c0, c1 = starts[0], starts[1]
    assert out[(c0, 0)].n_cohort == 3 and out[(c0, 0)].retention == 1.0
    assert out[(c0, 1)].n_active == 2 and abs(out[(c0, 1)].retention - 2 / 3) < 1e-6
    assert out[(c0, 2)].n_active == 1
    assert (c0, 3) not in out                      # nobody active
    assert out[(c1, 0)].n_cohort == 1 and out[(c1, 1)].n_active == 1

    with pytest.raises(ValueError, match="horizon"):
        retention_cohorts(_ev(spark, rows), horizon=0)


def test_event_paths_top_sequences(spark):
    from beamium_spark.operators.funnel import event_paths

    rows = []
    # 3 users walk view>click>purchase; 2 users walk view>view>error
    for u in (1, 2, 3):
        rows += [(u, 0, "view"), (u, 1, "click"), (u, 2, "purchase")]
    for u in (4, 5):
        rows += [(u, 0, "view"), (u, 1, "view"), (u, 2, "error")]
    # a short user contributes nothing at k=3
    rows += [(6, 0, "view"), (6, 1, "click")]
    out = event_paths(_ev(spark, rows), k=3, top=5).collect()
    ranked = [(r.rank, r.path, r.n) for r in sorted(out, key=lambda r: r.rank)]
    assert ranked[0] == (1, "view > click > purchase", 3)
    assert ranked[1] == (2, "view > view > error", 2)
    assert len(ranked) == 2

    # sliding windows: a 4-event walk yields two length-3 paths
    slide = _ev(spark, [(9, 0, "a"), (9, 1, "b"), (9, 2, "c"), (9, 3, "d")])
    got = {r.path for r in event_paths(slide, k=3, top=10).collect()}
    assert got == {"a > b > c", "b > c > d"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 2"):
        event_paths(slide, k=1)


def test_funnel_events_after_completion_are_safe(spark):
    """r6: once all n steps are bound, the next-step lookup indexes n+1 —
    try_element_at must yield NULL (no ANSI INVALID_ARRAY_INDEX) and the
    bound conversion must be unchanged by trailing funnel-type events."""
    from beamium_spark.operators.funnel import funnel

    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        # trailing funnel-type events AFTER full completion
        (1, 3, "view"), (1, 4, "purchase"), (1, 5, "click"),
    ]
    r = funnel(_ev(spark, rows), ("view", "click", "purchase")).collect()[0]
    assert r.converted and r.n_steps == 3
    assert [t.minute for t in r.step_ts] == [0, 1, 2]
