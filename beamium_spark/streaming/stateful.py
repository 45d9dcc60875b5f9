"""Custom stateful streaming operator: series staleness detection.

Beamium surfaces a scraper going dark through its fetch-error counters
and directory gauges (src/scraper.rs:35-46, src/lib/asynch/fs.rs:17-26);
the continuous-engine analogue is an ALERT STREAM: emit a row the moment
a series that was flowing stops producing points for longer than a
threshold. A windowed aggregation cannot express this — silence produces
no rows to aggregate — so it needs per-key state plus event-time
timeouts, which is exactly Structured Streaming's
``applyInPandasWithState`` contract:

- state per series: the max event-time seen (8 bytes);
- on every batch of points for a key: advance the stored max, re-arm an
  event-time timeout at ``last_seen + threshold``;
- when the WATERMARK passes the timeout (i.e. the stream has provably
  moved on without this series), the state times out → emit one alert
  row (key, last_seen, the MEASURED silent_for_s = watermark − last_seen
  at detection, and the configured threshold_s) and drop the state, so a
  series that resumes later re-arms from scratch.

Scale shape: state is (key → one long), partitioned by the shuffle on
the group key — the same sizing as any streaming agg;
``spark.sql.shuffle.partitions`` sizes the state store. Alerts are
data-rate-independent (one row per dark series), so the output stream is
tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def alert_schema(key_col: str = "metric") -> str:
    """Output schema of :func:`staleness_alerts` — the key column carries
    the caller's ``key_col`` name, so alerts over e.g. ``url`` streams are
    labeled correctly."""
    return (
        f"{key_col} string, last_seen timestamp, "
        "silent_for_s double, threshold_s long"
    )


# default-key form kept for callers that introspect the schema
ALERT_SCHEMA = alert_schema()
_STATE_SCHEMA = "last_us long"


def staleness_alerts(
    points_stream: DataFrame,
    threshold_s: int = 120,
    watermark: str = "1 minute",
    ts_col: str = "ts",
    key_col: str = "metric",
) -> DataFrame:
    """Typed point stream → alert stream of series silent > ``threshold_s``.

    Event-time semantics: an alert fires only once the watermark passes
    ``last_seen + threshold_s`` — late points inside the watermark horizon
    still count as liveness, exactly like the rollup's late-data story.
    Use ``outputMode('append')`` on the sink; drive with
    ``processAllAvailable()`` in tests.
    """
    import pandas as pd  # noqa: F401 (worker-side import, validated here)

    def detect(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()
            # measured silence at detection: how far the stream's
            # watermark has provably moved past this series' last point
            wm_ms = state.getCurrentWatermarkMs()
            silent_s = max(0.0, wm_ms / 1000.0 - last_us / 1_000_000.0)
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "last_seen": [pd.Timestamp(last_us, unit="us")],
                    "silent_for_s": [silent_s],
                    "threshold_s": [threshold_s],
                }
            )
            return
        mx_us = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            if len(pdf):
                # pandas datetime64[ns] → µs; max over the batch
                mx_us = max(mx_us, int(pdf[ts_col].astype("int64").max()) // 1000)
        state.update((mx_us,))
        # event-time timeout is in epoch MILLIseconds
        state.setTimeoutTimestamp(mx_us // 1000 + threshold_s * 1000)
        yield pd.DataFrame(
            {key_col: [], "last_seen": [], "silent_for_s": [], "threshold_s": []}
        )

    return (
        points_stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            detect,
            outputStructType=alert_schema(key_col),
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
