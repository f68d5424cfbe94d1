"""Event-time streaming operators over the ``events`` stream shape
(event_id, ts, user_id, event_type, value, props — FIXTURES.md §B).

ALL of this is ABSENT in the reference, which explicitly opts out of event
time (``WatermarkStrategy.noWatermarks()``, ``AiJob.java:38``,
``StreamingStoreKnowledge.java:40``) and has no keyed state. The new engine
exposes the full Structured Streaming event-time surface; these builders work
identically on a batch DataFrame (minus the watermark), which is how the
DuckDB oracle checks their semantics.

Scale notes: windowed aggregates shuffle once on (window, key) with map-side
partial aggregation; watermarks bound state size; session windows and the
custom sessionizer key state by user — skew in user_id is the thing to watch
(salt or split hot users upstream).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_rag_spark.plans.relational import dec2


def with_event_time(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return stream.withWatermark("ts", watermark)


def tumbling_counts(events: DataFrame, width: str = "5 minutes",
                    watermark: str | None = "10 minutes") -> DataFrame:
    """Tumbling event-time window: count + exact money sum per (window, type)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.window("ts", width), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(dec2("value")).cast("double").alias("sum_value"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    "event_type", "n_events", "sum_value"))


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str | None = "10 minutes") -> DataFrame:
    """Sliding (hopping) window — each event lands in width/slide windows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.window("ts", width, slide), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    "event_type", "n_events"))


def session_windows(events: DataFrame, gap: str = "5 minutes",
                    watermark: str | None = "10 minutes") -> DataFrame:
    """Per-user session windows with a fixed inactivity gap."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(dec2("value")).cast("double").alias("sum_value"))
            .select(F.col("session_window.start").alias("sess_start"),
                    F.col("session_window.end").alias("sess_end"),
                    "user_id", "n_events", "sum_value"))


def stream_interval_join(signups: DataFrame, clicks: DataFrame,
                         window: str = "10 minutes",
                         watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream interval join: signups ⋈ same-user clicks within the
    next `window`. Both sides carry watermarks and the join condition bounds
    event time in both directions, so Spark can expire join state — the
    stream-stream twin of plans/relational3.interval_join_signup_clicks
    (identical output schema modulo grouping)."""
    s = (signups.withWatermark("ts", watermark)
         .select(F.col("event_id").alias("s_id"), F.col("user_id"),
                 F.col("ts").alias("s_ts")))
    c = (clicks.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                 F.col("value").alias("c_value")))
    return s.join(
        c, (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("s_ts"))
        & (F.col("c_ts") < F.col("s_ts") + F.expr(f"INTERVAL {window}")),
        "inner")


def dedup_within_watermark(events: DataFrame, keys: list[str] | None = None,
                           watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; state for expired keys is reclaimed."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


# ---- custom stateful operator: sessionization with running aggregates ----

SESSIONIZE_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
SESSIONIZE_STATE_SCHEMA = (
    "start_us bigint, last_us bigint, n bigint, total double"
)


SESSION_GAP_US = 5 * 60 * 1_000_000


def _emit(key, closed):
    return pd.DataFrame({
        "user_id": [key[0]] * len(closed),
        "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
        "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
        "n_events": [c[2] for c in closed],
        "total_value": [c[3] for c in closed]})


def _sessionize_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: per-user session tracking. Emits one row
    per CLOSED session — closed by an in-data gap, or by the event-time
    watermark passing the session's gap horizon (event-time timeout, so the
    operator is deterministic w.r.t. the data, never the wall clock).

    This is the engine's demonstration of arbitrary keyed state — the
    capability tier above built-in session_window (e.g. for sessions that
    close on business rules, not just inactivity)."""
    if state.hasTimedOut:
        closed = [state.get]
        state.remove()
        yield _emit(key, closed)
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    ts_us = rows["ts"].astype("int64") // 1000  # ns → us
    vals = rows["value"].astype(float)

    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us, last_us, n, total = int(ts_us.iloc[0]), int(ts_us.iloc[0]), 0, 0.0

    closed = []
    for t, v in zip(ts_us, vals):
        t = int(t)
        if t - last_us > SESSION_GAP_US and n > 0:
            closed.append((start_us, last_us, n, total))
            start_us, n, total = t, 0, 0.0
        last_us = max(last_us, t)
        n += 1
        total += float(v)

    state.update((start_us, last_us, n, total))
    # close once the event-time watermark passes the inactivity horizon
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_US // 1000)
    if closed:
        yield _emit(key, closed)


def sessionize_stateful(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom keyed-state sessionization via applyInPandasWithState.

    State per user is four scalars — bounded by distinct active users, and
    reclaimed by the event-time timeout as the watermark advances."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn,
                outputStructType=SESSIONIZE_SCHEMA,
                stateStructType=SESSIONIZE_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
