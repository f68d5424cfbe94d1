"""Streaming exponential decay: per-key recency-weighted state.

The streaming twin of ``operators/timeseries.time_decayed_at_latest``:
each key carries a decayed sum/weight anchored at its own latest folded
event, updated incrementally — the freshness score a serving tier reads
(recency-boosted ranking, activity scoring, rate limiting by decayed
volume). The fold is the classic recurrence

    s ← value + s · 0.5^((t − t_prev) / half_life)

applied in EVENT-TIME order, so out-of-order events inside the
watermark horizon are buffered per key (the same lateness contract as
``streaming/cep.py``: disorder beyond the watermark delay is dropped),
and the state after folding a key's whole history equals the batch
operator's anchored aggregate up to float-fold associativity (pinned by
test at 1e-9 relative).

State per key: 4 scalars + the not-yet-finalizable event buffer —
bounded by the watermark horizon. One shuffle on the key, same as the
batch twin's single exchange; per batch the python work is one sort +
one linear fold over each key's small buffer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = ("s double, w double, n bigint, last_us bigint, "
                 "buf_ts array<bigint>, buf_v array<double>, wm_us bigint")
_NONE = -1


def _make_decay_fn(hl_us: float):
    """applyInPandasWithState body; closure captures plain floats only."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            s, w, n, last_us, buf_ts, buf_v, wm_us = state.get
            buf_ts, buf_v = list(buf_ts), list(buf_v)
        else:
            s, w, n, last_us, buf_ts, buf_v, wm_us = \
                0.0, 0.0, 0, _NONE, [], [], _NONE

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, v in zip(ts_us, pdf["value"]):
                    # same boundary-equal keep as streaming/cep.py: rows
                    # strictly below the watermark were already dropped
                    # by Spark's late filter
                    if int(t) >= wm_us:
                        buf_ts.append(int(t))
                        buf_v.append(float(v))

        new_wm_us = state.getCurrentWatermarkMs() * 1000
        folded = False
        if new_wm_us > wm_us and buf_ts:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_v = [], []
            for i in order:
                t, v = buf_ts[i], buf_v[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_v.append(v)
                    continue
                # events older than the already-folded frontier would
                # need a retro-fold; the watermark contract has already
                # ruled them out (they'd have been dropped as late), so
                # the frontier only moves forward
                if last_us != _NONE and t < last_us:
                    continue
                decay = 1.0 if last_us == _NONE else \
                    0.5 ** ((t - last_us) / hl_us)
                s = v + s * decay
                w = 1.0 + w * decay
                n += 1
                last_us = t
                folded = True
            buf_ts, buf_v = keep_ts, keep_v
        wm_us = max(wm_us, new_wm_us)

        if folded:
            yield pd.DataFrame({
                "user_id": [key[0]],
                "decayed_sum": [s],
                "decayed_weight": [w],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last_us, unit="us")]})

        state.update((s, w, n, last_us, buf_ts, buf_v, wm_us))
        if buf_ts:
            wm_ms = wm_us // 1000
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))

    return fn


def decay_monitor(events: DataFrame, half_life_days: float = 7.0,
                  watermark: str = "10 minutes",
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """Streaming per-key decayed state: update-mode rows
    (key, decayed_sum, decayed_weight, n_events, last_ts) emitted every
    time a key folds new events, anchored at the key's latest folded
    event. After any prefix of the stream, a key's latest emission
    matches ``time_decayed_at_latest`` over the events folded so far
    (up to float-fold associativity; disorder beyond the watermark is
    dropped)."""
    hl_us = half_life_days * 86_400_000_000.0
    key_type = dict(events.dtypes)[key_col]
    filtered = events.select(F.col(key_col).alias("user_id"),
                             F.col(ts_col).alias("ts"),
                             F.col(value_col).alias("value"))
    out_schema = (f"user_id {key_type}, decayed_sum double, "
                  "decayed_weight double, n_events bigint, "
                  "last_ts timestamp")
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_decay_fn(hl_us),
                outputStructType=out_schema,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
