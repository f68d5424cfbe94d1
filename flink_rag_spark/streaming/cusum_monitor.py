"""Streaming CUSUM: per-key mean-shift detection as keyed state.

The streaming twin of ``operators/anomaly.cusum_scores`` — Page's
recurrence

    s_hi ← max(0, s_hi + (x − target − slack))
    s_lo ← max(0, s_lo + (target − x − slack))

folded in EVENT-TIME order per key. Out-of-order events inside the
watermark horizon are buffered (the same lateness contract as
``streaming/decay.py`` / ``streaming/cep.py``: disorder beyond the
watermark delay is dropped), and the state after folding a key's whole
history equals the batch operator's closed-form statistics at that
key's last row (pinned by test; the batch side quantizes deviations to
DECIMAL(20,6), so agreement is exact whenever values carry ≤6dp and
within float-fold tolerance otherwise).

Emissions are update-mode rows (key, cusum_hi, cusum_lo, alarm_hi,
alarm_lo, n_events, last_ts) every time a key folds — a monitoring
sink reads the latest row per key, and the first row with an alarm
flag is the change-point alert. State per key: 4 scalars + the
watermark-bounded buffer; one shuffle on the key, same as the batch
twin's single exchange.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = ("s_hi double, s_lo double, n bigint, last_us bigint, "
                 "buf_ts array<bigint>, buf_seq array<bigint>, "
                 "buf_v array<double>, wm_us bigint")
_NONE = -1


def _make_cusum_fn(target: float, slack: float, h: float):
    """applyInPandasWithState body; closure captures plain floats."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (s_hi, s_lo, n, last_us, buf_ts, buf_seq, buf_v,
             wm_us) = state.get
            buf_ts, buf_seq, buf_v = \
                list(buf_ts), list(buf_seq), list(buf_v)
        else:
            s_hi, s_lo, n, last_us, buf_ts, buf_seq, buf_v, wm_us = \
                0.0, 0.0, 0, _NONE, [], [], [], _NONE

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, q, v in zip(ts_us, pdf["seq"], pdf["value"]):
                    if int(t) >= wm_us:
                        buf_ts.append(int(t))
                        buf_seq.append(int(q))
                        buf_v.append(float(v))

        new_wm_us = state.getCurrentWatermarkMs() * 1000
        folded = False
        if new_wm_us > wm_us and buf_ts:
            # (ts, seq) order — the batch twin's deterministic tie-break
            # (the clamp makes same-ts fold order observable); seq ties
            # across the already-folded frontier remain subject to the
            # watermark lateness contract, like every monitor here
            order = sorted(range(len(buf_ts)),
                           key=lambda i: (buf_ts[i], buf_seq[i]))
            keep_ts, keep_seq, keep_v = [], [], []
            for i in order:
                t, q, v = buf_ts[i], buf_seq[i], buf_v[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_seq.append(q)
                    keep_v.append(v)
                    continue
                if last_us != _NONE and t < last_us:
                    continue  # pre-frontier: ruled out by the watermark
                s_hi = max(0.0, s_hi + (v - target - slack))
                s_lo = max(0.0, s_lo + (target - v - slack))
                n += 1
                last_us = t
                folded = True
            buf_ts, buf_seq, buf_v = keep_ts, keep_seq, keep_v
        wm_us = max(wm_us, new_wm_us)

        if folded:
            yield pd.DataFrame({
                "user_id": [key[0]],
                "cusum_hi": [round(s_hi, 6)],
                "cusum_lo": [round(s_lo, 6)],
                "alarm_hi": [s_hi > h],
                "alarm_lo": [s_lo > h],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last_us, unit="us")]})

        state.update((s_hi, s_lo, n, last_us, buf_ts, buf_seq, buf_v, wm_us))
        if buf_ts:
            wm_ms = wm_us // 1000
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))

    return fn


def cusum_monitor(events: DataFrame, target: float, slack: float,
                  h: float, watermark: str = "10 minutes",
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  seq_col: str = "event_id") -> DataFrame:
    """Streaming per-key CUSUM state: update-mode rows (key, cusum_hi,
    cusum_lo, alarm_hi, alarm_lo, n_events, last_ts) emitted every time
    a key folds new events. After any prefix of the stream, a key's
    latest emission matches ``cusum_scores``' last row over the events
    folded so far (the change-point alert is the first emission with an
    alarm flag — same ``> h`` decision as ``cusum_first_alarms``)."""
    key_type = dict(events.dtypes)[key_col]
    filtered = events.select(F.col(key_col).alias("user_id"),
                             F.col(ts_col).alias("ts"),
                             F.col(seq_col).cast("bigint").alias("seq"),
                             F.col(value_col).alias("value"))
    out_schema = (f"user_id {key_type}, cusum_hi double, cusum_lo double, "
                  "alarm_hi boolean, alarm_lo boolean, n_events bigint, "
                  "last_ts timestamp")
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_cusum_fn(float(target), float(slack), float(h)),
                outputStructType=out_schema,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
