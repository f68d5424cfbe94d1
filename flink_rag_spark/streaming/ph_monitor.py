"""Streaming Page–Hinkley: per-key target-free mean-drift detection.

The streaming twin of ``operators/anomaly.page_hinkley_scores`` — the
definition folded in EVENT-TIME order per key:

    x̄_t = (1/t) Σ_{i≤t} x_i              (the series' own running mean)
    m_t = Σ_{i≤t} round(x_i − x̄_i − δ, 9)
    PH_t = m_t − min_{s≤t} m_s            (upward; mirrored for down)

Out-of-order events inside the watermark horizon buffer exactly like
``streaming/cusum_monitor.py``; beyond it they drop (the family's
lateness contract). Unlike the CUSUM monitor's float-fold tolerance,
this fold replays the batch quantization EXACTLY — x quantizes to 6-dp
Decimal, the prefix sum crosses to float through the same floor-split
the batch's ``util.dec_to_double`` applies, and each term quantizes to
9-dp Decimal half-up on the shortest float repr (``repr(float)`` ≡
Java's ``Double.toString`` shortest form, which is what Spark's
``F.round(double)`` rounds) — so a key's state after folding its whole
history equals the batch scores' last row bit-for-bit (pinned by
test).

Emissions are update-mode rows (key, ph_hi, ph_lo, alarm_hi, alarm_lo,
n_events, last_ts). State per key: two Decimal pairs carried as
strings (m, min-m per side — exact, unbounded-precision) + scalars +
the watermark-bounded buffer; one shuffle on the key.
"""

from __future__ import annotations

from decimal import ROUND_FLOOR, ROUND_HALF_UP, Decimal
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = ("n bigint, s string, m_hi string, m_lo string, "
                 "min_hi string, min_lo string, last_us bigint, "
                 "buf_ts array<bigint>, buf_seq array<bigint>, "
                 "buf_v array<double>, wm_us bigint")
_NONE = -1
_Q6 = Decimal("1e-6")
_Q9 = Decimal("1e-9")


def _fold_one(v: float, n: int, s: Decimal, m: Decimal,
              mn: Decimal | None, sign: int, delta: float
              ) -> tuple[Decimal, Decimal, Decimal]:
    """One PH side's fold step — the batch pipeline replayed exactly:
    quantized x, floor-split prefix-sum cast, per-row running mean,
    9-dp half-up term on the shortest float repr."""
    xq = Decimal(repr(float(v))).quantize(_Q6, rounding=ROUND_HALF_UP)
    s = s + xq
    fl = s.to_integral_value(rounding=ROUND_FLOOR)
    s_d = float(fl) + float(s - fl)
    xbar = s_d / n
    term = sign * (float(xq) - xbar) - delta
    tq = Decimal(repr(term)).quantize(_Q9, rounding=ROUND_HALF_UP)
    m = m + tq
    mn = m if mn is None else min(mn, m)
    return s, m, mn


def _make_ph_fn(delta: float, lam: float):
    """applyInPandasWithState body; closure captures plain floats."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (n, s, m_hi, m_lo, min_hi, min_lo, last_us,
             buf_ts, buf_seq, buf_v, wm_us) = state.get
            s, m_hi, m_lo = Decimal(s), Decimal(m_hi), Decimal(m_lo)
            min_hi = None if min_hi == "" else Decimal(min_hi)
            min_lo = None if min_lo == "" else Decimal(min_lo)
            buf_ts, buf_seq, buf_v = \
                list(buf_ts), list(buf_seq), list(buf_v)
        else:
            n, s, m_hi, m_lo = 0, Decimal(0), Decimal(0), Decimal(0)
            min_hi = min_lo = None
            last_us, buf_ts, buf_seq, buf_v, wm_us = \
                _NONE, [], [], [], _NONE

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
                    continue
                n += 1
                # both sides share the SAME prefix sum; fold hi first,
                # reuse its updated s for lo (sign flips the term only)
                s2, m_hi, min_hi = _fold_one(v, n, s, m_hi, min_hi,
                                             1, delta)
                _, m_lo, min_lo = _fold_one(v, n, s, m_lo, min_lo,
                                            -1, delta)
                s = s2
                last_us = t
                folded = True
            buf_ts, buf_seq, buf_v = keep_ts, keep_seq, keep_v
        wm_us = max(wm_us, new_wm_us)

        if folded:
            # the batch emission is F.round((m − min).cast(double), 6):
            # decimal→double cast, then HALF_UP on the double's shortest
            # repr. Python's round() is half-EVEN on the binary double —
            # at a 6-dp midpoint (e.g. 5e-7) the two disagree — so
            # quantize the repr exactly like _fold_one does.
            ph_hi = float(Decimal(repr(float(m_hi - min_hi)))
                          .quantize(_Q6, rounding=ROUND_HALF_UP))
            ph_lo = float(Decimal(repr(float(m_lo - min_lo)))
                          .quantize(_Q6, rounding=ROUND_HALF_UP))
            yield pd.DataFrame({
                "user_id": [key[0]],
                "ph_hi": [ph_hi],
                "ph_lo": [ph_lo],
                "alarm_hi": [ph_hi > lam],
                "alarm_lo": [ph_lo > lam],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last_us, unit="us")]})

        state.update((n, str(s), str(m_hi), str(m_lo),
                      "" if min_hi is None else str(min_hi),
                      "" if min_lo is None else str(min_lo),
                      last_us, buf_ts, buf_seq, buf_v, wm_us))
        if buf_ts:
            wm_ms = wm_us // 1000
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))

    return fn


def page_hinkley_monitor(events: DataFrame, delta: float, lam: float,
                         watermark: str = "10 minutes",
                         key_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value",
                         seq_col: str = "event_id") -> DataFrame:
    """Streaming per-key Page–Hinkley state: update-mode rows (key,
    ph_hi, ph_lo, alarm_hi, alarm_lo, n_events, last_ts) emitted every
    time a key folds new events. After any prefix of the stream, a
    key's latest emission matches ``page_hinkley_scores``' last row
    over the events folded so far (exact — the fold replays the batch
    quantization; pinned by test); the drift alert is the first
    emission with an alarm flag, the same ``> λ`` decision as
    ``page_hinkley_alarms``."""
    key_type = dict(events.dtypes)[key_col]
    filtered = events.select(F.col(key_col).alias("user_id"),
                             F.col(ts_col).alias("ts"),
                             F.col(seq_col).cast("bigint").alias("seq"),
                             F.col(value_col).alias("value"))
    out_schema = (f"user_id {key_type}, ph_hi double, ph_lo double, "
                  "alarm_hi boolean, alarm_lo boolean, n_events bigint, "
                  "last_ts timestamp")
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_ph_fn(float(delta), float(lam)),
                outputStructType=out_schema,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
