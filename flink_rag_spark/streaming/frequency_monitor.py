"""Streaming heavy hitters: bucketed Misra-Gries summaries in keyed state.

The streaming twin of ``operators/frequency.heavy_hitters``: a running
"what's hot" view (top event types, trending tokens, hot join keys)
maintained incrementally with BOUNDED state — never a per-item counter
table. Items hash into ``n_buckets`` state keys; each bucket folds its
arrivals into a Misra-Gries summary of capacity ``m`` (the same
compact-by-subtracting step, Agarwal et al. mergeable summaries, as the
batch operator's per-partition phase).

Guarantee (same as the batch op's): an item's true count ``c`` sits in
``[lo, hi] = [state count, state count + bucket decrements]``, and
``hi ≥ c`` always — so filtering emissions on ``hi > frac·N`` yields a
SUPERSET of the true heavy hitters for any ``frac ≥ 1/(m+1)``; the
exact-recount step (batch op phase 2, or a filtered count over the
source) prunes false positives when exactness matters.

State per bucket: ≤ m (item, count) pairs + 3 scalars — global state is
``n_buckets · m`` entries regardless of stream length or item
cardinality. Emissions are update-mode: each batch a bucket re-emits
its current summary rows stamped with a monotonically increasing
``ver``, so "the current view" is the max-``ver`` rows per bucket
(``mg_candidates`` below does that fold).

Items are carried as strings in state (one static schema for any input
type); cast back at the edge if needed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = ("items array<string>, counts array<bigint>, "
                 "n_rows bigint, decs bigint, ver bigint")
_OUT_SCHEMA = ("bucket int, item string, lo bigint, hi bigint, "
               "n_bucket bigint, ver bigint")


def _make_mg_fn(m: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_rows, decs, ver = state.get
            acc = dict(zip(items, counts))
        else:
            acc, n_rows, decs, ver = {}, 0, 0, 0
        for pdf in pdfs:
            s = pdf["item"].dropna()
            n_rows += len(s)
            for val, cnt in s.value_counts().items():
                acc[val] = acc.get(val, 0) + int(cnt)
            if len(acc) > m:
                # subtract the (m+1)-th largest, keep positive — every
                # dropped/decremented item's undercount is bounded by
                # the accumulated cuts (decs)
                cut = sorted(acc.values(), reverse=True)[m]
                acc = {k: v - cut for k, v in acc.items() if v > cut}
                decs += cut
        ver += 1
        state.update((list(acc.keys()), list(acc.values()),
                      n_rows, decs, ver))
        if acc:
            yield pd.DataFrame({
                "bucket": [key[0]] * len(acc),
                "item": list(acc.keys()),
                "lo": list(acc.values()),
                "hi": [v + decs for v in acc.values()],
                "n_bucket": [n_rows] * len(acc),
                "ver": [ver] * len(acc)})
        else:
            # a compact can empty the summary (all counts equal the
            # cut); emit a NULL-item sentinel so the bucket's totals
            # stay current for mg_candidates' fold
            yield pd.DataFrame({
                "bucket": [key[0]], "item": [None], "lo": [0],
                "hi": [decs], "n_bucket": [n_rows], "ver": [ver]})

    return fn


def heavy_hitter_monitor(items: DataFrame, col: str, m: int = 64,
                         n_buckets: int = 16) -> DataFrame:
    """Streaming bucketed-MG summaries of ``col``: update-mode rows
    (bucket, item, lo, hi, n_bucket, ver) re-emitted per bucket per
    batch. NULL items are dropped (the batch operator's contract).
    One shuffle on the hash bucket; python work per batch is a
    value_counts + dict fold over the bucket's slice."""
    src = (items.select(F.col(col).cast("string").alias("item"))
           .filter(F.col("item").isNotNull())
           .withColumn("bucket",
                       F.pmod(F.xxhash64("item"),
                              F.lit(n_buckets)).cast("int")))
    return (src.groupBy("bucket")
            .applyInPandasWithState(
                _make_mg_fn(m),
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def mg_candidates(emissions: DataFrame,
                  threshold_frac: float) -> DataFrame:
    """Fold an emissions table (e.g. the memory sink of
    :func:`heavy_hitter_monitor`) into the CURRENT candidate set:
    max-``ver`` rows per bucket, N = Σ per-bucket totals, items kept
    when ``hi`` > threshold·N — a guaranteed superset of the true heavy
    hitters. Returns (item, lo, hi, n_total)."""
    # rename the aggregate's columns before the self-join: a memory-sink
    # view joined with its own aggregate trips conflicting-reference
    # resolution otherwise
    latest_ver = (emissions.groupBy("bucket")
                  .agg(F.max("ver").alias("_v"))
                  .select(F.col("bucket").alias("_b"), "_v"))
    latest = (emissions.join(
        F.broadcast(latest_ver),
        (F.col("bucket") == F.col("_b")) & (F.col("ver") == F.col("_v")))
        .drop("_b", "_v"))
    totals = (latest.groupBy("bucket").agg(F.max("n_bucket").alias("nb"))
              .agg(F.sum("nb").alias("n_total")))
    return (latest.crossJoin(F.broadcast(totals))
            .filter(F.col("item").isNotNull()
                    & (F.col("hi") >
                       F.col("n_total").cast("double")
                       * F.lit(threshold_frac)))
            .select("item", "lo", "hi", "n_total"))
