"""Skew-handling: salted two-phase aggregation.

AQE's skew-join splitting (on in session.RUNTIME_CONFS) handles skewed JOIN
partitions automatically; salting is the complementary technique for skewed
AGGREGATION keys — one hot key (a bot user, an empty-string token) can
otherwise pin a whole-stage task at 100 TB.

Phase 1 groups by (key, salt) — the hot key's rows spread over `salts`
reducers; phase 2 merges the per-salt partials. Both phases are ordinary
codegen'd HashAggregates; the result is bit-identical to a direct groupBy
for the supported merge functions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# per-metric (partial_agg, merge_agg) pairs — each must satisfy
# merge(partial(x)) ≡ agg(x)
_MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str], metrics: dict[str, tuple[str, Column | str]],
               salts: int = 16) -> DataFrame:
    """metrics: out_name -> (fn_name in _MERGEABLE, input column).

    Example:
        salted_agg(events, ["user_id"],
                   {"n": ("count", "event_id"),
                    "total": ("sum", dec2("value"))})
    """
    # Deterministic per-row salt: a pure function of the FULL row plus the
    # input partition id, so it is stable under task retries (a retried task
    # re-reads the same partition → same ids, unlike
    # monotonically_increasing_id) while spreading a hot key's rows across
    # `salts` buckets. Mixing in spark_partition_id matters for
    # EXACTLY-duplicate rows — a common shape of hot-key skew — which a
    # row-content hash alone would funnel into one salt bucket; duplicates
    # in different input partitions now salt apart, and duplicates within
    # one partition already collapse in that task's map-side partial
    # aggregate before the shuffle.
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), *[F.col(c) for c in df.columns]),
        F.lit(salts))
    partial_aggs, merge_aggs = [], []
    for out, (fn, col) in metrics.items():
        p, m = _MERGEABLE[fn]
        col = F.col(col) if isinstance(col, str) else col
        partial_aggs.append(p(col).alias(f"__p_{out}"))
        merge_aggs.append(m(F.col(f"__p_{out}")).alias(out))
    phase1 = (df.withColumn("__salt", salt)
              .groupBy(*keys, "__salt").agg(*partial_aggs))
    return phase1.groupBy(*keys).agg(*merge_aggs)
