"""SCD Type-2 history build — change log → validity intervals.

Warehouses track slowly-changing dimensions as versioned rows with
``valid_from`` / ``valid_to`` ranges; training-data pipelines need the
same shape to answer "what was this document's quality tier / license /
source label *when it was sampled*". The input is an append-only change
log (entity, event time, attribute value); the output is one row per
*run* of consecutive equal values — the classic gaps-and-islands fold.

Plan at 100 TB: everything is keyed by the entity, so there is exactly
ONE shuffle. The change-flag window (lag), the running version-number
window (sum), the per-run aggregation, and the valid_to lookahead window
(lead) all share the entity partitioning — Catalyst reuses a single
Exchange and sorts within partitions only. No global sort, no self-join,
no driver loop; skew is bounded by the busiest single entity's history.

Determinism: rows are ordered by (ts, tiebreak) — callers must pass a
``tiebreak`` column that makes the per-entity order total (e.g. the
change-log sequence number), otherwise same-timestamp flips would make
run boundaries ambiguous in BOTH engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(df: DataFrame, key: str, ts_col: str, attr_col: str,
                 tiebreak: str) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Returns (key, version, attr_col, valid_from, valid_to, n_changes,
    is_current): ``version`` numbers runs 1..k per entity in time order,
    ``valid_from`` is the run's first event time, ``valid_to`` is the
    next run's ``valid_from`` (NULL on the current run — half-open
    intervals, so a point-in-time lookup is ``valid_from <= t AND
    (valid_to IS NULL OR t < valid_to)``), ``n_changes`` counts the
    run's log rows."""
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    w_row = Window.partitionBy(key).orderBy(*order)
    # the lag of a literal marks "there IS a previous row": without it,
    # an entity whose FIRST attribute value is NULL would match
    # lag(attr) null-safely (NULL ≡ NULL) and start numbering at 0
    has_prev = F.lag(F.lit(1)).over(w_row).isNotNull()
    changed = F.when(
        has_prev & F.lag(attr_col).over(w_row).eqNullSafe(F.col(attr_col)),
        F.lit(0)).otherwise(F.lit(1))
    runs = (df
            .withColumn("_version", F.sum(changed).over(
                w_row.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
            .groupBy(key, "_version")
            # every row in a run carries the same attr value (that is what
            # defines the run), so MIN is just "the value"
            .agg(F.min(attr_col).alias(attr_col),
                 F.min(ts_col).alias("valid_from"),
                 F.count(F.lit(1)).alias("n_changes")))
    w_ver = Window.partitionBy(key).orderBy("_version")
    return (runs
            .withColumn("valid_to", F.lead("valid_from").over(w_ver))
            .select(F.col(key),
                    F.col("_version").alias("version"),
                    F.col(attr_col),
                    "valid_from", "valid_to", "n_changes",
                    F.col("valid_to").isNull().alias("is_current")))


def scd2_history_duck(inner_sql: str, key: str, ts_col: str,
                      attr_col: str, tiebreak: str) -> str:
    """DuckDB mirror of :func:`scd2_history` — same lag/sum/lead fold,
    same (ts, tiebreak) total order, same half-open interval semantics."""
    return f"""
WITH log AS (SELECT {key}, {ts_col}, {attr_col}, {tiebreak}
             FROM ({inner_sql})),
flagged AS (
  SELECT *,
         CASE WHEN LAG(1) OVER w IS NOT NULL
               AND LAG({attr_col}) OVER w IS NOT DISTINCT FROM {attr_col}
              THEN 0 ELSE 1 END AS chg
  FROM log
  WINDOW w AS (PARTITION BY {key} ORDER BY {ts_col}, {tiebreak})),
versioned AS (
  SELECT *,
         SUM(chg) OVER (PARTITION BY {key} ORDER BY {ts_col}, {tiebreak}
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM flagged),
runs AS (
  SELECT {key}, version,
         MIN({attr_col}) AS {attr_col},
         MIN({ts_col}) AS valid_from,
         COUNT(*) AS n_changes
  FROM versioned GROUP BY {key}, version)
SELECT {key}, CAST(version AS BIGINT) AS version, {attr_col}, valid_from,
       LEAD(valid_from) OVER wv AS valid_to, n_changes,
       (LEAD(valid_from) OVER wv IS NULL) AS is_current
FROM runs
WINDOW wv AS (PARTITION BY {key} ORDER BY version)
"""


def as_of_snapshot(history: DataFrame, at_ts, ts_from: str = "valid_from",
                   ts_to: str = "valid_to") -> DataFrame:
    """Time-travel read over an SCD2 history: the one version of each
    entity valid AT ``at_ts`` under the half-open interval contract
    (``valid_from <= t < valid_to``, NULL valid_to = current). The
    filter is scan-side codegen — over a history PARTITIONED by a
    valid_from calendar column it also prunes partitions — so a
    point-in-time dimension read costs one filtered scan, never a
    window or join. Entities whose first version starts after ``at_ts``
    are absent (they did not exist yet)."""
    t = F.lit(at_ts).cast("timestamp")
    return history.filter(
        (F.col(ts_from) <= t)
        & (F.col(ts_to).isNull() | (t < F.col(ts_to))))


def as_of_snapshot_duck(history_sql: str, at_ts: str,
                        ts_from: str = "valid_from",
                        ts_to: str = "valid_to") -> str:
    """DuckDB mirror of :func:`as_of_snapshot`; ``at_ts`` is an ISO
    timestamp string."""
    return f"""
SELECT * FROM ({history_sql})
WHERE {ts_from} <= TIMESTAMP '{at_ts}'
  AND ({ts_to} IS NULL OR TIMESTAMP '{at_ts}' < {ts_to})
"""
