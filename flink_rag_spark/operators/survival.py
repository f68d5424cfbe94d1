"""Kaplan–Meier survival analysis — time-to-event with right censoring.

The retention/conversion question cohort_retention and the funnel
family answer in buckets ("how many converted by week w") has a
principled estimator when observation windows are UNEQUAL: subjects
still unconverted at the end of the observation window are CENSORED —
they contribute to the at-risk denominator up to their censoring time
and then drop out, instead of being miscounted as never-converting.
Kaplan & Meier 1958 ("Nonparametric estimation from incomplete
observations"): at each distinct event time t_i with d_i events among
n_i at-risk subjects,

    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

Engine-portability: d_i and n_i are exact integer counts, so each
factor is one double division — identical in any engine. The running
product is computed as EXP(Σ ln factor) over the NON-ZERO factors with
a separate running zero-factor count (DuckDB refuses LN(0); a d_i = n_i
step zeroes the curve from there on), and the terminal 6-dp round
absorbs ln/exp last-ulp drift.

Scale shape: ONE (group, t) aggregate over the subject frame, then
three window functions sharing one (group) partitioning — the reverse
cumulative at-risk sum, the running zero count, the running log sum.
Output is |distinct event times| rows per group. No joins, no
per-subject state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

ROUND_DP = 6


def km_survival(subjects: DataFrame, duration_col: str, event_col: str,
                group_cols: list[str] | None = None) -> DataFrame:
    """(group..., t, n_risk, n_events, n_censored, survival) — the
    Kaplan–Meier curve per group, one row per distinct duration at
    which ≥1 EVENT occurred (the standard step presentation; censoring
    times without events shrink later risk sets but emit no row).

    ``subjects`` has one row per subject: ``duration_col`` (numeric,
    time to event or to censoring), ``event_col`` (1/true = the event
    was observed, 0/false = censored at that duration). Rows with a
    NULL duration OR a NULL event flag are excluded on BOTH sides (a
    NULL flag is an unknown outcome, not a censoring — counting it as
    censored would silently inflate every risk set)."""
    groups = list(group_cols or [])
    ev = F.col(event_col).cast("int")
    agg = (subjects
           .filter(F.col(duration_col).isNotNull()
                   & F.col(event_col).isNotNull())
           .groupBy(*groups, F.col(duration_col).alias("t"))
           .agg(F.sum(ev).alias("d"),
                F.sum(1 - ev).alias("c")))
    w_rev = (Window.partitionBy(*groups).orderBy("t")
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    w_run = (Window.partitionBy(*groups).orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = agg.withColumn("n_risk", F.sum(F.col("d") + F.col("c"))
                          .over(w_rev))
    factor_ln = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
    ).otherwise(F.lit(0.0))
    steps = (risk
             .withColumn("_zeros", F.sum(
                 F.when(F.col("d") == F.col("n_risk"), 1)
                 .otherwise(0)).over(w_run))
             .withColumn("_ls", F.sum(factor_ln).over(w_run)))
    return (steps.filter(F.col("d") > 0)
            .select(*groups,
                    F.col("t"),
                    F.col("n_risk").cast("bigint").alias("n_risk"),
                    F.col("d").cast("bigint").alias("n_events"),
                    F.col("c").cast("bigint").alias("n_censored"),
                    F.when(F.col("_zeros") > 0, F.lit(0.0))
                    .otherwise(F.round(F.exp("_ls"), ROUND_DP))
                    .alias("survival")))


def km_survival_duck(subjects_sql: str, duration_col: str,
                     event_col: str,
                     group_cols: list[str] | None = None) -> str:
    """DuckDB mirror of :func:`km_survival` — the same aggregate,
    reverse-cumulative risk window, zero-count and log-sum replay.
    ``subjects_sql`` yields one row per subject."""
    groups = list(group_cols or [])
    g = ", ".join(groups)
    gpfx = f"{g}, " if groups else ""
    part = f"PARTITION BY {g} " if groups else ""
    return f"""
WITH km_subj0 AS ({subjects_sql}),
agg AS (
  SELECT {gpfx}{duration_col} AS t,
         SUM(CASE WHEN CAST({event_col} AS INT) = 1 THEN 1 ELSE 0 END) AS d,
         SUM(CASE WHEN CAST({event_col} AS INT) = 1 THEN 0 ELSE 1 END) AS c
  FROM km_subj0
  WHERE {duration_col} IS NOT NULL AND {event_col} IS NOT NULL
  GROUP BY {gpfx}t),
risk AS (
  SELECT {gpfx}t, d, c,
         SUM(d + c) OVER ({part}ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM agg),
steps AS (
  SELECT {gpfx}t, d, c, n_risk,
         SUM(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
           OVER ({part}ORDER BY t ROWS UNBOUNDED PRECEDING) AS zeros,
         SUM(CASE WHEN d > 0 AND d < n_risk
                  THEN LN(1.0 - CAST(d AS DOUBLE) / n_risk)
                  ELSE 0.0 END)
           OVER ({part}ORDER BY t ROWS UNBOUNDED PRECEDING) AS ls
  FROM risk)
SELECT {gpfx}t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
       CASE WHEN zeros > 0 THEN 0.0 ELSE ROUND(EXP(ls), {ROUND_DP}) END
         AS survival
FROM steps WHERE d > 0
"""

# ------------------------------------- Nelson–Aalen cumulative hazard

NA_TERM_DP = 9


def nelson_aalen(subjects: DataFrame, duration_col: str, event_col: str,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator — the hazard-scale
    companion of :func:`km_survival` (Nelson 1972, Aalen 1978): at each
    distinct event time, H(t) = Σ_{t_i ≤ t} d_i / n_i, the
    nonparametric estimate of accumulated event INTENSITY (additive
    where KM's survival is multiplicative — the natural scale for
    comparing hazards between cohorts or feeding a Cox-style ratio).
    Also emits the Breslow/Fleming–Harrington survival exp(−H), the
    standard small-risk-set-robust alternative to the KM product.

    Output: (group..., t, n_risk, n_events, n_censored, cum_hazard,
    survival_fh) — one row per distinct duration with ≥1 event, the KM
    presentation. Same exclusion contract as KM (NULL duration or
    event flag drops the subject).

    Exactness: d_i / n_i integer-ratio doubles quantize to 9-dp
    DECIMAL before the running sum, so the cumulative hazard is an
    EXACT decimal prefix sum (stronger than KM's ln/exp path, which
    the multiplicative form forces); the final rounds happen at 6 dp.

    Plan at 100 TB: identical to KM — ONE (group, t) aggregate over
    the subject frame, one reverse-cumulative risk window + one
    running sum sharing the (group) partitioning; |distinct event
    times| rows per group, no joins."""
    groups = list(group_cols or [])
    ev = F.col(event_col).cast("int")
    agg = (subjects
           .filter(F.col(duration_col).isNotNull()
                   & F.col(event_col).isNotNull())
           .groupBy(*groups, F.col(duration_col).alias("t"))
           .agg(F.sum(ev).alias("d"),
                F.sum(1 - ev).alias("c")))
    w_rev = (Window.partitionBy(*groups).orderBy("t")
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    w_run = (Window.partitionBy(*groups).orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = agg.withColumn("n_risk", F.sum(F.col("d") + F.col("c"))
                          .over(w_rev))
    dec9 = f"decimal(30,{NA_TERM_DP})"
    term = F.round(F.col("d").cast("double") / F.col("n_risk"),
                   NA_TERM_DP).cast(dec9)
    steps = risk.withColumn("_h", F.sum(term).over(w_run))
    h = F.col("_h").cast("double")
    return (steps.filter(F.col("d") > 0)
            .select(*groups,
                    F.col("t"),
                    F.col("n_risk").cast("bigint").alias("n_risk"),
                    F.col("d").cast("bigint").alias("n_events"),
                    F.col("c").cast("bigint").alias("n_censored"),
                    F.round(h, ROUND_DP).alias("cum_hazard"),
                    F.round(F.exp(-h), ROUND_DP).alias("survival_fh")))


def nelson_aalen_duck(subjects_sql: str, duration_col: str,
                      event_col: str,
                      group_cols: list[str] | None = None) -> str:
    """DuckDB mirror of :func:`nelson_aalen` — the same aggregate,
    risk window, and 9-dp decimal hazard prefix sum."""
    groups = list(group_cols or [])
    g = ", ".join(groups)
    gpfx = f"{g}, " if groups else ""
    part = f"PARTITION BY {g} " if groups else ""
    dp = NA_TERM_DP
    return f"""
WITH na_subj0 AS ({subjects_sql}),
agg AS (
  SELECT {gpfx}{duration_col} AS t,
         SUM(CASE WHEN CAST({event_col} AS INT) = 1 THEN 1 ELSE 0 END) AS d,
         SUM(CASE WHEN CAST({event_col} AS INT) = 1 THEN 0 ELSE 1 END) AS c
  FROM na_subj0
  WHERE {duration_col} IS NOT NULL AND {event_col} IS NOT NULL
  GROUP BY {gpfx}t),
risk AS (
  SELECT {gpfx}t, d, c,
         SUM(d + c) OVER ({part}ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM agg),
steps AS (
  SELECT {gpfx}t, d, c, n_risk,
         SUM(CAST(ROUND(CAST(d AS DOUBLE) / n_risk, {dp})
                  AS DECIMAL(30,{dp})))
           OVER ({part}ORDER BY t ROWS UNBOUNDED PRECEDING) AS h
  FROM risk)
SELECT {gpfx}t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
       ROUND(CAST(h AS DOUBLE), {ROUND_DP}) AS cum_hazard,
       ROUND(EXP(-CAST(h AS DOUBLE)), {ROUND_DP}) AS survival_fh
FROM steps WHERE d > 0
"""
