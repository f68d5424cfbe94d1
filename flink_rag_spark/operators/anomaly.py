"""Robust outlier detection (per-group median/MAD flagging) and CUSUM
change-point detection.

Quality gates need an outlier rule that survives the outliers it hunts:
mean/stddev z-scores (the `grouped_map_zscore` shape) are dragged by the
very extremes they should flag, while the median and the median absolute
deviation have a 50% breakdown point. The standard robust score is

    z = (x − median) / (1.4826 · MAD)

(1.4826 scales MAD to a normal σ), flagged at |z| > 3.5 — the classic
Iglewicz–Hoaglin rule.

Plan at 100 TB: two partial+final aggregates over the group keys (the
exact interpolated median, then the MAD over the deviation) with the
tiny per-group stats joined back — everything shuffles on the group
key; AQE broadcasts the stats side when the group count is small. For
extreme group cardinality the exact percentile swaps for
``approx_percentile`` exactly like `profiling.quantile_bins` — same
plan shape, sketch-merge instead of exact sort.

Zero-MAD groups (over half the group at one value): the score is
undefined, so ``robust_z`` is NULL and any deviation from the median is
flagged — a zero-spread group's contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MAD_SIGMA = 1.4826          # MAD → normal-σ consistency constant
DEFAULT_Z = 3.5             # Iglewicz–Hoaglin threshold
Z_DP = 4


def robust_outliers(df: DataFrame, keys: list[str], value_col: str,
                    z_thresh: float = DEFAULT_Z,
                    exact: bool = True) -> DataFrame:
    """Rows of ``df`` flagged as robust outliers of ``value_col`` within
    their ``keys`` group: the input columns plus (group_median,
    group_mad, robust_z). NULL values are never flagged."""
    pct = "percentile" if exact else "approx_percentile"
    v = F.col(value_col).cast("double")
    med = (df.filter(v.isNotNull())
           .groupBy(*keys)
           .agg(F.expr(f"{pct}(CAST({value_col} AS DOUBLE), 0.5)")
                .alias("group_median")))
    with_med = df.join(med, keys)
    mad = (with_med.filter(v.isNotNull())
           .groupBy(*keys)
           .agg(F.expr(f"{pct}(abs(CAST({value_col} AS DOUBLE) "
                       f"- group_median), 0.5)").alias("group_mad")))
    j = with_med.join(mad, keys)
    dev = F.abs(v - F.col("group_median"))
    z = dev / (F.lit(MAD_SIGMA) * F.col("group_mad"))
    is_out = F.when(v.isNull(), F.lit(False)).otherwise(
        F.when(F.col("group_mad") > 0, z > F.lit(z_thresh))
        .otherwise(dev > 0))
    return (j.withColumn("robust_z",
                         F.when(F.col("group_mad") > 0,
                                F.round(z, Z_DP)))
            .filter(is_out)
            .select(*df.columns, "group_median", "group_mad", "robust_z"))


def robust_outliers_duck(inner_sql: str, keys: list[str], value_col: str,
                         z_thresh: float = DEFAULT_Z) -> str:
    """DuckDB mirror of :func:`robust_outliers` (exact path) — same
    interpolated medians, same constant, same zero-MAD contract."""
    ks = ", ".join(keys)
    on_m = " AND ".join(f"t.{k} = med.{k}" for k in keys)
    on_d = " AND ".join(f"t.{k} = mad.{k}" for k in keys)
    return f"""
WITH src AS (SELECT * FROM ({inner_sql})),
med AS (
  SELECT {ks}, quantile_cont(CAST({value_col} AS DOUBLE), 0.5)
         AS group_median
  FROM src WHERE {value_col} IS NOT NULL GROUP BY {ks}),
mad AS (
  SELECT t.{ks.replace(', ', ', t.')},
         quantile_cont(abs(CAST(t.{value_col} AS DOUBLE)
                           - med.group_median), 0.5) AS group_mad
  FROM src t JOIN med ON {on_m}
  WHERE t.{value_col} IS NOT NULL
  GROUP BY t.{ks.replace(', ', ', t.')})
SELECT t.*, med.group_median, mad.group_mad,
       CASE WHEN mad.group_mad > 0 THEN
         ROUND(abs(CAST(t.{value_col} AS DOUBLE) - med.group_median)
               / ({MAD_SIGMA!r} * mad.group_mad), {Z_DP})
       END AS robust_z
FROM src t
JOIN med ON {on_m}
JOIN mad ON {on_d}
WHERE t.{value_col} IS NOT NULL
  AND CASE WHEN mad.group_mad > 0 THEN
        abs(CAST(t.{value_col} AS DOUBLE) - med.group_median)
          / ({MAD_SIGMA!r} * mad.group_mad) > {z_thresh!r}
      ELSE abs(CAST(t.{value_col} AS DOUBLE) - med.group_median) > 0 END
"""


# ------------------------------------------------------------- CUSUM

CUSUM_DP = 6


def cusum_scores(df: DataFrame, keys: list[str], ts_col: str,
                 value_col: str, target: float, slack: float,
                 seq_col: str | None = None) -> DataFrame:
    """Two-sided CUSUM (Page 1954) per key, fully declarative: the
    textbook recurrence s_i = max(0, s_{i-1} + d_i) has the closed form

        s_i = C_i − min(0, min_{j≤i} C_j),   C = running sum of d

    so both one-sided statistics (d = x−target−slack for upward shifts,
    d = target−x−slack for downward) are ONE running sum + ONE running
    min over the same (key, ts)-ordered frame — no recursion, no UDF,
    one exchange for all four windows. Deviations are quantized to
    DECIMAL(20,6) BEFORE accumulating (the decay-family discipline), so
    the running sums are exact integers-in-decimal and the scores are
    bit-identical in any engine and under any partitioning.

    Returns the input rows plus (cusum_hi, cusum_lo) rounded to 6dp.
    An alarm is ``cusum > h``; see :func:`cusum_first_alarms` for the
    per-key change-point summary."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    x = F.col(value_col).cast("double")
    d_hi = (x - F.lit(float(target)) - F.lit(float(slack))) \
        .cast("decimal(20,6)")
    d_lo = (F.lit(float(target)) - x - F.lit(float(slack))) \
        .cast("decimal(20,6)")
    out = df
    for name, d in (("hi", d_hi), ("lo", d_lo)):
        out = out.withColumn(f"_c_{name}", F.sum(d).over(w))
        out = out.withColumn(
            f"cusum_{name}",
            (F.col(f"_c_{name}")
             - F.least(F.lit(0).cast("decimal(20,6)"),
                       F.min(f"_c_{name}").over(w))).cast("double"))
    return (out.drop("_c_hi", "_c_lo")
            .withColumn("cusum_hi", F.round("cusum_hi", CUSUM_DP))
            .withColumn("cusum_lo", F.round("cusum_lo", CUSUM_DP)))


def cusum_first_alarms(df: DataFrame, keys: list[str], ts_col: str,
                       value_col: str, target: float, slack: float,
                       h: float, seq_col: str | None = None) -> DataFrame:
    """Per-key change-point summary over :func:`cusum_scores`:
    (keys..., first_hi_ts, first_lo_ts, max_cusum_hi, max_cusum_lo,
    n_alarms) — the earliest instant each one-sided statistic crossed
    the decision threshold ``h`` (NULL = never), the statistics' peaks,
    and the total alarm-row count. One aggregate over the scored frame:
    the whole detector is one exchange + one partial+final groupBy."""
    scored = cusum_scores(df, keys, ts_col, value_col, target, slack,
                          seq_col)
    hi = F.col("cusum_hi") > h
    lo = F.col("cusum_lo") > h
    return (scored.groupBy(*keys).agg(
        F.min(F.when(hi, F.col(ts_col))).alias("first_hi_ts"),
        F.min(F.when(lo, F.col(ts_col))).alias("first_lo_ts"),
        F.max("cusum_hi").alias("max_cusum_hi"),
        F.max("cusum_lo").alias("max_cusum_lo"),
        F.sum(F.when(hi | lo, 1).otherwise(0)).cast("bigint")
        .alias("n_alarms")))


def cusum_first_alarms_duck(inner_sql: str, keys: list[str], ts_col: str,
                            value_col: str, target: float, slack: float,
                            h: float,
                            seq_col: str | None = None) -> str:
    """DuckDB mirror of :func:`cusum_first_alarms` — the same closed
    form over the same DECIMAL-quantized deviations, so the running
    statistics replay bit-identically."""
    ks = ", ".join(keys)
    order = f"{ts_col}" + (f", {seq_col}" if seq_col else "")
    over = (f"OVER (PARTITION BY {ks} ORDER BY {order} "
            "ROWS UNBOUNDED PRECEDING)")
    return f"""
WITH src AS (SELECT * FROM ({inner_sql})),
d AS (
  SELECT *,
         CAST(CAST({value_col} AS DOUBLE) - {target!r} - {slack!r}
              AS DECIMAL(20,6)) AS d_hi,
         CAST({target!r} - CAST({value_col} AS DOUBLE) - {slack!r}
              AS DECIMAL(20,6)) AS d_lo
  FROM src),
c AS (
  SELECT *, SUM(d_hi) {over} AS c_hi, SUM(d_lo) {over} AS c_lo
  FROM d),
s AS (
  SELECT *,
         ROUND(CAST(c_hi - LEAST(CAST(0 AS DECIMAL(20,6)),
                                 MIN(c_hi) {over}) AS DOUBLE),
               {CUSUM_DP}) AS cusum_hi,
         ROUND(CAST(c_lo - LEAST(CAST(0 AS DECIMAL(20,6)),
                                 MIN(c_lo) {over}) AS DOUBLE),
               {CUSUM_DP}) AS cusum_lo
  FROM c)
SELECT {ks},
       MIN(CASE WHEN cusum_hi > {h!r} THEN {ts_col} END) AS first_hi_ts,
       MIN(CASE WHEN cusum_lo > {h!r} THEN {ts_col} END) AS first_lo_ts,
       MAX(cusum_hi) AS max_cusum_hi,
       MAX(cusum_lo) AS max_cusum_lo,
       CAST(SUM(CASE WHEN cusum_hi > {h!r} OR cusum_lo > {h!r}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
FROM s GROUP BY {ks}
"""


def seasonal_baseline_outliers(df: DataFrame, ts_col: str,
                               value_col: str, phase: str = "hour",
                               z_thresh: float = DEFAULT_Z,
                               value_scale: int = 2) -> DataFrame:
    """Rows whose value is unusual FOR ITS TIME PHASE — the seasonal
    complement of :func:`robust_outliers` (which asks "unusual for this
    key"): a 3am value judged against the 3am baseline, not the global
    one. ``phase`` is ``'hour'`` (hour of day) or ``'dow'`` (day of
    week). Output: the flagged rows with (phase, phase_n, phase_mean,
    phase_sd, z), z = (x − μ_phase)/σ_phase rounded at 6 dp.

    Determinism: the phase moments come from EXACT decimal sums — the
    corr_matrix discipline: values quantize to ``value_scale`` decimals
    so Σx and Σx² are exact under any partitioning; mean/variance/z are
    then quotients of identical doubles (never boundary-exact, the
    repo's quotient stance). Phases with fewer than 2 rows or zero
    variance flag nothing.

    Plan: ONE ≤|phases|-row aggregate + a broadcast join back + a
    scan-side filter — two passes over the column, no window."""
    if phase == "hour":
        ph = F.hour(F.col(ts_col))
    elif phase == "dow":
        ph = F.dayofweek(F.col(ts_col))
    else:
        raise ValueError(f"phase must be 'hour' or 'dow', got {phase!r}")
    v = F.col(value_col).cast("double")
    vdec = F.col(value_col).cast(f"decimal(24,{value_scale})")
    src = df.filter(v.isNotNull()).withColumn("phase", ph)
    mom = (src.groupBy("phase")
           .agg(F.count(F.lit(1)).cast("double").alias("_n"),
                F.sum(vdec).cast("double").alias("_sx"),
                F.sum(vdec * vdec).cast("double").alias("_sx2")))
    mean = F.col("_sx") / F.col("_n")
    var = ((F.col("_sx2") - F.col("_sx") * F.col("_sx") / F.col("_n"))
           / (F.col("_n") - 1))
    stats = mom.select(
        "phase", F.col("_n").cast("bigint").alias("phase_n"),
        F.round(mean, 6).alias("phase_mean"),
        F.when((F.col("_n") > 1) & (var > 0), F.round(F.sqrt(var), 6))
        .alias("phase_sd"),
        mean.alias("_mu"),
        F.when((F.col("_n") > 1) & (var > 0), F.sqrt(var)).alias("_sd"))
    out = (src.join(F.broadcast(stats), on="phase")
           .withColumn("z", F.round((v - F.col("_mu")) / F.col("_sd"),
                                    6)))
    return (out.filter(F.abs(F.col("z")) > z_thresh)
            .drop("_mu", "_sd"))


def seasonal_baseline_outliers_duck(inner_sql: str, ts_col: str,
                                    value_col: str, phase: str = "hour",
                                    z_thresh: float = DEFAULT_Z,
                                    value_scale: int = 2) -> str:
    """DuckDB mirror of :func:`seasonal_baseline_outliers` — the same
    exact decimal sums, quotient moments and 6-dp z."""
    if phase == "hour":
        ph = f"CAST(hour({ts_col}) AS INT)"
    elif phase == "dow":
        # Spark dayofweek: 1 = Sunday; DuckDB dayofweek: 0 = Sunday
        ph = f"CAST(dayofweek({ts_col}) + 1 AS INT)"
    else:
        raise ValueError(f"phase must be 'hour' or 'dow', got {phase!r}")
    return f"""
WITH src AS (
  SELECT *, {ph} AS phase,
         CAST({value_col} AS DECIMAL(24,{value_scale})) AS _vd
  FROM ({inner_sql}) WHERE {value_col} IS NOT NULL),
mom AS (
  SELECT phase,
         CAST(COUNT(*) AS DOUBLE) AS _n,
         CAST(SUM(_vd) AS DOUBLE) AS _sx,
         CAST(SUM(_vd * _vd) AS DOUBLE) AS _sx2
  FROM src GROUP BY phase),
stats AS (
  SELECT phase, CAST(_n AS BIGINT) AS phase_n,
         ROUND(_sx / _n, 6) AS phase_mean,
         CASE WHEN _n > 1 AND (_sx2 - _sx * _sx / _n) / (_n - 1) > 0
              THEN ROUND(SQRT((_sx2 - _sx * _sx / _n) / (_n - 1)), 6)
         END AS phase_sd,
         _sx / _n AS _mu,
         CASE WHEN _n > 1 AND (_sx2 - _sx * _sx / _n) / (_n - 1) > 0
              THEN SQRT((_sx2 - _sx * _sx / _n) / (_n - 1))
         END AS _sd
  FROM mom)
SELECT * FROM (
  SELECT src.* EXCLUDE (_vd), s.phase_n, s.phase_mean, s.phase_sd,
         ROUND((CAST(src.{value_col} AS DOUBLE) - s._mu) / s._sd, 6) AS z
  FROM src JOIN stats s USING (phase))
WHERE ABS(z) > {z_thresh!r}
"""
