"""Robust outlier detection — per-group median/MAD flagging.

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
