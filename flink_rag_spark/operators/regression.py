"""Per-group linear regression (OLS trend) from exact aggregation sums.

A curation pipeline watches trends — is a source's quality drifting, is a
nation's order value growing — and the primitive is a least-squares line
per group. The reference has no analytics surface at all (its Flink job
is a pure record-at-a-time RAG chain, `AiJob.java:19-33`); SQL engines
expose this as the ``REGR_SLOPE`` / ``REGR_R2`` aggregate family. This
module computes the same five moments (n, Σx, Σx², Σy, Σy², Σxy) and
derives slope / intercept / R² from them.

Why not ``F.regr_slope`` directly: the built-in accumulates centered
floating-point moments whose partial-aggregation order differs between
engines (and between runs at different partition counts), so the result
is not bit-stable. Here every sum is EXACT — x is integral (BIGINT), y
is a fixed-point DECIMAL — so partial/final aggregation order cannot
change a single bit, and the closed-form arithmetic after the aggregate
is the same IEEE-double expression in both engines.

Plan at 100 TB: one partial+final HashAggregate pair over the group keys
(the only shuffle, map-side combined); the six sums are one pass over
the scan; the slope/intercept/R² math is per-group scalar projection in
whole-stage codegen. No window, no second pass, no driver math.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: rounding of the derived statistics (identical doubles in both engines,
#: so rounding is presentational, not a tolerance)
SLOPE_DP = 6
INTERCEPT_DP = 4
R2_DP = 6


def group_ols(df: DataFrame, keys: list[str], x: Column | str,
              y: Column | str) -> DataFrame:
    """Per-``keys`` OLS of y on x: (keys..., n_points, slope, intercept, r2).

    ``x`` must be integral-valued (cast to BIGINT — e.g. a day index) and
    ``y`` fixed-point-representable (cast to DECIMAL(18,2) — e.g. money):
    that is what makes the six accumulated sums exact and the whole
    statistic deterministic under any partitioning. Groups with fewer
    than 2 points or zero x-variance get NULL slope/intercept/r2.
    R² is the squared Pearson correlation (NULL when y has no variance).
    """
    xb = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yraw = F.col(y) if isinstance(y, str) else y
    yd = yraw.cast("decimal(18,2)")
    # exact products: x*x in BIGINT; y*y and x*y widened so the sum
    # cannot overflow (|x| < 2^31, |y| < 10^16)
    yy = (yd * yd).cast("decimal(38,4)")
    xy = (xb.cast("decimal(20,0)") * yd).cast("decimal(38,2)")
    sums = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xb).alias("_sx"),
        F.sum(xb * xb).alias("_sxx"),
        F.sum(yd).alias("_sy"),
        F.sum(yy).alias("_syy"),
        F.sum(xy).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sy = F.col("_sy").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    cov_n = n * sxy - sx * sy      # n² · covariance
    varx_n = n * sxx - sx * sx     # n² · variance(x)
    vary_n = n * syy - sy * sy     # n² · variance(y)
    slope = F.when(varx_n > 0, cov_n / varx_n)
    intercept = (sy - slope * sx) / n
    r2 = F.when((varx_n > 0) & (vary_n > 0),
                (cov_n * cov_n) / (varx_n * vary_n))
    return sums.select(
        *keys,
        F.col("_n").alias("n_points"),
        F.round(slope, SLOPE_DP).alias("slope"),
        F.round(intercept, INTERCEPT_DP).alias("intercept"),
        F.round(r2, R2_DP).alias("r2"),
    )


def group_ols_duck(inner_sql: str, keys: list[str], x_sql: str,
                   y_sql: str) -> str:
    """DuckDB mirror of :func:`group_ols` — the same exact sums (BIGINT /
    DECIMAL), the same double-precision closed form, the same rounding.
    ``inner_sql`` provides the rows; ``x_sql`` / ``y_sql`` are column
    expressions over it."""
    ks = ", ".join(keys)
    return f"""
WITH pts AS (
  SELECT {ks},
         CAST({x_sql} AS BIGINT) AS x,
         CAST({y_sql} AS DECIMAL(18,2)) AS y
  FROM ({inner_sql})),
sums AS (
  SELECT {ks},
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(y) AS sy,
         SUM(CAST(y * y AS DECIMAL(38,4))) AS syy,
         SUM(CAST(CAST(x AS DECIMAL(20,0)) * y AS DECIMAL(38,2))) AS sxy
  FROM pts GROUP BY {ks}),
d AS (
  SELECT {ks}, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sxx AS DOUBLE) AS sxxd,
         CAST(sy AS DOUBLE) AS syd, CAST(syy AS DOUBLE) AS syyd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM sums),
forms AS (
  SELECT {ks}, n,
         nd * sxyd - sxd * syd AS cov_n,
         nd * sxxd - sxd * sxd AS varx_n,
         nd * syyd - syd * syd AS vary_n,
         sxd, syd, nd
  FROM d)
SELECT {ks}, n AS n_points,
       ROUND(CASE WHEN varx_n > 0 THEN cov_n / varx_n END,
             {SLOPE_DP}) AS slope,
       ROUND((syd - (CASE WHEN varx_n > 0 THEN cov_n / varx_n END) * sxd)
             / nd, {INTERCEPT_DP}) AS intercept,
       ROUND(CASE WHEN varx_n > 0 AND vary_n > 0
                  THEN (cov_n * cov_n) / (varx_n * vary_n) END,
             {R2_DP}) AS r2
FROM forms
"""
