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


# --------------------------------------------------- correlation matrix

CORR_DP = 6
CORR_DEC = "decimal(20,6)"


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation matrix over ``cols`` from EXACT sums: every
    pair's Σx, Σy, Σxy, Σx², Σy² accumulates in DECIMAL(20,6)-quantized
    terms inside ONE partial+final aggregate pass (k columns → k(k+1)/2
    product sums, all in the same scan), so the statistics are
    bit-stable under any partitioning — the same discipline as
    ``group_ols``, vs the built-in ``corr`` whose centered float
    moments drift with partition order.

    Rows with a NULL in ANY of ``cols`` are excluded (complete-case,
    documented — pairwise deletion would make each cell's n differ).
    Output: (col_a, col_b, n, corr) for a <= b pairs; corr is NULL when
    either side has zero variance."""
    import itertools

    dec = {c: F.col(c).cast("double").cast(CORR_DEC) for c in cols}
    cond = None
    for c in cols:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    src = df.filter(cond)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(dec[c]).alias(f"_s_{c}"))
    pairs = list(itertools.combinations_with_replacement(cols, 2))
    for a, b in pairs:
        aggs.append(F.sum((dec[a] * dec[b])).alias(f"_p_{a}_{b}"))
    stats = src.agg(*aggs)
    n = F.col("_n").cast("double")

    def var_term(a, b):
        return (n * F.col(f"_p_{a}_{b}").cast("double")
                - F.col(f"_s_{a}").cast("double")
                * F.col(f"_s_{b}").cast("double"))

    rows = F.array(*[
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 F.col("_n").cast("bigint").alias("n"),
                 F.when((var_term(a, a) > 0) & (var_term(b, b) > 0),
                        F.round(var_term(a, b)
                                / F.sqrt(var_term(a, a) * var_term(b, b)),
                                CORR_DP)).alias("corr"))
        for a, b in pairs])
    return stats.select(F.explode(rows).alias("r")).select("r.*")


def corr_matrix_duck(inner_sql: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`corr_matrix` — identical quantization,
    identical n·Σxy − ΣxΣy forms."""
    import itertools

    dec = {c: f"CAST(CAST({c} AS DOUBLE) AS DECIMAL(20,6))" for c in cols}
    nn = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    sums = ["COUNT(*) AS _n"]
    for c in cols:
        sums.append(f"SUM({dec[c]}) AS _s_{c}")
    pairs = list(itertools.combinations_with_replacement(cols, 2))
    for a, b in pairs:
        sums.append(f"SUM({dec[a]} * {dec[b]}) AS _p_{a}_{b}")

    def vt(a, b):
        return (f"(CAST(_n AS DOUBLE) * CAST(_p_{a}_{b} AS DOUBLE) "
                f"- CAST(_s_{a} AS DOUBLE) * CAST(_s_{b} AS DOUBLE))")

    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"CAST(_n AS BIGINT) AS n, "
        f"CASE WHEN {vt(a, a)} > 0 AND {vt(b, b)} > 0 THEN "
        f"ROUND({vt(a, b)} / SQRT({vt(a, a)} * {vt(b, b)}), {CORR_DP}) "
        f"END AS corr FROM s"
        for a, b in pairs)
    return f"""
WITH s AS (SELECT {", ".join(sums)} FROM ({inner_sql}) WHERE {nn})
{rows}
"""


# -------------------------------- Mann–Kendall trend + Theil–Sen slope

MK_DP = 6
MK_Z_CRIT = 1.959963984540054


def mann_kendall_trend(df: DataFrame, keys: list[str], x: Column | str,
                       y: Column | str,
                       z_crit: float = MK_Z_CRIT) -> DataFrame:
    """Per-group Mann–Kendall trend test with the Theil–Sen slope —
    the ROBUST trend pair beside :func:`group_ols`'s least squares
    (OLS asks "what line fits?" and one outlier drags it; MK asks "is
    there a monotone trend at all?" from pairwise signs, and Sen's
    slope is the median pairwise slope — both with the median's
    breakdown resistance; Mann 1945, Kendall 1948, Sen 1968):

        S = Σ_{i<j} sign(y_j − y_i)   (pairs ordered by x)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (y-tie term)
        z = (S∓1)/√Var  (continuity-corrected; 0 at S = 0)
        sen_slope = median{ (y_j − y_i)/(x_j − x_i) }

    Output: (keys..., n_points, s_stat, z, significant, sen_slope).
    Call with ONE observation per (key, x) — a pre-aggregated series
    (daily/monthly totals): the classical variance assumes distinct
    times, so a group containing duplicate x values emits NULL
    statistics with a False verdict (detected exactly via n vs
    distinct-x counts — loud degrade, never a silently wrong z).
    Groups with n < 2, all-tied y (zero variance), or duplicate x ⇒
    NULL z/slope, False verdict. NULL x or y rows are excluded.

    Exactness: S is an exact integer (sign of a DECIMAL(20,6)
    difference), the variance comes from exact integer counts, the
    pairwise slopes are identical IEEE double ratios in both engines,
    and the median is the same interpolated percentile the robust
    family already pairs with DuckDB's quantile_cont.

    Plan at 100 TB: the pair frame is ONE key-partitioned self-join —
    C(n,2) per group BY DEFINITION (the triangle/link-prediction
    stance), bounded because groups are pre-aggregated time series;
    at extreme series length, coarsen x (that is the knob, exactly as
    documented on the operator's catalog entry). The tie and
    duplicate-x audits are two |groups|-bounded aggregates sharing
    the same exchange keys."""
    xb = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yraw = F.col(y) if isinstance(y, str) else y
    yd = yraw.cast("double").cast(CORR_DEC)
    base = (df.filter(xb.isNotNull() & yraw.isNotNull())
            .select(*keys, xb.alias("_x"), yd.alias("_y")))
    g = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct("_x").alias("_ndx"))
    tt = (base.groupBy(*keys, "_y")
          .agg(F.count(F.lit(1)).alias("_t"))
          .groupBy(*keys)
          .agg(F.sum(F.col("_t") * (F.col("_t") - 1)
                     * (2 * F.col("_t") + 5)).alias("_tt")))
    b = base.select(
        *[F.col(c).alias(f"_r_{c}") for c in keys],
        F.col("_x").alias("_x2"), F.col("_y").alias("_y2"))
    # eqNullSafe: row_number/groupBy treat a NULL key as a real group,
    # so the pair join must too — plain equality would leave NULL-key
    # groups with NULL _s/_sen and a bogus z=0 (the jarque_bera /
    # t_closeness convention)
    cond = F.col("_x2") > F.col("_x")
    for c in keys:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_r_{c}"))
    sgn = (F.when(F.col("_y2") > F.col("_y"), 1)
           .when(F.col("_y2") < F.col("_y"), -1).otherwise(0))
    slope = ((F.col("_y2") - F.col("_y")).cast("double")
             / (F.col("_x2") - F.col("_x")).cast("double"))
    ps = (base.join(b, cond)
          .withColumn("_slope_", slope)
          .groupBy(*keys)
          .agg(F.sum(sgn).cast("bigint").alias("_s"),
               F.expr("percentile(_slope_, 0.5)").alias("_sen")))
    tt2 = tt.select(*[F.col(c).alias(f"_t_{c}") for c in keys], "_tt")
    ps2 = ps.select(*[F.col(c).alias(f"_p_{c}") for c in keys],
                    "_s", "_sen")
    jt = F.lit(True)
    jp = F.lit(True)
    for c in keys:
        jt = jt & F.col(c).eqNullSafe(F.col(f"_t_{c}"))
        jp = jp & F.col(c).eqNullSafe(F.col(f"_p_{c}"))
    out = (g.join(tt2, jt, "left").join(ps2, jp, "left"))
    n = F.col("_n").cast("double")
    var = (n * (n - 1) * (2 * n + 5)
           - F.coalesce(F.col("_tt"), F.lit(0)).cast("double")) \
        / F.lit(18.0)
    ok = ((F.col("_n") == F.col("_ndx")) & (F.col("_n") >= 2)
          & (var > 0))
    s = F.col("_s").cast("double")
    z = F.when(ok & (F.col("_s") > 0), (s - 1) / F.sqrt(var)) \
        .when(ok & (F.col("_s") < 0), (s + 1) / F.sqrt(var)) \
        .when(ok, F.lit(0.0))
    return out.select(
        *keys,
        F.col("_n").cast("bigint").alias("n_points"),
        F.when(ok, F.col("_s")).alias("s_stat"),
        F.round(z, MK_DP).alias("z"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant"),
        F.round(F.when(ok, F.col("_sen")), MK_DP).alias("sen_slope"))


def mann_kendall_trend_duck(inner_sql: str, keys: list[str],
                            x_expr: str, y_expr: str,
                            z_crit: float = MK_Z_CRIT) -> str:
    """DuckDB mirror of :func:`mann_kendall_trend` — the same pair
    join, exact sign/tie sums, and quantile_cont median."""
    ks = ", ".join(keys)
    on = " AND ".join(f"b.{k} IS NOT DISTINCT FROM a.{k}" for k in keys)
    on_tt = " AND ".join(
        f"g.{k} IS NOT DISTINCT FROM tt.{k}" for k in keys)
    on_ps = " AND ".join(
        f"g.{k} IS NOT DISTINCT FROM ps.{k}" for k in keys)
    aks = ", ".join(f"a.{k}" for k in keys)
    return f"""
WITH mk0 AS (
  SELECT {ks}, CAST({x_expr} AS BIGINT) AS x,
         CAST(CAST({y_expr} AS DOUBLE) AS DECIMAL(20,6)) AS y
  FROM ({inner_sql})
  WHERE ({x_expr}) IS NOT NULL AND ({y_expr}) IS NOT NULL),
g AS (SELECT {ks}, COUNT(*) AS n, COUNT(DISTINCT x) AS ndx
      FROM mk0 GROUP BY {ks}),
tt AS (SELECT {ks}, SUM(t * (t - 1) * (2 * t + 5)) AS tt
       FROM (SELECT {ks}, y, COUNT(*) AS t FROM mk0
             GROUP BY {ks}, y) GROUP BY {ks}),
ps AS (
  SELECT {aks}, CAST(SUM(CASE WHEN b.y > a.y THEN 1
                              WHEN b.y < a.y THEN -1
                              ELSE 0 END) AS BIGINT) AS s,
         quantile_cont(CAST(b.y - a.y AS DOUBLE)
                       / CAST(b.x - a.x AS DOUBLE), 0.5) AS sen
  FROM mk0 a JOIN mk0 b ON {on} AND b.x > a.x
  GROUP BY {aks}),
j AS (
  SELECT g.*, tt.tt, ps.s, ps.sen,
         (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
          - CAST(COALESCE(tt.tt, 0) AS DOUBLE)) / 18.0 AS var,
         (n = ndx AND n >= 2) AS base_ok
  FROM g
  LEFT JOIN tt ON {on_tt}
  LEFT JOIN ps ON {on_ps}),
stat AS (
  SELECT *, base_ok AND var > 0 AS ok,
         CASE WHEN base_ok AND var > 0 AND s > 0
                THEN (CAST(s AS DOUBLE) - 1) / SQRT(var)
              WHEN base_ok AND var > 0 AND s < 0
                THEN (CAST(s AS DOUBLE) + 1) / SQRT(var)
              WHEN base_ok AND var > 0 THEN 0.0 END AS z
  FROM j)
SELECT {ks}, CAST(n AS BIGINT) AS n_points,
       CASE WHEN ok THEN s END AS s_stat,
       ROUND(z, {MK_DP}) AS z,
       COALESCE(ABS(z) > {z_crit!r}, FALSE) AS significant,
       ROUND(CASE WHEN ok THEN sen END, {MK_DP}) AS sen_slope
FROM stat
"""
