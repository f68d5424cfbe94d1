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
from pyspark.sql import DataFrame, Window

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


# --------------------------------------------- EWMA control chart

EWMA_W_DP = 12
EWMA_DP = 6
EWMA_DEC = "decimal(20,6)"
EWMA_MAX_LAGS = 512


def _ewma_weights(lam: float) -> list[tuple[int, str, str]]:
    """Per-lag EWMA weight rows, 12-dp DECIMAL STRINGS computed once in
    Python (the SES discipline — engine POWER drifts in the last ulp).
    The recurrence z_t = λx_t + (1−λ)z_{t−1}, z_1 = x_1 has the closed
    form z_t = Σ_{j=0..t−2} λr^j·x_{t−j} + r^{t−1}·x_1 with r = 1−λ;
    row k carries (r^k, λr^k) — the seed (rn = 1) and regular weights
    at lag k. The table stops at the first lag whose r^k quantizes to
    0 at 12 dp: later lags contribute EXACTLY nothing under the
    quantized-weight semantics, so the bounded pair join below is the
    exact operator, not an approximation. Raises when the geometry
    needs more than EWMA_MAX_LAGS lags (λ too small — the HW
    convergence-guard stance)."""
    if not (0.0 < lam <= 1.0):
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    dp = EWMA_W_DP
    r = 1.0 - lam
    out, k, rk = [], 0, 1.0
    while round(rk, dp) > 0.0:
        out.append((k, f"{round(rk, dp):.{dp}f}",
                    f"{round(lam * rk, dp):.{dp}f}"))
        rk *= r
        k += 1
        if k > EWMA_MAX_LAGS:
            raise ValueError(
                f"lam={lam} needs > {EWMA_MAX_LAGS} lags to converge at "
                f"{dp} dp; raise lam or pre-aggregate the series")
    return out


def _ewma_limit_factors(lam: float) -> tuple[list[tuple[int, str]], str]:
    """(t, √(λ/(2−λ)·(1−r^{2t}))) 12-dp rows for the widening control
    limits, plus the asymptotic factor √(λ/(2−λ)) the table converges
    to (rows stop once 1−r^{2t} is 1 at 12 dp; later t use the
    asymptote)."""
    dp = EWMA_W_DP
    r = 1.0 - lam
    base = lam / (2.0 - lam)
    out, t, r2t = [], 1, r * r
    while round(1.0 - r2t, dp) < 1.0:
        out.append((t, f"{round((base * (1.0 - r2t)) ** 0.5, dp):.{dp}f}"))
        r2t *= r * r
        t += 1
        if t > 2 * EWMA_MAX_LAGS:
            break
    return out, f"{round(base ** 0.5, dp):.{dp}f}"


def ewma_control(df: DataFrame, keys: list[str], ts_col: str,
                 value_col: str, seq_col: str, lam: float = 0.2,
                 n_sigma: float = 3.0) -> DataFrame:
    """EWMA control chart per key (Roberts 1959; the drift-sensitive
    member of the control-chart family beside the MAD outlier rule's
    point shocks and CUSUM's level shifts): each observation's
    exponentially weighted moving average is compared against widening
    control limits

        z_t = λx_t + (1−λ)z_{t−1},   UCL/LCL_t = μ₀ ± Lσ·√(λ/(2−λ)·(1−(1−λ)^{2t}))

    with μ₀/σ the retrospective (Phase-I) mean and sample standard
    deviation of the key's own series. Output: one row per input row —
    (keys…, ts, seq, value, ewma, center, ucl, lcl, breach). Keys with
    n < 2 emit NULL limits and breach = false (no σ). NULL values are
    excluded up front.

    Exactness: values quantize to DECIMAL(20,6), weights and limit
    factors are Python-literal 12-dp DECIMALs (broadcast tables — the
    SES discipline), so every z_t term is an exact decimal product and
    the per-row sum is order-independent; μ₀/σ come from exact decimal
    sums, and every double expression after them is identical in both
    engines. The weight table's 12-dp floor truncates lags that
    contribute exactly 0 under quantization — the operator is DEFINED
    as that quantized-weight chart (document-stable, engine-portable).

    Plan at 100 TB: the closed form does not factorize into bounded
    running state (the time-decay-attribution argument), so each row
    pairs with its ≤W predecessors via ONE key-partitioned self-join
    whose lag bound rides the weight-table inner join (W = O(ln 1e−12 /
    ln(1−λ)) — 124 at λ = 0.2), then one grouped sum rebuilds z_t; per
    key the work is n·W pair rows, the documented chart cost. One
    |keys|-bounded stats aggregate joins back broadcast-style."""
    from decimal import Decimal

    if n_sigma <= 0:
        raise ValueError(f"n_sigma must be > 0, got {n_sigma}")
    spark = df.sparkSession
    wrows = _ewma_weights(lam)
    frows, asym = _ewma_limit_factors(lam)
    wdp = EWMA_W_DP
    wtab = F.broadcast(spark.createDataFrame(
        [(k, Decimal(ws), Decimal(wr)) for k, ws, wr in wrows],
        f"_k int, _ws decimal(14,{wdp}), _wr decimal(14,{wdp})"))
    ftab = F.broadcast(spark.createDataFrame(
        [(t, Decimal(fs)) for t, fs in frows] or
        [(0, Decimal(asym))],      # λ = 1: empty table, asymptote only
        f"_rn int, _f decimal(14,{wdp})"))
    w_ord = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    src = (df.filter(F.col(value_col).isNotNull())
           .withColumn("_rn", F.row_number().over(w_ord).cast("int")))
    xdec = F.col(value_col).cast("double").cast(EWMA_DEC)
    right = src.select(
        *[F.col(c).alias(f"_r_{c}") for c in keys],
        F.col("_rn").alias("_sn"), xdec.alias("_x"))
    # eqNullSafe: row_number partitions treat a NULL key as a real
    # series, so the pair and stats joins must too — plain equality
    # silently dropped NULL-key rows from the chart (the
    # mann_kendall / jarque_bera convention)
    on = None
    for c in keys:
        e = F.col(c).eqNullSafe(F.col(f"_r_{c}"))
        on = e if on is None else (on & e)
    # the W lag bound rides the JOIN CONDITION (the decay-attribution
    # lesson): bounding only via the weight-table join would let the
    # pair join materialize n²/2 rows per key first
    W = wrows[-1][0]
    pairs = (src.join(right, on & (F.col("_sn") <= F.col("_rn"))
                      & (F.col("_sn") >= F.col("_rn") - F.lit(W)))
             .join(wtab, F.col("_k") == F.col("_rn") - F.col("_sn"))
             .withColumn("_w", F.when(F.col("_sn") == 1, F.col("_ws"))
                         .otherwise(F.col("_wr"))))
    z = (pairs.groupBy(*keys, "_rn", ts_col, seq_col, value_col)
         .agg(F.sum(F.col("_w") * F.col("_x")).alias("_z")))
    stats = (src.groupBy(*keys)
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum(xdec).alias("_s"),
                  F.sum(xdec * xdec).alias("_q")))
    n = F.col("_n").cast("double")
    mu = F.col("_s").cast("double") / n
    sig = F.when(F.col("_n") >= 2, F.sqrt(
        (F.col("_q").cast("double")
         - F.col("_s").cast("double") * F.col("_s").cast("double") / n)
        / (n - F.lit(1.0))))
    half = F.lit(float(n_sigma)) * sig \
        * F.coalesce(F.col("_f"), F.lit(Decimal(asym))).cast("double")
    zd = F.col("_z").cast("double")
    stats2 = stats.select(
        *[F.col(c).alias(f"_s_{c}") for c in keys], "_n", "_s", "_q")
    js = F.lit(True)
    for c in keys:
        js = js & F.col(c).eqNullSafe(F.col(f"_s_{c}"))
    return (z.join(F.broadcast(stats2), js)
            .join(ftab, on="_rn", how="left")
            .select(*keys, ts_col, seq_col,
                    F.col(value_col).alias("value"),
                    # round in DECIMAL space BEFORE the double cast:
                    # z_t is an exact decimal, and rounding its double
                    # image hits the engines' .5-boundary ROUND
                    # disagreement (the seasonal_decompose lesson —
                    # measured: 9/10000 rows off by 1 ulp at 6 dp)
                    F.round(F.col("_z"), EWMA_DP).cast("double")
                    .alias("ewma"),
                    F.round(mu, EWMA_DP).alias("center"),
                    F.round(mu + half, EWMA_DP).alias("ucl"),
                    F.round(mu - half, EWMA_DP).alias("lcl"),
                    F.coalesce((zd > mu + half) | (zd < mu - half),
                               F.lit(False)).alias("breach")))


def ewma_control_duck(inner_sql: str, keys: list[str], ts_col: str,
                      value_col: str, seq_col: str, lam: float = 0.2,
                      n_sigma: float = 3.0) -> str:
    """DuckDB mirror of :func:`ewma_control` — the same literal weight
    and limit-factor tables, the same pair join and stats forms."""
    wrows = _ewma_weights(lam)
    frows, asym = _ewma_limit_factors(lam)
    dp = EWMA_W_DP
    ks = ", ".join(keys)
    wvals = ", ".join(f"({k}, {ws}, {wr})" for k, ws, wr in wrows)
    fvals = (", ".join(f"({t}, {fs})" for t, fs in frows)
             or f"(0, {asym})")
    on = " AND ".join(
        f"s.{c} IS NOT DISTINCT FROM d.{c}" for c in keys)
    on_st = " AND ".join(
        f"z.{c} IS NOT DISTINCT FROM stats.{c}" for c in keys)
    dks = ", ".join(f"d.{c}" for c in keys)
    return f"""
WITH ew0 AS (
  SELECT *, CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)) AS x,
         CAST(ROW_NUMBER() OVER (PARTITION BY {ks}
              ORDER BY {ts_col}, {seq_col}) AS INT) AS rn
  FROM ({inner_sql}) WHERE {value_col} IS NOT NULL),
wt(k, ws, wr) AS (VALUES {wvals}),
ft(frn, f) AS (VALUES {fvals}),
z AS (
  SELECT {dks}, d.rn, d.{ts_col}, d.{seq_col},
         d.{value_col} AS value,
         SUM(CASE WHEN s.rn = 1 THEN CAST(ws AS DECIMAL(14,{dp}))
                  ELSE CAST(wr AS DECIMAL(14,{dp})) END * s.x) AS zt
  FROM ew0 d
  JOIN ew0 s ON {on} AND s.rn <= d.rn AND s.rn >= d.rn - {wrows[-1][0]}
  JOIN wt ON wt.k = d.rn - s.rn
  GROUP BY {dks}, d.rn, d.{ts_col}, d.{seq_col}, d.{value_col}),
stats AS (
  SELECT {ks}, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS q
  FROM ew0 GROUP BY {ks}),
lim AS (
  SELECT z.*,
         CAST(s AS DOUBLE) / n AS mu,
         CASE WHEN n >= 2 THEN SQRT(
           (CAST(q AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
           / (CAST(n AS DOUBLE) - 1.0)) END
           * {n_sigma!r} * CAST(COALESCE(f, {asym}) AS DOUBLE) AS half
  FROM z
  JOIN stats ON {on_st}
  LEFT JOIN ft ON ft.frn = z.rn)
SELECT {ks}, {ts_col}, {seq_col}, value,
       CAST(ROUND(zt, {EWMA_DP}) AS DOUBLE) AS ewma,
       ROUND(mu, {EWMA_DP}) AS center,
       ROUND(mu + half, {EWMA_DP}) AS ucl,
       ROUND(mu - half, {EWMA_DP}) AS lcl,
       COALESCE(CAST(zt AS DOUBLE) > mu + half
                OR CAST(zt AS DOUBLE) < mu - half, FALSE) AS breach
FROM lim
"""


# ------------------------------------------ Page-Hinkley drift test

PH_TERM_DP = 9
PH_DP = 6


def page_hinkley_scores(df: DataFrame, keys: list[str], ts_col: str,
                        value_col: str, delta: float,
                        seq_col: str | None = None) -> DataFrame:
    """Two-sided Page–Hinkley drift statistics per key (Page 1954 §5,
    Hinkley 1971; the MEAN-DRIFT member of the change family — CUSUM
    tests deviation from a KNOWN target, PH tests deviation from the
    series' OWN running mean, so no target parameter):

        m_t = Σ_{i≤t} (x_i − x̄_i − δ),   x̄_i = (1/i) Σ_{j≤i} x_j
        PH_t = m_t − min_{s≤t} m_s        (upward; mirrored for down)

    fully declarative: one exact-decimal prefix sum gives every x̄_i,
    the quantized terms prefix-sum again, and the running min closes
    the statistic — four window layers on ONE (key, ts)-ordered
    exchange, the CUSUM shape.

    Exactness: x quantizes to DECIMAL(20,6); the prefix sum is exact
    and crosses to double via the floor-split cast
    (``util.dec_to_double`` — engine-identical at any magnitude); each
    term x − x̄ − δ rounds at ``PH_TERM_DP`` dp into DECIMAL before the
    second prefix sum (order-independent). Portable while
    |x − x̄ − δ| ≲ 1e6 (the 9-dp grid vs double-ulp bound measured in
    round 14) — rescale larger-valued series first.

    Returns the input rows plus (ph_hi, ph_lo) rounded to 6 dp."""
    from flink_rag_spark.operators.util import dec_to_double

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_row = Window.partitionBy(*keys).orderBy(*order)
    xdec = F.col(value_col).cast("double").cast("decimal(20,6)")
    tdec = f"decimal(24,{PH_TERM_DP})"
    out = (df.withColumn("_ph_s", F.sum(xdec).over(w))
           .withColumn("_ph_i", F.row_number().over(w_row)))
    xbar = dec_to_double(F.col("_ph_s")) / F.col("_ph_i").cast("double")
    xd = xdec.cast("double")
    for name, term in (("hi", xd - xbar - F.lit(float(delta))),
                       ("lo", xbar - xd - F.lit(float(delta)))):
        out = out.withColumn(
            f"_ph_t_{name}",
            F.round(term, PH_TERM_DP).cast(tdec))
        out = out.withColumn(f"_ph_m_{name}",
                             F.sum(f"_ph_t_{name}").over(w))
        out = out.withColumn(
            f"ph_{name}",
            F.round((F.col(f"_ph_m_{name}")
                     - F.min(f"_ph_m_{name}").over(w)).cast("double"),
                    PH_DP))
    return out.drop("_ph_s", "_ph_i", "_ph_t_hi", "_ph_t_lo",
                    "_ph_m_hi", "_ph_m_lo")


def page_hinkley_alarms(df: DataFrame, keys: list[str], ts_col: str,
                        value_col: str, delta: float, lam: float,
                        seq_col: str | None = None) -> DataFrame:
    """Per-key Page–Hinkley drift summary over
    :func:`page_hinkley_scores` — the :func:`cusum_first_alarms`
    contract on the target-free statistic: (keys..., first_hi_ts,
    first_lo_ts, max_ph_hi, max_ph_lo, n_alarms), alarm = PH > λ.
    One aggregate over the scored frame."""
    scored = page_hinkley_scores(df, keys, ts_col, value_col, delta,
                                 seq_col)
    hi = F.col("ph_hi") > lam
    lo = F.col("ph_lo") > lam
    return (scored.groupBy(*keys).agg(
        F.min(F.when(hi, F.col(ts_col))).alias("first_hi_ts"),
        F.min(F.when(lo, F.col(ts_col))).alias("first_lo_ts"),
        F.max("ph_hi").alias("max_ph_hi"),
        F.max("ph_lo").alias("max_ph_lo"),
        F.sum(F.when(hi | lo, 1).otherwise(0)).cast("bigint")
        .alias("n_alarms")))


def page_hinkley_alarms_duck(inner_sql: str, keys: list[str],
                             ts_col: str, value_col: str, delta: float,
                             lam: float,
                             seq_col: str | None = None) -> str:
    """DuckDB mirror of :func:`page_hinkley_alarms` — the same
    quantized terms over the same floor-split running mean."""
    from flink_rag_spark.operators.util import dec_to_double_duck

    ks = ", ".join(keys)
    order = f"{ts_col}" + (f", {seq_col}" if seq_col else "")
    over = (f"OVER (PARTITION BY {ks} ORDER BY {order} "
            "ROWS UNBOUNDED PRECEDING)")
    s_d = dec_to_double_duck("ph_s")
    dp = PH_TERM_DP
    return f"""
WITH ph_src AS (SELECT * FROM ({inner_sql})),
ph_b AS (
  SELECT *,
         CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)) AS ph_x,
         SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))
           {over} AS ph_s,
         ROW_NUMBER() {over.replace(' ROWS UNBOUNDED PRECEDING', '')}
           AS ph_i
  FROM ph_src),
ph_t AS (
  SELECT *,
         CAST(ROUND(CAST(ph_x AS DOUBLE)
                    - {s_d} / CAST(ph_i AS DOUBLE)
                    - {delta!r}, {dp}) AS DECIMAL(24,{dp})) AS t_hi,
         CAST(ROUND({s_d} / CAST(ph_i AS DOUBLE)
                    - CAST(ph_x AS DOUBLE)
                    - {delta!r}, {dp}) AS DECIMAL(24,{dp})) AS t_lo
  FROM ph_b),
ph_m AS (
  SELECT *, SUM(t_hi) {over} AS m_hi, SUM(t_lo) {over} AS m_lo
  FROM ph_t),
ph_st AS (
  SELECT *,
         ROUND(CAST(m_hi - MIN(m_hi) {over} AS DOUBLE), {PH_DP})
           AS ph_hi,
         ROUND(CAST(m_lo - MIN(m_lo) {over} AS DOUBLE), {PH_DP})
           AS ph_lo
  FROM ph_m)
SELECT {ks},
       MIN(CASE WHEN ph_hi > {lam!r} THEN {ts_col} END) AS first_hi_ts,
       MIN(CASE WHEN ph_lo > {lam!r} THEN {ts_col} END) AS first_lo_ts,
       MAX(ph_hi) AS max_ph_hi,
       MAX(ph_lo) AS max_ph_lo,
       CAST(SUM(CASE WHEN ph_hi > {lam!r} OR ph_lo > {lam!r}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
FROM ph_st GROUP BY {ks}
"""
