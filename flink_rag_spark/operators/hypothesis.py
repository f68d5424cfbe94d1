"""Two-sample hypothesis testing — Kolmogorov–Smirnov over distributed ECDFs.

Distribution drift between two corpus slices (old vs new crawl, source A
vs source B, train vs eval) is the question behind every re-curation
decision; PSI (`operators/drift.py`) answers it with fixed bins, the KS
statistic answers it bin-free: D = sup |F_a(x) − F_b(x)| over the
empirical CDFs. The reference has no statistics surface (`AiJob.java`);
this is the classic sort-based test re-expressed so the sort never
happens on one node.

Plan at 100 TB: the raw rows collapse to one row per DISTINCT value
first (partial+final agg — the only full-data shuffle), then the ECDF
is a *distributed prefix sum*: range-repartition the distinct values,
cumsum inside each range partition (sort is per-partition), and add
per-partition offsets computed from a tiny |partitions|-row frame. No
global single-task window, no collect of data rows; the final D is one
aggregate. The distinct-value frame is persisted (MEMORY_AND_DISK)
because range partition ids must stay stable across its two consumers
(offsets + cumsum) — it is the smallest frame in the plan.

Determinism: cumulative counts are exact integers whatever the
partitioning, and every double op after them is the same IEEE
expression in both engines, so D is bit-stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel

from flink_rag_spark.operators.util import (
    dec_to_double,
    dec_to_double_duck,
    track_cached_deps,
)

#: KS critical-value coefficient at alpha = 0.05: sqrt(-ln(alpha/2)/2)
KS_ALPHA = 0.05
KS_DP = 6


def ks_two_sample(a: DataFrame, b: DataFrame, value_col: str,
                  n_partitions: int | None = None) -> DataFrame:
    """Two-sample KS test of ``value_col`` in ``a`` vs ``b``.

    Returns ONE row: (ks_d, n_a, n_b, crit_value, reject) where
    ``crit_value`` is the large-sample alpha=0.05 threshold
    c(α)·sqrt((n_a+n_b)/(n_a·n_b)) and ``reject`` compares the
    UNROUNDED statistic against it. NULL values are excluded from both
    samples.

    When both samples are slices of ONE source, use
    :func:`ks_two_sample_split` instead — this union shape scans each
    input separately."""
    tagged = (
        a.select(F.col(value_col).cast("double").alias("v"),
                 F.lit(1).alias("wa"), F.lit(0).alias("wb"))
        .unionAll(
            b.select(F.col(value_col).cast("double").alias("v"),
                     F.lit(0).alias("wa"), F.lit(1).alias("wb"))))
    return _ks_from_tagged(tagged, n_partitions)


def ks_two_sample_split(df: DataFrame, value_col: str, a_pred, b_pred,
                        n_partitions: int | None = None) -> DataFrame:
    """KS test between two predicate-defined slices of ONE frame — the
    single-scan form (rows matching neither predicate are dropped at the
    scan; a row matching both would be counted in both samples, so make
    the predicates disjoint). Same result contract as
    :func:`ks_two_sample`."""
    tagged = (df.select(
        F.col(value_col).cast("double").alias("v"),
        a_pred.cast("int").alias("wa"),
        b_pred.cast("int").alias("wb"))
        .filter((F.col("wa") + F.col("wb")) > 0))
    return _ks_from_tagged(tagged, n_partitions)


def _ks_from_tagged(tagged: DataFrame,
                    n_partitions: int | None = None) -> DataFrame:
    """Distributed-ECDF KS statistic over (v, wa, wb) tagged rows."""
    spark = tagged.sparkSession
    nparts = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    per_v = (tagged.filter(F.col("v").isNotNull())
             .groupBy("v").agg(
                 F.sum("wa").alias("na"), F.sum("wb").alias("nb")))
    # pid must be identical for both consumers below: repartitionByRange
    # samples boundaries nondeterministically, so pin the frame
    part = (per_v.repartitionByRange(nparts, "v")
            .withColumn("pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))
    # |partitions|-row frame: exclusive prefix offsets + grand totals
    # (range partition i holds strictly smaller values than i+1, so
    # ordering by pid IS ordering by value)
    w_pid = Window.orderBy("pid")
    offs = (part.groupBy("pid")
            .agg(F.sum("na").alias("pa"), F.sum("nb").alias("pb"))
            .select(
                "pid",
                F.coalesce(F.sum("pa").over(
                    w_pid.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0)).alias("off_a"),
                F.coalesce(F.sum("pb").over(
                    w_pid.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0)).alias("off_b"),
                F.sum("pa").over(w_pid.rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing)).alias("n_a"),
                F.sum("pb").over(w_pid.rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing)).alias("n_b")))
    w_local = (Window.partitionBy("pid").orderBy("v")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdf = (part
           .withColumn("ca", F.sum("na").over(w_local))
           .withColumn("cb", F.sum("nb").over(w_local))
           .join(F.broadcast(offs), "pid")
           .select(
               ((F.col("ca") + F.col("off_a")).cast("double")
                / F.col("n_a").cast("double")).alias("fa"),
               ((F.col("cb") + F.col("off_b")).cast("double")
                / F.col("n_b").cast("double")).alias("fb"),
               "n_a", "n_b"))
    nad = F.max("n_a").cast("double")
    nbd = F.max("n_b").cast("double")
    d = F.max(F.abs(F.col("fa") - F.col("fb")))
    crit = (F.sqrt(F.lit(-1.0) * F.log(F.lit(KS_ALPHA / 2.0)) / F.lit(2.0))
            * F.sqrt((nad + nbd) / (nad * nbd)))
    return track_cached_deps(cdf.agg(
        F.round(d, KS_DP).alias("ks_d"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(crit, KS_DP).alias("crit_value"),
        (d > crit).alias("reject")), [part])


def ks_two_sample_duck(a_sql: str, b_sql: str, value_col: str) -> str:
    """DuckDB mirror of :func:`ks_two_sample` — one global ECDF window
    (the single-node equivalent of the distributed prefix sum), the same
    exact-count / double arithmetic, the same alpha."""
    return f"""
WITH tagged AS (
  SELECT CAST({value_col} AS DOUBLE) AS v, 1 AS wa, 0 AS wb FROM ({a_sql})
  UNION ALL
  SELECT CAST({value_col} AS DOUBLE) AS v, 0 AS wa, 1 AS wb FROM ({b_sql})),
per_v AS (
  SELECT v, SUM(wa) AS na, SUM(wb) AS nb
  FROM tagged WHERE v IS NOT NULL GROUP BY v),
cdf AS (
  SELECT
    CAST(SUM(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS DOUBLE)
      / CAST((SELECT SUM(na) FROM per_v) AS DOUBLE) AS fa,
    CAST(SUM(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS DOUBLE)
      / CAST((SELECT SUM(nb) FROM per_v) AS DOUBLE) AS fb,
    CAST((SELECT SUM(na) FROM per_v) AS BIGINT) AS n_a,
    CAST((SELECT SUM(nb) FROM per_v) AS BIGINT) AS n_b
  FROM per_v)
SELECT ROUND(MAX(ABS(fa - fb)), {KS_DP}) AS ks_d,
       MAX(n_a) AS n_a, MAX(n_b) AS n_b,
       ROUND(SQRT(-1.0 * LN({KS_ALPHA / 2.0}) / 2.0)
             * SQRT((CAST(MAX(n_a) AS DOUBLE) + CAST(MAX(n_b) AS DOUBLE))
                    / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE))),
             {KS_DP}) AS crit_value,
       MAX(ABS(fa - fb)) >
         SQRT(-1.0 * LN({KS_ALPHA / 2.0}) / 2.0)
         * SQRT((CAST(MAX(n_a) AS DOUBLE) + CAST(MAX(n_b) AS DOUBLE))
                / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE)))
         AS reject
FROM cdf
"""


# ------------------------------------------ two-proportion z-test (A/B)

Z_CRIT = 1.959963984540054  # two-sided 5% critical value, Φ⁻¹(0.975)
AB_DP = 6


def ab_proportion_test(df: DataFrame, group_col: str, success_col: str,
                       group_a, group_b,
                       z_crit: float = Z_CRIT) -> DataFrame:
    """Two-proportion z-test — the A/B-experiment readout (conversion
    rate A vs B) beside the KS test's distribution comparison: pooled
    standard error, z statistic, and the two-sided 5% verdict.

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled

    ``success_col`` is a boolean column (NULL = not a success).
    Output: ONE row — (n_a, n_b, conv_a, conv_b, rate_a, rate_b, lift,
    z, significant). The p-value is deliberately a threshold verdict,
    not a number: neither engine ships erf, and a hand-rolled normal
    CDF would be the kind of per-engine float divergence this repo
    bans — the z statistic itself is exact shared arithmetic and any
    α's critical value can be passed in.

    Plan at 100 TB: ONE conditional-count aggregate over the scan (the
    validate() discipline) — no join, no shuffle beyond the single
    final-aggregation exchange."""
    g = F.col(group_col)
    s = F.coalesce(F.col(success_col).cast("boolean"), F.lit(False))
    one = df.filter(g.isin([group_a, group_b])).agg(
        F.count(F.when(g == group_a, 1)).alias("n_a"),
        F.count(F.when(g == group_b, 1)).alias("n_b"),
        F.count(F.when((g == group_a) & s, 1)).alias("conv_a"),
        F.count(F.when((g == group_b) & s, 1)).alias("conv_b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pa = F.col("conv_a") / na
    pb = F.col("conv_b") / nb
    pool = (F.col("conv_a") + F.col("conv_b")) / (na + nb)
    se = F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    # zero pooled variance (nobody or everybody converted) has no z —
    # NULL statistic, not-significant verdict (the corr_matrix
    # zero-variance contract; ANSI mode would otherwise divide by zero)
    z = F.when(se > 0, (pa - pb) / se)
    return one.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.round(pa, AB_DP).alias("rate_a"),
        F.round(pb, AB_DP).alias("rate_b"),
        F.round(pa - pb, AB_DP).alias("lift"),
        F.round(z, AB_DP).alias("z"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant"))


def ab_proportion_test_duck(inner_sql: str, group_col: str,
                            success_expr: str, group_a, group_b,
                            z_crit: float = Z_CRIT) -> str:
    """DuckDB mirror of :func:`ab_proportion_test`. ``success_expr`` is
    the boolean SQL expression; group literals render through a proper
    SQL quoter (repr() is NOT one: a string containing a single quote
    would produce broken SQL, and bool/Decimal reprs aren't SQL)."""
    from flink_rag_spark.operators.util import sql_str_lit as _lit
    ga, gb = _lit(group_a), _lit(group_b)
    return f"""
WITH src AS (
  SELECT {group_col} AS g,
         COALESCE(CAST({success_expr} AS BOOLEAN), FALSE) AS s
  FROM ({inner_sql}) WHERE {group_col} IN ({ga}, {gb})),
agg AS (
  SELECT COUNT(CASE WHEN g = {ga} THEN 1 END) AS n_a,
         COUNT(CASE WHEN g = {gb} THEN 1 END) AS n_b,
         COUNT(CASE WHEN g = {ga} AND s THEN 1 END) AS conv_a,
         COUNT(CASE WHEN g = {gb} AND s THEN 1 END) AS conv_b
  FROM src),
se AS (
  SELECT *, SQRT(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                 * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                 * (1.0 / n_a + 1.0 / n_b)) AS s
  FROM agg)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
       ROUND(conv_a / CAST(n_a AS DOUBLE), {AB_DP}) AS rate_a,
       ROUND(conv_b / CAST(n_b AS DOUBLE), {AB_DP}) AS rate_b,
       ROUND(conv_a / CAST(n_a AS DOUBLE)
             - conv_b / CAST(n_b AS DOUBLE), {AB_DP}) AS lift,
       ROUND(CASE WHEN s > 0 THEN
               (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
               / s END, {AB_DP}) AS z,
       COALESCE(ABS(CASE WHEN s > 0 THEN
           (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
           / s END) > {z_crit}, FALSE) AS significant
FROM se
"""


# --------------------------------------------- two-cohort log-rank test

LOGRANK_TERM_DP = 9
LOGRANK_DP = 6


def logrank_test(subjects: DataFrame, duration_col: str, event_col: str,
                 group_col: str, group_a, group_b,
                 z_crit: float = Z_CRIT) -> DataFrame:
    """Two-cohort log-rank test (Mantel 1966, "Evaluation of survival
    data…") — "are these two survival curves the same?", the hypothesis
    complement of :func:`~flink_rag_spark.operators.survival.km_survival`
    (KM draws each cohort's curve; this tests the difference). Input is
    the KM subject frame plus a cohort column: at each distinct time t
    with d_t events among n_t at-risk subjects (n_at of them in cohort
    A, d_at of A's),

        O_A = Σ d_at                        (observed A events)
        E_A = Σ d_t · n_at / n_t            (expected under H0)
        V   = Σ d_t (n_at/n_t)(1 − n_at/n_t)(n_t − d_t)/(n_t − 1)

    and z = (O_A − E_A)/√V (χ² = z², 1 df). Like the z/KS tests the
    p-value is a threshold VERDICT at ``z_crit`` — neither engine ships
    erf, and the statistic itself is exact shared arithmetic.

    Exactness: every count is an exact integer; the E and V terms are
    double quotients of integers quantized to 9-dp DECIMAL before
    summing (the link-prediction discipline — a double Σ is
    order-dependent; an integer-ratio term is never boundary-exact at
    9 dp because the boundary value k.5e-9 is non-dyadic), so the sums
    are bit-stable under any partitioning and the oracle replays them.
    NULL durations/event flags are excluded (the KM contract); V = 0
    (no comparable event times) yields a NULL z and a False verdict
    (the z-test's zero-variance contract). Risk-set terms at n_t = 1
    are 0 by the (n_t − d_t)/(n_t − 1) guard.

    Output: ONE row — (n_a, n_b, o_a, e_a, v, z, chi2, significant).

    Scale shape: one (t)-grouped aggregate over the subject scan, one
    ordered window pass over the |distinct durations|-bounded step
    frame (single-partition by construction — the step frame is tiny,
    the subject scan is not), one final aggregate."""
    g = F.col(group_col)
    ev = F.col(event_col).cast("int")
    src = subjects.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
        & g.isin([group_a, group_b]))
    agg = (src.groupBy(F.col(duration_col).alias("t"))
           .agg(F.sum(F.when(g == group_a, ev).otherwise(0)).alias("da"),
                F.sum(F.when(g == group_b, ev).otherwise(0)).alias("db"),
                F.count(F.when(g == group_a, 1)).alias("sa"),
                F.count(F.when(g == group_b, 1)).alias("sb")))
    w_rev = (Window.orderBy("t")
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    risk = (agg.withColumn("na", F.sum("sa").over(w_rev))
            .withColumn("nb", F.sum("sb").over(w_rev))
            .filter(F.col("da") + F.col("db") > 0))
    n = (F.col("na") + F.col("nb")).cast("double")
    d = (F.col("da") + F.col("db")).cast("double")
    p = F.col("na").cast("double") / n
    dec = f"decimal(28,{LOGRANK_TERM_DP})"
    e_term = F.round(d * p, LOGRANK_TERM_DP).cast(dec)
    v_term = F.when(
        F.col("na") + F.col("nb") > 1,
        F.round(d * p * (F.lit(1.0) - p) * (n - d) / (n - F.lit(1.0)),
                LOGRANK_TERM_DP)).otherwise(F.lit(0.0)).cast(dec)
    tot = risk.agg(
        F.sum("da").cast("bigint").alias("o_a"),
        F.sum(e_term).alias("_e"),
        F.sum(v_term).alias("_v"))
    counts = src.agg(
        F.count(F.when(g == group_a, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(g == group_b, 1)).cast("bigint").alias("n_b"))
    ed = F.col("_e").cast("double")
    vd = F.col("_v").cast("double")
    z = F.when(vd > 0, (F.col("o_a").cast("double") - ed) / F.sqrt(vd))
    # e_a/v round IN DECIMAL SPACE (the decimal-boundary discipline — a
    # 9-dp decimal sum CAN land exactly on the 6-dp boundary, where the
    # engines' double rounding disagrees); z/chi2 are never
    # boundary-exact (irrational sqrt in the denominator)
    return (counts.crossJoin(tot)  # 1 row × 1 row
            .select("n_a", "n_b", "o_a",
                    F.round(F.col("_e"), LOGRANK_DP).cast("double")
                    .alias("e_a"),
                    F.round(F.col("_v"), LOGRANK_DP).cast("double")
                    .alias("v"),
                    F.round(z, LOGRANK_DP).alias("z"),
                    F.round(z * z, LOGRANK_DP).alias("chi2"),
                    F.coalesce(F.abs(z) > z_crit, F.lit(False))
                    .alias("significant")))


def logrank_test_duck(subjects_sql: str, duration_col: str,
                      event_col: str, group_col: str, group_a, group_b,
                      z_crit: float = Z_CRIT) -> str:
    """DuckDB mirror of :func:`logrank_test` — same aggregate, same
    reverse-cumulative risk windows, same 9-dp DECIMAL term
    quantization and final rounds."""
    from flink_rag_spark.operators.util import sql_str_lit as _lit
    ga, gb = _lit(group_a), _lit(group_b)
    dp, odp = LOGRANK_TERM_DP, LOGRANK_DP
    return f"""
WITH lr_subj0 AS ({subjects_sql}),
src AS (
  SELECT {duration_col} AS t, {group_col} AS g,
         CAST({event_col} AS INT) AS ev
  FROM lr_subj0
  WHERE {duration_col} IS NOT NULL AND {event_col} IS NOT NULL
    AND {group_col} IN ({ga}, {gb})),
agg AS (
  SELECT t,
         SUM(CASE WHEN g = {ga} THEN ev ELSE 0 END) AS da,
         SUM(CASE WHEN g = {gb} THEN ev ELSE 0 END) AS db,
         COUNT(CASE WHEN g = {ga} THEN 1 END) AS sa,
         COUNT(CASE WHEN g = {gb} THEN 1 END) AS sb
  FROM src GROUP BY t),
risk AS (
  SELECT *, SUM(sa) OVER rev AS na, SUM(sb) OVER rev AS nb
  FROM agg
  WINDOW rev AS (ORDER BY t
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
terms AS (
  SELECT da,
         CAST(ROUND(CAST(da + db AS DOUBLE)
                    * (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE)),
                    {dp}) AS DECIMAL(28,{dp})) AS e_term,
         CAST(CASE WHEN na + nb > 1 THEN
            ROUND(CAST(da + db AS DOUBLE)
                  * (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE))
                  * (1.0 - CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE))
                  * (CAST(na + nb AS DOUBLE) - CAST(da + db AS DOUBLE))
                  / (CAST(na + nb AS DOUBLE) - 1.0), {dp})
            ELSE 0.0 END AS DECIMAL(28,{dp})) AS v_term
  FROM risk WHERE da + db > 0),
tot AS (
  SELECT CAST(SUM(da) AS BIGINT) AS o_a,
         CAST(ROUND(SUM(e_term), {odp}) AS DOUBLE) AS e_r,
         CAST(ROUND(SUM(v_term), {odp}) AS DOUBLE) AS v_r,
         CAST(SUM(e_term) AS DOUBLE) AS e,
         CAST(SUM(v_term) AS DOUBLE) AS v
  FROM terms),
cnt AS (
  SELECT CAST(COUNT(CASE WHEN g = {ga} THEN 1 END) AS BIGINT) AS n_a,
         CAST(COUNT(CASE WHEN g = {gb} THEN 1 END) AS BIGINT) AS n_b
  FROM src),
zz AS (
  SELECT *, CASE WHEN v > 0 THEN (o_a - e) / SQRT(v) END AS z0
  FROM cnt, tot)
SELECT n_a, n_b, o_a,
       e_r AS e_a,
       v_r AS v,
       ROUND(z0, {odp}) AS z,
       ROUND(z0 * z0, {odp}) AS chi2,
       COALESCE(ABS(z0) > {z_crit}, FALSE) AS significant
FROM zz
"""

# --------------------------------- chi-square test of independence

CHI2_TERM_DP = 9
CHI2_DP = 6


def chi2_independence(df: DataFrame, row_col: str, col_col: str,
                      chi2_crit: float) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — "does segment depend on region?", the whole-table
    complement of the per-cell PMI association grid
    (``operators/association.py`` scores each cell; this tests the
    table):

        chi2 = Σ_rc (O_rc − E_rc)² / E_rc,   E_rc = rt_r · ct_c / n

    over the FULL r × c grid — unobserved combinations contribute their
    whole expectation (O = 0 ⇒ term = E), which a naive groupBy of
    observed pairs silently drops. ``chi2_crit`` is the caller's
    critical value at their α and the table's dof (neither engine ships
    an inverse-chi2 — the z-test threshold-verdict discipline); the
    verdict compares the UNROUNDED decimal sum against it.

    Exactness: O, rt, ct, n are exact integers; E and each term are
    integer-ratio doubles quantized to ``CHI2_TERM_DP``-dp DECIMAL
    before summing (the log-rank discipline — order-independent sums,
    never boundary-exact because the quotients are non-dyadic), final
    rounds in decimal space.

    NULL categories are excluded (a NULL is a missing label, not a
    level). Output ONE row: (n, n_rows, n_cols, dof, chi2,
    significant).

    Plan at 100 TB: one (r, c)-grouped count over the scan — the only
    full-data exchange — then everything runs on the |R|·|C|-bounded
    grid (two tiny aggregates of it, one broadcast cross join, one
    final aggregate; the log-rank step-frame discipline)."""
    r, c = F.col(row_col), F.col(col_col)
    obs = (df.filter(r.isNotNull() & c.isNotNull())
           .groupBy(r.alias("r"), c.alias("cc"))
           .agg(F.count(F.lit(1)).alias("o")))
    rows = obs.groupBy("r").agg(F.sum("o").alias("rt"))
    cols = obs.groupBy("cc").agg(F.sum("o").alias("ct"))
    # full grid: |R| × |C| rows, both sides tiny — broadcast cross join;
    # n = Σ o over the grid (each observed cell appears exactly once)
    grid = (rows.crossJoin(F.broadcast(cols))
            .join(obs, ["r", "cc"], "left")
            .withColumn("o", F.coalesce(F.col("o"), F.lit(0))))
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    g = grid.withColumn("n", F.sum("o").over(w_all))
    od = F.col("o").cast("double")
    # rt·ct in DOUBLE (matching the mirror's expression tree exactly):
    # a BIGINT product would overflow at rt·ct > 2^63 long before the
    # double loses the determinism that matters here
    e = (F.col("rt").cast("double") * F.col("ct").cast("double")
         / F.col("n").cast("double"))
    dec = f"decimal(28,{CHI2_TERM_DP})"
    term = F.round((od - e) * (od - e) / e, CHI2_TERM_DP).cast(dec)
    out = g.agg(
        F.max("n").cast("bigint").alias("n"),
        F.countDistinct("r").cast("bigint").alias("n_rows"),
        F.countDistinct("cc").cast("bigint").alias("n_cols"),
        F.sum(term).alias("_chi2"))
    dof = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    return out.select(
        "n", "n_rows", "n_cols", dof.cast("bigint").alias("dof"),
        F.round(F.col("_chi2"), CHI2_DP).cast("double").alias("chi2"),
        (F.col("_chi2") > F.lit(chi2_crit)).alias("significant"))


def chi2_independence_duck(inner_sql: str, row_col: str, col_col: str,
                           chi2_crit: float) -> str:
    """DuckDB mirror of :func:`chi2_independence` — same full-grid
    construction, same 9-dp DECIMAL term quantization, same final
    decimal-space rounds."""
    dp, odp = CHI2_TERM_DP, CHI2_DP
    return f"""
WITH c2_src AS (
  SELECT {row_col} AS r, {col_col} AS cc FROM ({inner_sql})
  WHERE {row_col} IS NOT NULL AND {col_col} IS NOT NULL),
obs AS (SELECT r, cc, COUNT(*) AS o FROM c2_src GROUP BY r, cc),
rt AS (SELECT r, SUM(o) AS rt FROM obs GROUP BY r),
ct AS (SELECT cc, SUM(o) AS ct FROM obs GROUP BY cc),
grid AS (
  SELECT rt.r, ct.cc, rt.rt, ct.ct, COALESCE(obs.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.r = rt.r AND obs.cc = ct.cc),
tot AS (SELECT SUM(o) AS n FROM grid),
terms AS (
  SELECT g.r, g.cc, g.o, g.rt, g.ct, t.n,
         CAST(ROUND(
           (CAST(g.o AS DOUBLE)
            - CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE)
              / CAST(t.n AS DOUBLE))
           * (CAST(g.o AS DOUBLE)
              - CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE)
                / CAST(t.n AS DOUBLE))
           / (CAST(g.rt AS DOUBLE) * CAST(g.ct AS DOUBLE)
              / CAST(t.n AS DOUBLE)),
           {dp}) AS DECIMAL(28,{dp})) AS term
  FROM grid g, tot t)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT cc) AS BIGINT) AS n_cols,
       CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT cc) - 1)
            AS BIGINT) AS dof,
       CAST(ROUND(SUM(term), {odp}) AS DOUBLE) AS chi2,
       SUM(term) > {chi2_crit} AS significant
FROM terms
"""


# ------------------------------------ Mann-Whitney U test (rank-sum)

MWU_DP = 6


def mann_whitney_u(a: DataFrame, b: DataFrame, value_col: str,
                   z_crit: float = Z_CRIT,
                   n_partitions: int | None = None) -> DataFrame:
    """Two-sample Mann–Whitney U test (Mann & Whitney 1947) — "is one
    sample stochastically larger?", the location complement of the KS
    test's shape comparison (KS rejects on ANY distribution difference;
    MWU targets shift). Normal approximation with tie correction:

        U_A = Σ_a Σ_b [a > b] + ½ [a = b]
        μ = n_a n_b / 2
        σ² = (n_a n_b / 12) · ((n+1) − Σ(t³−t) / (n(n−1)))

    The p-value stays a threshold verdict at ``z_crit`` (no erf — the
    z-test discipline); the normal approximation is the standard large-
    sample form, which is the only regime this engine targets anyway.

    Exactness: U computes as the exact INTEGER 2U = Σ_v n_a(v)·(2·C_b(v)
    + n_b(v)) over distinct values v with C_b the exclusive below-count
    — no per-row ranks, no average-rank doubles. The tie term Σ(t³−t)
    sums exactly in DECIMAL(38,0) (a BIGINT cube overflows at t > 2·10⁶
    ties). Every downstream double op is the same IEEE expression in
    both engines. σ² = 0 (all values tied) yields NULL z and a False
    verdict (the zero-variance contract).

    NULL values are excluded from both samples. Output ONE row:
    (n_a, n_b, u_a, mu_u, sigma_u, z, significant).

    Plan at 100 TB: the raw rows collapse to one row per DISTINCT value
    (the only full-data shuffle), then the below-counts are the KS
    distributed prefix sum — range-repartition, per-partition cumsum,
    broadcast per-partition offsets; one final aggregate. No global
    single-task sort, no collect."""
    tagged = (
        a.select(F.col(value_col).alias("v"),
                 F.lit(1).alias("wa"), F.lit(0).alias("wb"))
        .unionAll(
            b.select(F.col(value_col).alias("v"),
                     F.lit(0).alias("wa"), F.lit(1).alias("wb"))))
    spark = tagged.sparkSession
    nparts = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    per_v = (tagged.filter(F.col("v").isNotNull())
             .groupBy("v").agg(
                 F.sum("wa").alias("na"), F.sum("wb").alias("nb")))
    part = (per_v.repartitionByRange(nparts, "v")
            .withColumn("pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))
    w_pid = Window.orderBy("pid")
    offs = (part.groupBy("pid")
            .agg(F.sum("nb").alias("pb"))
            .select("pid",
                    F.coalesce(F.sum("pb").over(
                        w_pid.rowsBetween(Window.unboundedPreceding, -1)),
                        F.lit(0)).alias("off_b")))
    w_local = (Window.partitionBy("pid").orderBy("v")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # exclusive below-count of B at v: inclusive cumsum − own count
    cb = (part
          .join(F.broadcast(offs), "pid")
          .withColumn("cb", F.sum("nb").over(w_local) + F.col("off_b")
                      - F.col("nb")))
    d12 = "decimal(12,0)"
    t = (F.col("na") + F.col("nb")).cast(d12)
    u2_term = (F.col("na").cast(d12)
               * (F.lit(2) * F.col("cb") + F.col("nb")).cast("decimal(20,0)"))
    tie_term = t * t * t - t.cast("decimal(38,0)")
    agg = cb.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
        F.sum(u2_term).alias("_u2"),
        F.sum(tie_term).alias("_ties"))
    nad, nbd = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    nd = nad + nbd
    ua = F.col("_u2").cast("double") / F.lit(2.0)
    mu = nad * nbd / F.lit(2.0)
    sig2 = F.when(
        nd > 1,
        nad * nbd / F.lit(12.0)
        * ((nd + F.lit(1.0))
           - F.col("_ties").cast("double") / (nd * (nd - F.lit(1.0)))))
    z = F.when(sig2 > 0, (ua - mu) / F.sqrt(sig2))
    return track_cached_deps(agg.select(
        "n_a", "n_b",
        ua.alias("u_a"),
        mu.alias("mu_u"),
        F.round(F.when(sig2 > 0, F.sqrt(sig2)), MWU_DP).alias("sigma_u"),
        F.round(z, MWU_DP).alias("z"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant")),
        [part])


def mann_whitney_u_duck(a_sql: str, b_sql: str, value_col: str,
                        z_crit: float = Z_CRIT) -> str:
    """DuckDB mirror of :func:`mann_whitney_u` — one global exclusive-
    prefix window (the single-node equivalent of the distributed prefix
    sum), the same exact-integer 2U and DECIMAL tie sum."""
    dp = MWU_DP
    return f"""
WITH mwu_tagged AS (
  SELECT {value_col} AS v, 1 AS wa, 0 AS wb FROM ({a_sql})
  UNION ALL
  SELECT {value_col} AS v, 0 AS wa, 1 AS wb FROM ({b_sql})),
per_v AS (
  SELECT v, SUM(wa) AS na, SUM(wb) AS nb
  FROM mwu_tagged WHERE v IS NOT NULL GROUP BY v),
cum AS (
  SELECT na, nb,
         COALESCE(SUM(nb) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cb
  FROM per_v),
agg AS (
  SELECT CAST(SUM(na) AS BIGINT) AS n_a,
         CAST(SUM(nb) AS BIGINT) AS n_b,
         SUM(CAST(na AS DECIMAL(12,0))
             * CAST(2 * cb + nb AS DECIMAL(20,0))) AS u2,
         SUM(CAST(na + nb AS DECIMAL(12,0))
             * CAST(na + nb AS DECIMAL(12,0))
             * CAST(na + nb AS DECIMAL(12,0))
             - CAST(na + nb AS DECIMAL(38,0))) AS ties
  FROM cum),
stat AS (
  SELECT n_a, n_b,
         CAST(u2 AS DOUBLE) / 2.0 AS u_a,
         CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0 AS mu_u,
         CASE WHEN n_a + n_b > 1 THEN
           CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
           * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
              - CAST(ties AS DOUBLE)
                / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))
         END AS sig2
  FROM agg)
SELECT n_a, n_b, u_a, mu_u,
       ROUND(CASE WHEN sig2 > 0 THEN SQRT(sig2) END, {dp}) AS sigma_u,
       ROUND(CASE WHEN sig2 > 0 THEN (u_a - mu_u) / SQRT(sig2) END, {dp})
         AS z,
       COALESCE(ABS(CASE WHEN sig2 > 0 THEN (u_a - mu_u) / SQRT(sig2) END)
                > {z_crit}, FALSE) AS significant
FROM stat
"""


# ------------------------------------- Spearman rank correlation

SPEARMAN_DP = 6


def _avg_ranks(df: DataFrame, col: str, out: str,
               n_partitions: int) -> DataFrame:
    """(value, avg_rank) for a column — midrank over ties, computed as
    exclusive-below-count + (t+1)/2 via the KS distributed prefix sum.
    Ranks are exact half-integers, carried as DECIMAL(24,1)."""
    per_v = (df.groupBy(F.col(col).alias("_v"))
             .agg(F.count(F.lit(1)).alias("_t")))
    part = (per_v.repartitionByRange(n_partitions, "_v")
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))
    w_pid = Window.orderBy("_pid")
    offs = (part.groupBy("_pid").agg(F.sum("_t").alias("_pt"))
            .select("_pid",
                    F.coalesce(F.sum("_pt").over(
                        w_pid.rowsBetween(Window.unboundedPreceding, -1)),
                        F.lit(0)).alias("_off")))
    w_local = (Window.partitionBy("_pid").orderBy("_v")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    two = "decimal(24,1)"
    return track_cached_deps(
        part.join(F.broadcast(offs), "_pid")
        .withColumn("_below",
                    F.sum("_t").over(w_local) + F.col("_off")
                    - F.col("_t"))
        .select(F.col("_v").alias(col),
                (F.col("_below").cast(two)
                 + (F.col("_t").cast(two) + F.lit(1)) / F.lit(2))
                .cast(two).alias(out)),
        [part])


def spearman_corr(df: DataFrame, x_col: str, y_col: str,
                  z_crit: float = Z_CRIT,
                  n_partitions: int | None = None) -> DataFrame:
    """Spearman rank correlation of two columns — monotone association
    where the exact-sum Pearson matrix (``regression.corr_matrix``)
    measures LINEAR association: ρ = Pearson over midranks, ties
    handled by average ranks. Rows with a NULL in either column are
    excluded (the corr_matrix complete-case contract). Output ONE row:
    (n, rho, z, significant) — the large-sample H0 normal
    approximation z = ρ·√(n−1) with the threshold verdict at
    ``z_crit`` (no erf — the z-test discipline).

    Exactness: midranks are exact HALF-INTEGERS (exclusive below-count
    + (t+1)/2 — DECIMAL(24,1), never a float rank), so every product in
    the Pearson sums is an exact decimal and ρ is bit-stable under any
    partitioning; the quotient drops to double at the end (rounded
    ``SPEARMAN_DP``). Zero rank variance (a constant column) yields
    NULL ρ.

    Plan at 100 TB: each column collapses to its DISTINCT values (two
    partial+final aggregates), ranks come from the KS distributed
    prefix sum (range partitions + broadcast offsets — no global
    sort), and rows re-acquire their ranks through two value
    equi-joins (Catalyst broadcasts a small distinct side on its own);
    one final aggregate."""
    spark = df.sparkSession
    nparts = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    src = df.filter(F.col(x_col).isNotNull()
                    & F.col(y_col).isNotNull()).select(x_col, y_col)
    rx = _avg_ranks(src, x_col, "_rx", nparts)
    ry = _avg_ranks(src, y_col, "_ry", nparts)
    ranked = src.join(rx, x_col).join(ry, y_col)
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_rx").alias("_sx"), F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"))
    n = F.col("n").cast("double")

    def _c(c):
        return F.col(c).cast("double")

    cov = n * _c("_sxy") - _c("_sx") * _c("_sy")
    vx = n * _c("_sxx") - _c("_sx") * _c("_sx")
    vy = n * _c("_syy") - _c("_sy") * _c("_sy")
    rho = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    z = F.when(n > 1, rho * F.sqrt(n - F.lit(1.0)))
    return track_cached_deps(
        agg.select(
            "n", F.round(rho, SPEARMAN_DP).alias("rho"),
            F.round(z, SPEARMAN_DP).alias("z"),
            F.coalesce(F.abs(z) > z_crit, F.lit(False))
            .alias("significant")),
        getattr(rx, "_cached_deps", []) + getattr(ry, "_cached_deps", []))


def spearman_corr_duck(inner_sql: str, x_col: str, y_col: str,
                       z_crit: float = Z_CRIT) -> str:
    """DuckDB mirror of :func:`spearman_corr` — global windows stand in
    for the distributed prefix sum, same half-integer midranks, same
    exact decimal sums."""
    dp = SPEARMAN_DP

    def ranks(col, out):
        return f"""
  SELECT {col},
         CAST(CAST(COALESCE(SUM(t) OVER (ORDER BY {col}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS DECIMAL(24,1))
              + (CAST(t AS DECIMAL(24,1)) + 1) / 2
              AS DECIMAL(24,1)) AS {out}
  FROM (SELECT {col}, COUNT(*) AS t FROM sp_src GROUP BY {col}) g"""
    return f"""
WITH sp_src AS (
  SELECT {x_col}, {y_col} FROM ({inner_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL),
rx AS ({ranks(x_col, "_rx")}),
ry AS ({ranks(y_col, "_ry")}),
ranked AS (
  SELECT rx._rx, ry._ry
  FROM sp_src s JOIN rx ON rx.{x_col} = s.{x_col}
  JOIN ry ON ry.{y_col} = s.{y_col}),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(_rx) AS sx, SUM(_ry) AS sy, SUM(_rx * _ry) AS sxy,
         SUM(_rx * _rx) AS sxx, SUM(_ry * _ry) AS syy
  FROM ranked),
stat AS (
  SELECT n,
         CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
               AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
         THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         END AS rho
  FROM agg)
SELECT n, ROUND(rho, {dp}) AS rho,
       ROUND(CASE WHEN n > 1 THEN rho * SQRT(CAST(n AS DOUBLE) - 1.0)
             END, {dp}) AS z,
       COALESCE(ABS(CASE WHEN n > 1 THEN
           rho * SQRT(CAST(n AS DOUBLE) - 1.0) END) > {z_crit}, FALSE)
         AS significant
FROM stat
"""


# ------------------------------------- Kruskal-Wallis k-group test

KW_TERM_DP = 9
KW_DP = 6


def kruskal_wallis(df: DataFrame, group_col: str, value_col: str,
                   chi2_crit: float,
                   n_partitions: int | None = None) -> DataFrame:
    """Kruskal–Wallis rank test across k groups — "does ANY of these
    segments' value distributions sit elsewhere?", the k-group
    generalization of :func:`mann_whitney_u` (and the nonparametric
    ANOVA):

        H = [ 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1) ] / C,
        C = 1 − Σ(t³−t)/(n³−n)            (tie correction)

    with R_g the group's midrank sum. ``chi2_crit`` is the caller's
    critical value at k−1 dof (the chi-square threshold-verdict
    discipline); the verdict compares the UNROUNDED statistic.

    Exactness: midranks are exact half-integers from the KS distributed
    prefix sum (DECIMAL, never float ranks), so every R_g is an exact
    decimal; the per-group R_g²/n_g terms are integer-ratio doubles
    quantized to 9-dp DECIMAL before the k-row sum (the log-rank
    discipline), and the tie term Σ(t³−t) sums exactly in
    DECIMAL(38,0) once per distinct value (the MWU discipline). NULL
    groups and NULL values are excluded. All values tied ⇒ C = 0 ⇒
    NULL H, False verdict.

    Output ONE row: (n, n_groups, h, significant).

    Plan at 100 TB: one (value, group) collapse (the only full-data
    shuffle), the prefix-sum rank pass over distinct values, one
    k-row rank-sum aggregate, one 1-row fold. No global sort, no
    per-row ranks."""
    spark = df.sparkSession
    nparts = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    src = (df.filter(F.col(group_col).isNotNull()
                     & F.col(value_col).isNotNull())
           .select(F.col(group_col).alias("_g"),
                   F.col(value_col).alias("_v")))
    per_vg = src.groupBy("_v", "_g").agg(F.count(F.lit(1)).alias("_c"))
    w_v = Window.partitionBy("_v")
    per_vg = per_vg.withColumn("_t", F.sum("_c").over(w_v))
    part = (per_vg.repartitionByRange(nparts, "_v")
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))
    w_pid = Window.orderBy("_pid")
    offs = (part.groupBy("_pid").agg(F.sum("_c").alias("_pc"))
            .select("_pid",
                    F.coalesce(F.sum("_pc").over(
                        w_pid.rowsBetween(Window.unboundedPreceding, -1)),
                        F.lit(0)).alias("_off")))
    # exclusive below-count of ALL observations at v: running total of
    # the per-(v, g) counts over the value order, peeled back by v's
    # own tie size (the max over v's rows makes the running total
    # independent of the within-value row order)
    w_local = (Window.partitionBy("_pid").orderBy("_v")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_vmax = Window.partitionBy("_pid", "_v")
    two = "decimal(24,1)"
    ranked = (part.join(F.broadcast(offs), "_pid")
              .withColumn("_cum", F.max(F.sum("_c").over(w_local))
                          .over(w_vmax))
              .withColumn("_below",
                          F.col("_cum") + F.col("_off") - F.col("_t"))
              .withColumn("_mid",
                          (F.col("_below").cast(two)
                           + (F.col("_t").cast(two) + F.lit(1))
                           / F.lit(2)).cast(two)))
    d12 = "decimal(12,0)"
    by_g = (ranked.groupBy("_g")
            .agg(F.sum(F.col("_mid") * F.col("_c").cast(d12))
                 .alias("_rg"),
                 F.sum("_c").alias("_ng")))
    dec9 = f"decimal(30,{KW_TERM_DP})"
    term = F.round((F.col("_rg").cast("double")
                    * F.col("_rg").cast("double"))
                   / F.col("_ng").cast("double"),
                   KW_TERM_DP).cast(dec9)
    folded = by_g.agg(
        F.sum("_ng").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(term).alias("_x"))
    t = F.col("_t").cast(d12)
    ties = (ranked.groupBy("_v").agg(F.first("_t").alias("_t"))
            .agg(F.sum(t * t * t - F.col("_t").cast("decimal(38,0)"))
                 .alias("_ties")))
    one = folded.crossJoin(ties)  # 1 row × 1 row
    nd = F.col("n").cast("double")
    x = F.col("_x").cast("double")
    raw = F.lit(12.0) / (nd * (nd + 1.0)) * x - 3.0 * (nd + 1.0)
    c_corr = (F.lit(1.0)
              - F.col("_ties").cast("double") / (nd * nd * nd - nd))
    h = F.when((nd > 1) & (c_corr > 0), raw / c_corr)
    return track_cached_deps(
        one.select(
            "n", "n_groups",
            F.round(h, KW_DP).alias("h"),
            F.coalesce(h > F.lit(chi2_crit), F.lit(False))
            .alias("significant")),
        [part])


def kruskal_wallis_duck(inner_sql: str, group_col: str, value_col: str,
                        chi2_crit: float) -> str:
    """DuckDB mirror of :func:`kruskal_wallis` — same midranks via a
    global window, same 9-dp term quantization, same tie fold."""
    dp = KW_TERM_DP
    return f"""
WITH kw_src AS (
  SELECT {group_col} AS g, {value_col} AS v FROM ({inner_sql})
  WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL),
per_vg AS (SELECT v, g, COUNT(*) AS c FROM kw_src GROUP BY v, g),
per_v AS (
  SELECT *, SUM(c) OVER (PARTITION BY v) AS t FROM per_vg),
ranked AS (
  SELECT *,
         COALESCE(SUM(t_once) OVER (ORDER BY v, g
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS below0
  FROM (SELECT *, CASE WHEN ROW_NUMBER() OVER
               (PARTITION BY v ORDER BY g) = 1 THEN t ELSE 0 END
               AS t_once
        FROM per_v) q),
mids AS (
  SELECT g, c, t,
         CAST(CAST(MIN(below0) OVER (PARTITION BY v) AS DECIMAL(24,1))
              + (CAST(t AS DECIMAL(24,1)) + 1) / 2
              AS DECIMAL(24,1)) AS mid,
         ROW_NUMBER() OVER (PARTITION BY v ORDER BY g) AS gi
  FROM ranked),
by_g AS (
  SELECT g, SUM(mid * CAST(c AS DECIMAL(12,0))) AS rg, SUM(c) AS ng
  FROM mids GROUP BY g),
folded AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         SUM(CAST(ROUND(CAST(rg AS DOUBLE) * CAST(rg AS DOUBLE)
                        / CAST(ng AS DOUBLE), {dp})
                  AS DECIMAL(30,{dp}))) AS x
  FROM by_g),
ties AS (
  SELECT SUM(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
             * CAST(t AS DECIMAL(12,0))
             - CAST(t AS DECIMAL(38,0))) AS tt
  FROM mids WHERE gi = 1),
stat AS (
  SELECT n, n_groups,
         CASE WHEN n > 1 AND
              1.0 - CAST(tt AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) > 0
         THEN (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
               * CAST(x AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
              / (1.0 - CAST(tt AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
         END AS h
  FROM folded, ties)
SELECT n, n_groups, ROUND(h, {KW_DP}) AS h,
       COALESCE(h > {chi2_crit}, FALSE) AS significant
FROM stat
"""


# ------------------------------------------- one-way ANOVA F-test

ANOVA_TERM_DP = 9
ANOVA_DP = 6
#: DECIMAL(16,6), not (20,6): Spark's (20,6)x(20,6) product exceeds 38
#: digits and gets precision-loss-ADJUSTED to scale 9 - a 6-dp input's
#: square has 12 true decimals, so sum-of-squares would silently round
#: where DuckDB keeps the exact scale-12 product (the round-15 levene
#: divergence). (16,6)^2 types as (33,12) - exact in both engines.
#: Headroom: |v| < 1e10 per row.
ANOVA_DEC = "decimal(16,6)"

#: decimal places Brown–Forsythe quantizes each group median to —
#: interpolated-median expressions differ between engines at the last
#: ulp, and the raw double would shift every |x − med| across the
#: 6-dp cast grid
BF_MED_DP = 6


def anova_f(df: DataFrame, group_col: str, value_col: str,
            f_crit: float) -> DataFrame:
    """One-way ANOVA — the PARAMETRIC k-group mean comparison beside
    Kruskal–Wallis's rank test (KW asks "same distribution location?",
    this asks "same mean?" under the normal-errors model):

        F = (SSB / (k−1)) / (SSW / (N−k))

    with SSB = Σ_g S_g²/n_g − S²/N and SSW = Q − Σ_g S_g²/n_g from the
    per-group sums S_g = Σv and raw Q = Σv². Output ONE row:
    (n, n_groups, ss_between, ss_within, f, significant) — the
    threshold verdict at the caller's dof-(k−1, N−k) critical value
    (no inverse-F in either engine, the z-test discipline). NULL group
    or value rows are excluded; k < 2, N ≤ k, or zero within-group
    variance ⇒ NULL F, False verdict (the KW all-tied contract).

    Exactness: values quantize to DECIMAL(20,6) and S_g / Q accumulate
    as exact decimal sums (the corr_matrix discipline); the S_g²/n_g
    terms are EXACT 9-dp fixed-point integers via half-up integral
    division on the unscaled sums (the seasonal_decompose discipline —
    ROUND(double, 9) is NOT engine-portable above ~4.5e6, where the
    double's ulp crosses the 1e-9 grid: measured 68-99 % divergence
    between the engines' rounding of IDENTICAL doubles, the round-13
    brown_forsythe failure); the final decimal→double casts floor-split
    through util.dec_to_double. Headroom: the 9-dp term S_g²·10⁹/n_g —
    computed via a q/r split so no intermediate squares the raw unscaled
    sum — must fit DECIMAL(38,0)/int128, i.e. Σ_g S_g²/n_g ≤ 1e29
    (per-group |S_g| ≤ 3.1e14·√n_g), and Q = Σv² must fit its
    DECIMAL(38,12) sum (≤ 1e26). Beyond either bound Spark raises
    NUMERIC_VALUE_OUT_OF_RANGE (ANSI, the session default) rather than
    silently nulling.

    Plan at 100 TB: ONE grouped partial+final aggregate over the scan
    (k rows out), then arithmetic on the k-row frame — no join, no
    second pass."""
    v = F.col(value_col).cast("double").cast(ANOVA_DEC)
    g = (df.filter(F.col(group_col).isNotNull()
                   & F.col(value_col).isNotNull())
         .groupBy(group_col)
         .agg(F.count(F.lit(1)).alias("ng"),
              F.sum(v).alias("sg"),
              F.sum(v * v).alias("qg")))
    # sg²/ng as an EXACT 9-dp fixed-point integer: u = unscaled(sg)
    # (·10⁶), term·10⁹ = half-up(u², D) with D = ng·10³. A direct 2u²
    # already overflows DECIMAL(38,0) at |sg| > ~7e12, and Spark types
    # an exact decimal quotient as DECIMAL(38,6) (overflow at 1e32), so
    # split u = q·D + r (q = trunc quotient, r = trunc remainder, both
    # exact):  u²/D = q²·D + 2qr + r²/D  — the first two terms are exact
    # integers, and only the remainder term needs the half-up division
    #   half-up(r², D) = (2r² + D) fdiv (2D) = (a − a%b)/b
    # whose operands stay ≤ ~2D² (r² < D²). The trunc quotient is
    # (u − u%D)/D — decimal % is exact, an exactly-divisible decimal
    # quotient is exact, and the identity holds for negative u too
    # (r ≤ 0 there, 2qr ≥ 0, r² < D²) — NOT Spark's `div`, whose BIGINT
    # return wraps above 2^63. Headroom is now the term itself fitting
    # DECIMAL(38,0): sg²·10⁹/ng ≤ 1e38 (see docstring).
    d38 = "decimal(38,0)"
    u = (F.col("sg") * F.lit(1_000_000)).cast(d38)
    dnm = F.col("ng").cast(d38) * F.lit(1000).cast(d38)
    q0 = ((u - u % dnm) / dnm).cast(d38)
    r0 = (u % dnm).cast(d38)
    num = F.lit(2).cast(d38) * r0 * r0 + dnm
    den = F.lit(2).cast(d38) * dnm
    rem9 = ((num - num % den) / den).cast(d38)
    term9 = q0 * q0 * dnm + F.lit(2).cast(d38) * q0 * r0 + rem9
    agg = g.agg(F.sum("ng").cast("bigint").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum("sg").alias("_s"),
                F.sum("qg").alias("_q"),
                F.sum(term9).alias("_t9"))
    # floor-split decimal→double (util.dec_to_double): the direct cast
    # of these high-scale sums is NOT engine-identical above 2^53 —
    # DuckDB's q cast measured 1 ulp off correctly-rounded, the
    # round-13 ss_within hash failure
    n = F.col("n").cast("double")
    k = F.col("n_groups").cast("double")
    # _t9 is a scale-0 decimal that can exceed 2^53 (it reaches ~1e24
    # on a 15k-row region frame) — and DuckDB's raw int128→double cast
    # is NOT correctly rounded up there (measured 1 ulp off vs Java's
    # BigDecimal cast, the round-15 levene ss_between divergence). So
    # split at 10^15: both halves convert EXACTLY (each < 2^53) and
    # every later step is one identical IEEE op in both engines — the
    # dec_to_double philosophy for scale-0 magnitudes.
    p15 = F.lit(10 ** 15).cast(d38)
    t9c = F.col("_t9")
    t9_hi = ((t9c - t9c % p15) / p15).cast(d38).cast("double")
    t9_lo = (t9c % p15).cast("double")
    t = (t9_hi * F.lit(1e15) + t9_lo) / F.lit(1e9)
    s_d = dec_to_double(F.col("_s"))
    ssb = t - s_d * s_d / n
    ssw = dec_to_double(F.col("_q")) - t
    f_stat = F.when(
        (F.col("n_groups") >= 2) & (F.col("n") > F.col("n_groups"))
        & (ssw > 0),
        (ssb / (k - F.lit(1.0))) / (ssw / (n - k)))
    # ss_* emit UNROUNDED: both engines compute the identical IEEE
    # double (every step above is one shared IEEE op), while ROUND(x, 6)
    # itself diverges between engines once |x| > ~9e9 (double ulp
    # crosses the 1e-6 grid — the round-15 levene finding; DuckDB
    # rounds via a 1e6 multiply, Spark via the shortest repr)
    return agg.select(
        "n", "n_groups",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.round(f_stat, ANOVA_DP).alias("f"),
        F.coalesce(f_stat > f_crit, F.lit(False)).alias("significant"))


def anova_f_duck(inner_sql: str, group_col: str, value_col: str,
                 f_crit: float) -> str:
    """DuckDB mirror of :func:`anova_f` — identical quantization,
    identical float expressions."""
    dp, odp = ANOVA_TERM_DP, ANOVA_DP
    return f"""
WITH av AS (
  SELECT {group_col} AS g,
         CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)) AS v
  FROM ({inner_sql})
  WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL),
per_g AS (
  SELECT g, COUNT(*) AS ng, SUM(v) AS sg, SUM(v * v) AS qg
  FROM av GROUP BY g),
split AS (
  -- term·10⁹ = half-up(u², D) on int128, u = unscaled(sg), D = ng·10³
  -- — exact fixed-point (ROUND(double, 9) is not engine-portable
  -- here), via the same q/r split as the Spark side so both engines
  -- share the q²D + 2qr + half-up(r², D) headroom (u² alone would
  -- overflow int128 at |sg| > ~1.3e13; // and % truncate identically
  -- in both engines)
  SELECT ng, sg, qg,
         CAST(sg * 1000000 AS HUGEINT) AS u,
         CAST(ng AS HUGEINT) * 1000 AS d
  FROM per_g),
agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         SUM(sg) AS s, SUM(qg) AS q,
         SUM((u // d) * (u // d) * d
             + 2 * (u // d) * (u % d)
             + (2 * (u % d) * (u % d) + d) // (2 * d)) AS t9
  FROM split),
stat AS (
  SELECT n, n_groups,
         -- split int128->double at 1e15 (raw cast not correctly
         -- rounded above 2^53; the Spark side splits identically)
         (CAST(t9 // 1000000000000000 AS DOUBLE) * 1e15 + CAST(t9 % 1000000000000000 AS DOUBLE)) / 1e9
           - {dec_to_double_duck('s')} * {dec_to_double_duck('s')}
             / CAST(n AS DOUBLE) AS ssb,
         {dec_to_double_duck('q')} - (CAST(t9 // 1000000000000000 AS DOUBLE) * 1e15 + CAST(t9 % 1000000000000000 AS DOUBLE)) / 1e9 AS ssw
  FROM agg),
f AS (
  SELECT *, CASE WHEN n_groups >= 2 AND n > n_groups AND ssw > 0
            THEN (ssb / (CAST(n_groups AS DOUBLE) - 1.0))
                 / (ssw / (CAST(n AS DOUBLE)
                           - CAST(n_groups AS DOUBLE))) END AS fs
  FROM stat)
SELECT n, n_groups,
       ssb AS ss_between,
       ssw AS ss_within,
       ROUND(fs, {odp}) AS f,
       COALESCE(fs > {f_crit}, FALSE) AS significant
FROM f
"""


# ------------------------------------------- Welch's unequal-variance t

WELCH_DP = 6


def welch_t(a: DataFrame, b: DataFrame, value_col: str,
            t_crit: float) -> DataFrame:
    """Welch's two-sample t-test — the unequal-variance mean comparison
    beside Mann–Whitney's rank test (the default two-sample t in
    modern practice; Student's pooled form is its equal-variance
    special case):

        t = (m_a − m_b) / √(s_a²/n_a + s_b²/n_b)

    with Welch–Satterthwaite degrees of freedom
    ν = (s_a²/n_a + s_b²/n_b)² / ((s_a²/n_a)²/(n_a−1) +
    (s_b²/n_b)²/(n_b−1)). Output ONE row: (n_a, n_b, mean_a, mean_b,
    t, dof, significant) — threshold verdict at the caller's critical
    value (pick it for ν ≈ min(n_a, n_b) − 1 or the normal limit; no
    inverse-t in either engine). Either side with n < 2 or both
    variances zero ⇒ NULL t/dof, False verdict.

    Exactness: per-side Σv / Σv² in DECIMAL(20,6) (the corr_matrix
    discipline); every expression after them is the same IEEE double
    form in both engines.

    Plan at 100 TB: one 1-row aggregate per side (each a scan-shaped
    partial+final), crossed into one row — no shuffle of data rows."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col).cast("double").cast(ANOVA_DEC)
        return (df.filter(F.col(value_col).isNotNull())
                .agg(F.count(F.lit(1)).alias(f"n_{tag}"),
                     F.sum(v).alias(f"_s_{tag}"),
                     F.sum(v * v).alias(f"_q_{tag}")))
    # broadcast keeps the 1-row × 1-row cross as BroadcastNestedLoop,
    # never a CartesianProduct (the sweep's plan lint bans it)
    one = side(a, "a").crossJoin(F.broadcast(side(b, "b")))

    def stats(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"_s_{tag}").cast("double")
        q = F.col(f"_q_{tag}").cast("double")
        mean = s / n
        var = F.when(F.col(f"n_{tag}") >= 2,
                     (q - s * s / n) / (n - F.lit(1.0)))
        return n, mean, var

    na, ma, va = stats("a")
    nb, mb, vb = stats("b")
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    t = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    dof = F.when(se2 > 0,
                 se2 * se2 / (sea * sea / (na - F.lit(1.0))
                              + seb * seb / (nb - F.lit(1.0))))
    return one.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(ma, WELCH_DP).alias("mean_a"),
        F.round(mb, WELCH_DP).alias("mean_b"),
        F.round(t, WELCH_DP).alias("t"),
        F.round(dof, WELCH_DP).alias("dof"),
        F.coalesce(F.abs(t) > t_crit, F.lit(False)).alias("significant"))


def welch_t_duck(a_sql: str, b_sql: str, value_col: str,
                 t_crit: float) -> str:
    """DuckDB mirror of :func:`welch_t` — identical decimal sums and
    double expressions."""
    dp = WELCH_DP

    def side(sql, tag):
        return f"""
  SELECT COUNT(*) AS n_{tag},
         SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6))) AS s_{tag},
         SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6))
             * CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))
           AS q_{tag}
  FROM ({sql}) WHERE {value_col} IS NOT NULL"""
    var = lambda tag: (  # noqa: E731
        f"CASE WHEN n_{tag} >= 2 THEN "
        f"(CAST(q_{tag} AS DOUBLE) - CAST(s_{tag} AS DOUBLE) "
        f"* CAST(s_{tag} AS DOUBLE) / CAST(n_{tag} AS DOUBLE)) "
        f"/ (CAST(n_{tag} AS DOUBLE) - 1.0) END")
    return f"""
WITH sa AS ({side(a_sql, "a")}),
sb AS ({side(b_sql, "b")}),
j AS (SELECT * FROM sa, sb),
parts AS (
  SELECT *,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         ({var("a")}) / CAST(n_a AS DOUBLE) AS sea,
         ({var("b")}) / CAST(n_b AS DOUBLE) AS seb
  FROM j),
stat AS (
  SELECT *, sea + seb AS se2,
         CASE WHEN sea + seb > 0
              THEN (ma - mb) / SQRT(sea + seb) END AS t,
         CASE WHEN sea + seb > 0
              THEN (sea + seb) * (sea + seb)
                   / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
                      + seb * seb / (CAST(n_b AS DOUBLE) - 1.0)) END
           AS dof
  FROM parts)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(ma, {dp}) AS mean_a, ROUND(mb, {dp}) AS mean_b,
       ROUND(t, {dp}) AS t, ROUND(dof, {dp}) AS dof,
       COALESCE(ABS(t) > {t_crit}, FALSE) AS significant
FROM stat
"""


# --------------------------------------- Jarque–Bera normality test

JB_TERM_DP = 9
JB_DP = 6
#: chi-square dof-2 critical value at alpha = 0.05
JB_CRIT = 5.991


def jarque_bera(df: DataFrame, value_col: str,
                group_cols: list[str] | None = None,
                crit: float = JB_CRIT) -> DataFrame:
    """Jarque–Bera normality test per group — the ASSUMPTION CHECK for
    the parametric members of this family (ANOVA/Welch lean on
    normal-ish errors; a failing JB says reach for KW/MWU instead):

        JB = n/6 · (S² + K²/4),  S = m₃/m₂^{3/2}, K = m₄/m₂² − 3

    from the central moments m_j = Σ(x−x̄)^j / n. Output: (group...,
    n, skewness, kurtosis_excess, jb, significant) with the usual
    threshold verdict at the chi²(2) critical value (significant =
    normality REJECTED). Groups with n < 4 or zero variance emit NULL
    statistics and a False verdict; NULL values are excluded.

    Exactness: pass 1 computes exact DECIMAL(20,6) sums → group means
    (identical double ratios); pass 2 quantizes each row's (x−x̄)²/³/⁴
    to 9-dp DECIMAL before the group sums, so the moment sums are
    order-independent and every expression after them is the same IEEE
    form in both engines.

    Plan at 100 TB: two grouped partial+final aggregates over the scan
    with the |groups|-row means broadcast back between them — the
    robust-outlier two-pass shape, no window, no sort."""
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    vdec = v.cast("decimal(20,6)")
    src = df.filter(F.col(value_col).isNotNull())
    means = (src.groupBy(*groups)
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum(vdec).alias("_s")))
    if groups:
        r = means.select(
            *[F.col(c).alias(f"_j_{c}") for c in groups], "_n", "_s")
        cond = None
        for c in groups:
            e = src[c].eqNullSafe(F.col(f"_j_{c}"))
            cond = e if cond is None else (cond & e)
        j = src.join(F.broadcast(r), cond)
    else:
        j = src.crossJoin(F.broadcast(means))
    mu = F.col("_s").cast("double") / F.col("_n").cast("double")
    d = v - mu
    # (38,9): the fourth-power terms need the full width — |d| ~ 3e5
    # already puts d^4 at ~8e21, past DECIMAL(30,9)'s 1e21 integer
    # capacity (measured overflow on order prices). Headroom contract:
    # n·max|d|^4 < 1e29; larger-magnitude columns should pre-scale.
    dec9 = f"decimal(38,{JB_TERM_DP})"
    agg = (j.groupBy(*groups)
           .agg(F.max("_n").cast("bigint").alias("n"),
                F.sum(F.round(d * d, JB_TERM_DP).cast(dec9)).alias("_m2"),
                F.sum(F.round(d * d * d, JB_TERM_DP).cast(dec9))
                .alias("_m3"),
                F.sum(F.round(d * d * d * d, JB_TERM_DP).cast(dec9))
                .alias("_m4")))
    n = F.col("n").cast("double")
    m2 = F.col("_m2").cast("double") / n
    m3 = F.col("_m3").cast("double") / n
    m4 = F.col("_m4").cast("double") / n
    ok = (F.col("n") >= 4) & (m2 > 0)
    skew = F.when(ok, m3 / F.sqrt(m2 * m2 * m2))
    kurt = F.when(ok, m4 / (m2 * m2) - F.lit(3.0))
    jb = F.when(ok, n / F.lit(6.0)
                * (skew * skew + kurt * kurt / F.lit(4.0)))
    return agg.select(
        *groups, "n",
        F.round(skew, JB_DP).alias("skewness"),
        F.round(kurt, JB_DP).alias("kurtosis_excess"),
        F.round(jb, JB_DP).alias("jb"),
        F.coalesce(jb > crit, F.lit(False)).alias("significant"))


def jarque_bera_duck(inner_sql: str, value_col: str,
                     group_cols: list[str] | None = None,
                     crit: float = JB_CRIT) -> str:
    """DuckDB mirror of :func:`jarque_bera` — the same two passes and
    9-dp central-moment quantization."""
    dp, odp = JB_TERM_DP, JB_DP
    groups = list(group_cols or [])
    gs = ", ".join(groups)
    gpfx = f"{gs}, " if groups else ""
    gby = f"GROUP BY {gs}" if groups else ""
    on = (" ON " + " AND ".join(
        f"s.{g} IS NOT DISTINCT FROM m.{g}" for g in groups)
        if groups else " ON TRUE")
    return f"""
WITH jb0 AS (SELECT * FROM ({inner_sql})
             WHERE {value_col} IS NOT NULL),
m AS (SELECT {gpfx}COUNT(*) AS n,
             SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))
               AS s
      FROM jb0 {gby}),
d AS (SELECT {("m." + ", m.".join(groups) + ", ") if groups else ""}
             m.n,
             CAST(s.{value_col} AS DOUBLE)
               - CAST(m.s AS DOUBLE) / m.n AS dd
      FROM jb0 s JOIN m{on}),
agg AS (
  SELECT {gpfx}CAST(MAX(n) AS BIGINT) AS n,
         SUM(CAST(ROUND(dd * dd, {dp}) AS DECIMAL(38,{dp}))) AS m2s,
         SUM(CAST(ROUND(dd * dd * dd, {dp}) AS DECIMAL(38,{dp})))
           AS m3s,
         SUM(CAST(ROUND(dd * dd * dd * dd, {dp}) AS DECIMAL(38,{dp})))
           AS m4s
  FROM d {gby}),
stat AS (
  SELECT *, CAST(m2s AS DOUBLE) / n AS m2,
         CAST(m3s AS DOUBLE) / n AS m3,
         CAST(m4s AS DOUBLE) / n AS m4,
         (n >= 4 AND CAST(m2s AS DOUBLE) / n > 0) AS ok
  FROM agg),
sk AS (
  SELECT *,
         CASE WHEN ok THEN m3 / SQRT(m2 * m2 * m2) END AS skew,
         CASE WHEN ok THEN m4 / (m2 * m2) - 3.0 END AS kurt
  FROM stat)
SELECT {gpfx}n,
       ROUND(skew, {odp}) AS skewness,
       ROUND(kurt, {odp}) AS kurtosis_excess,
       ROUND(CASE WHEN ok THEN CAST(n AS DOUBLE) / 6.0
             * (skew * skew + kurt * kurt / 4.0) END, {odp}) AS jb,
       COALESCE(CASE WHEN ok THEN CAST(n AS DOUBLE) / 6.0
                * (skew * skew + kurt * kurt / 4.0) END > {crit!r},
                FALSE) AS significant
FROM sk
"""


# ---------------------------------- Brown–Forsythe equal-variance test


def brown_forsythe(df: DataFrame, group_col: str, value_col: str,
                   f_crit: float) -> DataFrame:
    """Brown–Forsythe equal-variance test — ANOVA's OTHER assumption
    check (homoscedasticity; Levene's test with the MEDIAN center —
    the robust variant that is the modern default): a one-way ANOVA F
    on the absolute deviations z = |x − median_g| from each group's
    own median. Same output contract as :func:`anova_f` (a significant
    verdict = variances DIFFER ⇒ prefer Welch over pooled
    comparisons).

    Pure composition: per-group interpolated medians (the robust
    family's percentile ↔ quantile_cont pairing) joined back
    broadcast-style, then the exact-decimal ANOVA machinery on z.
    The median is quantized to ``BF_MED_DP`` before the deviations:
    the engines' interpolation expressions differ at the last ulp, and
    an un-quantized median shifts EVERY z in its group across
    anova_f's 6-dp cast boundaries (caught by the 17-digit sweep) —
    the operator is DEFINED as the quantized-median chart, the EWMA
    weight-table discipline.

    Plan at 100 TB: one grouped percentile aggregate + one broadcast
    join + :func:`anova_f`'s single grouped aggregate."""
    src = df.filter(F.col(group_col).isNotNull()
                    & F.col(value_col).isNotNull())
    med = (src.groupBy(group_col)
           .agg(F.round(
               F.expr(f"percentile(CAST({value_col} AS DOUBLE), 0.5)"),
               BF_MED_DP).alias("_med")))
    j = (src.join(F.broadcast(med.withColumnRenamed(group_col, "_g")),
                  src[group_col].eqNullSafe(F.col("_g")))
         .withColumn("_z", F.abs(F.col(value_col).cast("double")
                                 - F.col("_med"))))
    return anova_f(j, group_col, "_z", f_crit)


def brown_forsythe_duck(inner_sql: str, group_col: str, value_col: str,
                        f_crit: float) -> str:
    """DuckDB mirror of :func:`brown_forsythe` — quantile_cont medians
    feeding the anova mirror."""
    inner = f"""
SELECT s.{group_col}, ABS(CAST(s.{value_col} AS DOUBLE) - m._med) AS _z
FROM ({inner_sql}) s
JOIN (SELECT {group_col} AS _g,
             ROUND(quantile_cont(CAST({value_col} AS DOUBLE), 0.5),
                   {BF_MED_DP}) AS _med
      FROM ({inner_sql})
      WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL
      GROUP BY 1) m
  ON s.{group_col} IS NOT DISTINCT FROM m._g
WHERE s.{group_col} IS NOT NULL AND s.{value_col} IS NOT NULL"""
    return anova_f_duck(inner, group_col, "_z", f_crit)


# ------------------------------- CUPED variance-reduced A/B readout

CUPED_DP = 6


def cuped_ab_test(df: DataFrame, group_col: str, metric_col: str,
                  covariate_col: str, group_a, group_b,
                  z_crit: float = Z_CRIT) -> DataFrame:
    """CUPED-adjusted two-group mean comparison (Deng, Xu, Kohavi &
    Walker 2013 — "Improving the sensitivity of online controlled
    experiments") — the variance-reduction layer over this family's
    plain z/Welch readouts: each unit's metric is adjusted by its own
    PRE-EXPERIMENT covariate,

        y* = y − θ·(x − x̄),   θ = cov(x, y) / var(x)   (pooled),

    which leaves every group's true treatment effect untouched (θ and
    x̄ are experiment-wide constants, and randomization makes E[x]
    equal across arms) while removing the covariate-explained variance
    — the standard trick that cuts experiment runtimes ~in half when
    pre-period behavior predicts the metric. Output ONE row:
    (n_a, n_b, theta, var_reduction, mean_a, mean_b, lift, z,
    significant) — mean/lift on the ADJUSTED metric, z from the
    adjusted per-group variances (the Welch form), var_reduction =
    1 − var(y*)/var(y) pooled (how much CUPED bought). Units with a
    NULL metric or covariate are excluded; zero covariate variance ⇒
    θ = 0 (adjustment degrades to the plain test, never a division
    blow-up); zero adjusted variance ⇒ NULL z, False verdict; an EMPTY
    arm still emits the one row — NULL mean/z for that side and a
    False verdict (the welch_t degraded contract, kept by computing
    both arms in ONE conditional global aggregate instead of a
    per-group cross join that would emit zero rows).

    Exactness: the θ/x̄ pass accumulates exact DECIMAL(20,6) sums of
    x, y, x², xy in ONE aggregate; the second pass quantizes each
    row's adjusted products to 9-dp DECIMAL before the per-group sums
    (the JB two-pass discipline), so both passes are order-independent
    and every double expression is engine-identical.

    Plan at 100 TB: two grouped partial+final aggregates over the unit
    scan with a broadcast 1-row constants frame between them — no
    window, no sort, no per-unit state."""
    g = F.col(group_col)
    src = df.filter(g.isin([group_a, group_b])
                    & F.col(metric_col).isNotNull()
                    & F.col(covariate_col).isNotNull())
    x = F.col(covariate_col).cast("double")
    y = F.col(metric_col).cast("double")
    dec = "decimal(20,6)"
    pass1 = src.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x.cast(dec)).alias("_sx"),
        F.sum(y.cast(dec)).alias("_sy"),
        F.sum((x.cast(dec) * x.cast(dec))).alias("_sxx"),
        F.sum((x.cast(dec) * y.cast(dec))).alias("_sxy"))
    n0 = F.col("_n").cast("double")
    varx = (F.col("_sxx").cast("double")
            - F.col("_sx").cast("double")
            * F.col("_sx").cast("double") / n0)
    covxy = (F.col("_sxy").cast("double")
             - F.col("_sx").cast("double")
             * F.col("_sy").cast("double") / n0)
    consts = pass1.select(
        F.when(varx > 0, covxy / varx).otherwise(F.lit(0.0))
        .alias("_theta"),
        (F.col("_sx").cast("double") / n0).alias("_xbar"))
    j = src.crossJoin(F.broadcast(consts))
    adj = y - F.col("_theta") * (x - F.col("_xbar"))
    dec9 = f"decimal(38,{LOGRANK_TERM_DP})"
    q = lambda c: F.round(c, LOGRANK_TERM_DP).cast(dec9)  # noqa: E731

    # ONE conditional global aggregate, not per-group-then-cross-join:
    # a global agg emits a row even when an arm (or both) is empty, so
    # the operator degrades to one row of NULL stats with a False
    # verdict — the welch_t contract — instead of zero rows
    def arm(tag: str, w):
        return [F.count(F.when(w, F.lit(1))).alias(f"n_{tag}"),
                F.sum(F.when(w, q(adj))).alias(f"s_{tag}"),
                F.sum(F.when(w, q(adj * adj))).alias(f"q2_{tag}"),
                F.sum(F.when(w, q(y))).alias(f"sy_{tag}"),
                F.sum(F.when(w, q(y * y))).alias(f"qy_{tag}")]

    one = j.agg(*arm("a", g == group_a), *arm("b", g == group_b),
                F.max("_theta").alias("th_a"))

    def stats(s, q2, n):
        nd = F.col(n).cast("double")
        sd = F.col(s).cast("double")
        qd = F.col(q2).cast("double")
        mean = sd / nd
        var = F.when(F.col(n) >= 2,
                     (qd - sd * sd / nd) / (nd - F.lit(1.0)))
        return nd, mean, var

    na, ma, va = stats("s_a", "q2_a", "n_a")
    nb, mb, vb = stats("s_b", "q2_b", "n_b")
    _, _, vya = stats("sy_a", "qy_a", "n_a")
    _, _, vyb = stats("sy_b", "qy_b", "n_b")
    se2 = va / na + vb / nb
    z = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    pooled_adj = va * (na - 1) + vb * (nb - 1)
    pooled_raw = vya * (na - 1) + vyb * (nb - 1)
    vr = F.when(pooled_raw > 0,
                F.lit(1.0) - pooled_adj / pooled_raw)
    return one.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(F.col("th_a"), CUPED_DP).alias("theta"),
        F.round(vr, CUPED_DP).alias("var_reduction"),
        F.round(ma, CUPED_DP).alias("mean_a"),
        F.round(mb, CUPED_DP).alias("mean_b"),
        F.round(ma - mb, CUPED_DP).alias("lift"),
        F.round(z, CUPED_DP).alias("z"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant"))


def cuped_ab_test_duck(inner_sql: str, group_col: str, metric_col: str,
                       covariate_col: str, group_a, group_b,
                       z_crit: float = Z_CRIT) -> str:
    """DuckDB mirror of :func:`cuped_ab_test` — the same two passes,
    exact decimal sums and 9-dp adjusted-term quantization."""
    from flink_rag_spark.operators.util import sql_str_lit as _lit
    ga, gb = _lit(group_a), _lit(group_b)
    dp, odp = LOGRANK_TERM_DP, CUPED_DP
    return f"""
WITH cu0 AS (
  SELECT {group_col} AS g,
         CAST({metric_col} AS DOUBLE) AS y,
         CAST({covariate_col} AS DOUBLE) AS x
  FROM ({inner_sql})
  WHERE {group_col} IN ({ga}, {gb})
    AND {metric_col} IS NOT NULL AND {covariate_col} IS NOT NULL),
p1 AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(20,6))) AS sx,
         SUM(CAST(y AS DECIMAL(20,6))) AS sy,
         SUM(CAST(x AS DECIMAL(20,6)) * CAST(x AS DECIMAL(20,6)))
           AS sxx,
         SUM(CAST(x AS DECIMAL(20,6)) * CAST(y AS DECIMAL(20,6)))
           AS sxy
  FROM cu0),
c AS (
  SELECT CASE WHEN CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n > 0
         THEN (CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
              / (CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
         ELSE 0.0 END AS theta,
         CAST(sx AS DOUBLE) / n AS xbar
  FROM p1),
per AS (
  -- one conditional global aggregate (always one row, even when an
  -- arm is empty — the welch_t degraded contract)
  SELECT COUNT(CASE WHEN g = {ga} THEN 1 END) AS n_a,
         COUNT(CASE WHEN g = {gb} THEN 1 END) AS n_b,
         SUM(CASE WHEN g = {ga} THEN
             CAST(ROUND(y - theta * (x - xbar), {dp})
                  AS DECIMAL(38,{dp})) END) AS s_a,
         SUM(CASE WHEN g = {gb} THEN
             CAST(ROUND(y - theta * (x - xbar), {dp})
                  AS DECIMAL(38,{dp})) END) AS s_b,
         SUM(CASE WHEN g = {ga} THEN
             CAST(ROUND((y - theta * (x - xbar))
                        * (y - theta * (x - xbar)), {dp})
                  AS DECIMAL(38,{dp})) END) AS q2_a,
         SUM(CASE WHEN g = {gb} THEN
             CAST(ROUND((y - theta * (x - xbar))
                        * (y - theta * (x - xbar)), {dp})
                  AS DECIMAL(38,{dp})) END) AS q2_b,
         SUM(CASE WHEN g = {ga} THEN
             CAST(ROUND(y, {dp}) AS DECIMAL(38,{dp})) END) AS sy_a,
         SUM(CASE WHEN g = {gb} THEN
             CAST(ROUND(y, {dp}) AS DECIMAL(38,{dp})) END) AS sy_b,
         SUM(CASE WHEN g = {ga} THEN
             CAST(ROUND(y * y, {dp}) AS DECIMAL(38,{dp})) END) AS qy_a,
         SUM(CASE WHEN g = {gb} THEN
             CAST(ROUND(y * y, {dp}) AS DECIMAL(38,{dp})) END) AS qy_b,
         MAX(theta) AS th
  FROM cu0 CROSS JOIN c),
w AS (
  SELECT n_a, n_b, th,
         CAST(s_a AS DOUBLE) / n_a AS ma,
         CAST(s_b AS DOUBLE) / n_b AS mb,
         CASE WHEN n_a >= 2 THEN (CAST(q2_a AS DOUBLE)
           - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)
           / (CAST(n_a AS DOUBLE) - 1.0) END AS va,
         CASE WHEN n_b >= 2 THEN (CAST(q2_b AS DOUBLE)
           - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)
           / (CAST(n_b AS DOUBLE) - 1.0) END AS vb,
         CASE WHEN n_a >= 2 THEN (CAST(qy_a AS DOUBLE)
           - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / n_a)
           / (CAST(n_a AS DOUBLE) - 1.0) END AS vya,
         CASE WHEN n_b >= 2 THEN (CAST(qy_b AS DOUBLE)
           - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / n_b)
           / (CAST(n_b AS DOUBLE) - 1.0) END AS vyb
  FROM per),
stat AS (
  SELECT *, va / n_a + vb / n_b AS se2,
         va * (n_a - 1) + vb * (n_b - 1) AS pa,
         vya * (n_a - 1) + vyb * (n_b - 1) AS pr
  FROM w)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(th, {odp}) AS theta,
       ROUND(CASE WHEN pr > 0 THEN 1.0 - pa / pr END, {odp})
         AS var_reduction,
       ROUND(ma, {odp}) AS mean_a, ROUND(mb, {odp}) AS mean_b,
       ROUND(ma - mb, {odp}) AS lift,
       ROUND(CASE WHEN se2 > 0 THEN (ma - mb) / SQRT(se2) END, {odp})
         AS z,
       COALESCE(ABS(CASE WHEN se2 > 0 THEN (ma - mb) / SQRT(se2) END)
                > {z_crit!r}, FALSE) AS significant
FROM stat
"""


# -------------------------------------- Kendall's tau-b (grid form)

KENDALL_DP = 6


def kendall_tau(df: DataFrame, x_col: str, y_col: str,
                z_crit: float = Z_CRIT) -> DataFrame:
    """Kendall's τ-b rank correlation — the concordance twin of
    :func:`spearman_corr` (Spearman correlates midranks; τ counts
    concordant vs discordant PAIRS, the statistic behind
    :func:`~flink_rag_spark.operators.regression.mann_kendall_trend`'s
    S generalized to two arbitrary ordinals):

        τ_b = (C − D) / √((n0 − n1)(n0 − n2)),
        n0 = n(n−1)/2,  n1 = Σ_x t(t−1)/2,  n2 = Σ_y u(u−1)/2

    with the tie-corrected normal approximation (Kendall 1970, the
    scipy ASYMPTOTIC form):

        Var(S) = (v0 − vt − vu)/18
                 + vtt·vuu3 / (9n(n−1)(n−2)) + vt2·vu2 / (2n(n−1))

    where v0 = n(n−1)(2n+5), vt/vu the (2t+5) tie sums, vtt/vuu3 the
    t(t−1)(t−2) sums and vt2/vu2 the t(t−1) sums. Output ONE row:
    (n, tau, z, significant). NULL-in-either rows are excluded; zero
    denominator (a constant column) ⇒ NULL τ, False verdict.

    GRID CONTRACT (the chi²/t-closeness stance): rows collapse to
    DISTINCT (x, y) cells first, and the pair frame is cells × cells —
    C(m,2) BY DEFINITION, bounded because the inputs are ordinals
    (priorities, grades, bucketed measures). For a continuous column,
    bin it first (``profiling.quantile_bins``) — that is the knob, not
    a bigger cluster.

    Exactness: C, D and every tie sum are exact integers (cell-count
    products summed as DECIMAL(38,0)); the variance and τ are double
    expressions over those integers — identical in both engines."""
    src = (df.filter(F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull())
           .select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y")))
    d38 = "decimal(38,0)"
    cells = (src.groupBy("_x", "_y")
             .agg(F.count(F.lit(1)).cast(d38).alias("_c")))
    b = cells.select(F.col("_x").alias("_x2"),
                     F.col("_y").alias("_y2"),
                     F.col("_c").alias("_c2"))
    # explicit broadcast: the pure-inequality pair join has no equi
    # keys, and an aggregated frame's size estimate can push Catalyst
    # to CartesianProduct — the grid contract makes cells broadcastable
    # BY CONSTRUCTION
    pairs = cells.join(F.broadcast(b), F.col("_x2") > F.col("_x"))
    cd = pairs.agg(
        F.sum(F.when(F.col("_y2") > F.col("_y"),
                     F.col("_c") * F.col("_c2"))).alias("_conc"),
        F.sum(F.when(F.col("_y2") < F.col("_y"),
                     F.col("_c") * F.col("_c2"))).alias("_disc"))
    tx = (cells.groupBy("_x").agg(F.sum("_c").alias("_t"))
          .agg(F.sum(F.col("_t") * (F.col("_t") - 1)).alias("_t2"),
               F.sum(F.col("_t") * (F.col("_t") - 1)
                     * (2 * F.col("_t") + 5)).alias("_t25"),
               F.sum(F.col("_t") * (F.col("_t") - 1)
                     * (F.col("_t") - 2)).alias("_t3")))
    ty = (cells.groupBy("_y").agg(F.sum("_c").alias("_u"))
          .agg(F.sum(F.col("_u") * (F.col("_u") - 1)).alias("_u2"),
               F.sum(F.col("_u") * (F.col("_u") - 1)
                     * (2 * F.col("_u") + 5)).alias("_u25"),
               F.sum(F.col("_u") * (F.col("_u") - 1)
                     * (F.col("_u") - 2)).alias("_u3")))
    ntot = src.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    one = (ntot.crossJoin(F.broadcast(cd))
           .crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty)))
    n = F.col("n").cast("double")
    conc = F.coalesce(F.col("_conc"), F.lit(0).cast(d38)).cast("double")
    disc = F.coalesce(F.col("_disc"), F.lit(0).cast(d38)).cast("double")
    s = conc - disc
    t2 = F.coalesce(F.col("_t2").cast("double"), F.lit(0.0))
    u2 = F.coalesce(F.col("_u2").cast("double"), F.lit(0.0))
    t25 = F.coalesce(F.col("_t25").cast("double"), F.lit(0.0))
    u25 = F.coalesce(F.col("_u25").cast("double"), F.lit(0.0))
    t3 = F.coalesce(F.col("_t3").cast("double"), F.lit(0.0))
    u3 = F.coalesce(F.col("_u3").cast("double"), F.lit(0.0))
    n0x2 = n * (n - 1)                          # 2·n0
    den = F.sqrt((n0x2 / 2 - t2 / 2) * (n0x2 / 2 - u2 / 2))
    tau = F.when(den > 0, s / den)
    v0 = n * (n - 1) * (2 * n + 5)
    var = ((v0 - t25 - u25) / F.lit(18.0)
           + F.when(n > 2, t3 * u3 / (9.0 * n * (n - 1) * (n - 2)))
           .otherwise(F.lit(0.0))
           + t2 * u2 / (2.0 * n * (n - 1)))
    z = F.when((den > 0) & (var > 0), s / F.sqrt(var))
    return one.select(
        "n",
        F.round(tau, KENDALL_DP).alias("tau"),
        F.round(z, KENDALL_DP).alias("z"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant"))


def kendall_tau_duck(inner_sql: str, x_col: str, y_col: str,
                     z_crit: float = Z_CRIT) -> str:
    """DuckDB mirror of :func:`kendall_tau` — same cell grid, exact
    integer sums, identical double expressions."""
    dp = KENDALL_DP
    return f"""
WITH kt0 AS (
  SELECT {x_col} AS x, {y_col} AS y FROM ({inner_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL),
cells AS (
  SELECT x, y, CAST(COUNT(*) AS DECIMAL(38,0)) AS c
  FROM kt0 GROUP BY x, y),
cd AS (
  SELECT SUM(CASE WHEN b.y > a.y THEN a.c * b.c END) AS conc,
         SUM(CASE WHEN b.y < a.y THEN a.c * b.c END) AS disc
  FROM cells a JOIN cells b ON b.x > a.x),
tx AS (
  SELECT SUM(t * (t - 1)) AS t2,
         SUM(t * (t - 1) * (2 * t + 5)) AS t25,
         SUM(t * (t - 1) * (t - 2)) AS t3
  FROM (SELECT SUM(c) AS t FROM cells GROUP BY x)),
ty AS (
  SELECT SUM(u * (u - 1)) AS u2,
         SUM(u * (u - 1) * (2 * u + 5)) AS u25,
         SUM(u * (u - 1) * (u - 2)) AS u3
  FROM (SELECT SUM(c) AS u FROM cells GROUP BY y)),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM kt0),
j AS (
  SELECT n,
         CAST(COALESCE(conc, 0) AS DOUBLE) AS conc,
         CAST(COALESCE(disc, 0) AS DOUBLE) AS disc,
         CAST(COALESCE(t2, 0) AS DOUBLE) AS t2,
         CAST(COALESCE(u2, 0) AS DOUBLE) AS u2,
         CAST(COALESCE(t25, 0) AS DOUBLE) AS t25,
         CAST(COALESCE(u25, 0) AS DOUBLE) AS u25,
         CAST(COALESCE(t3, 0) AS DOUBLE) AS t3,
         CAST(COALESCE(u3, 0) AS DOUBLE) AS u3
  FROM nt CROSS JOIN cd CROSS JOIN tx CROSS JOIN ty),
stat AS (
  SELECT n, conc - disc AS s,
         SQRT((CAST(n AS DOUBLE) * (n - 1) / 2 - t2 / 2)
              * (CAST(n AS DOUBLE) * (n - 1) / 2 - u2 / 2)) AS den,
         (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - t25 - u25) / 18.0
           + CASE WHEN n > 2 THEN t3 * u3
               / (9.0 * CAST(n AS DOUBLE) * (n - 1) * (n - 2))
             ELSE 0.0 END
           + t2 * u2 / (2.0 * CAST(n AS DOUBLE) * (n - 1)) AS var
  FROM j)
SELECT n,
       ROUND(CASE WHEN den > 0 THEN s / den END, {dp}) AS tau,
       ROUND(CASE WHEN den > 0 AND var > 0 THEN s / SQRT(var) END,
             {dp}) AS z,
       COALESCE(ABS(CASE WHEN den > 0 AND var > 0
                    THEN s / SQRT(var) END) > {z_crit!r}, FALSE)
         AS significant
FROM stat
"""


# --------------------------------------- G-test of independence

GTEST_LN_DP = 9
GTEST_DP = 6


def g_test_independence(df: DataFrame, row_col: str, col_col: str,
                        chi2_crit: float) -> DataFrame:
    """Likelihood-ratio (G) test of independence — chi-square's
    log-likelihood twin on the same r × c grid (preferred when any
    O·ln(O/E) term dominates, additively decomposable across margins):

        G = 2 Σ_rc O_rc · ln(O_rc / E_rc),   E_rc = rt_r · ct_c / n

    summed over OBSERVED cells only (O = 0 contributes 0 — the
    x·ln x → 0 limit, unlike chi²'s O=0 cells which carry E). G is
    asymptotically chi²(dof) under H0, so ``chi2_crit`` is the same
    caller-supplied critical value as :func:`chi2_independence`.
    Output ONE row: (n, n_rows, n_cols, dof, g, significant).

    Exactness: O, rt, ct, n exact integers; each ln runs on an
    IEEE-identical double ratio and QUANTIZES to 9-dp DECIMAL before
    the multiply (|ln| ≤ ~40 ⇒ ulp ~1e-15 ≪ the 1e-9 grid — portable,
    unlike rounding the full O·ln term whose magnitude breaks the
    grid), so O·ln is an exact decimal product and the sum is
    order-independent.

    Plan at 100 TB: the chi² shape minus the full-grid expansion — one
    (r, c)-grouped count, two margin aggregates of the grid, one final
    aggregate."""
    r, c = F.col(row_col), F.col(col_col)
    obs = (df.filter(r.isNotNull() & c.isNotNull())
           .groupBy(r.alias("r"), c.alias("cc"))
           .agg(F.count(F.lit(1)).alias("o")))
    rows = obs.groupBy("r").agg(F.sum("o").alias("rt"))
    cols = obs.groupBy("cc").agg(F.sum("o").alias("ct"))
    g = (obs.join(F.broadcast(rows), "r")
         .join(F.broadcast(cols), "cc"))
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    g = g.withColumn("n", F.sum("o").over(w_all))
    od = F.col("o").cast("double")
    e = (F.col("rt").cast("double") * F.col("ct").cast("double")
         / F.col("n").cast("double"))
    lndec = f"decimal(14,{GTEST_LN_DP})"
    ln_q = F.round(F.log(od / e), GTEST_LN_DP).cast(lndec)
    term = F.col("o").cast("decimal(20,0)") * ln_q
    out = g.agg(
        F.max("n").cast("bigint").alias("n"),
        F.countDistinct("r").cast("bigint").alias("n_rows"),
        F.countDistinct("cc").cast("bigint").alias("n_cols"),
        F.sum(term).alias("_g2"))
    dof = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    gstat = F.lit(2).cast("decimal(2,0)") * F.col("_g2")
    return out.select(
        "n", "n_rows", "n_cols", dof.cast("bigint").alias("dof"),
        F.round(gstat, GTEST_DP).cast("double").alias("g"),
        (gstat > F.lit(chi2_crit)).alias("significant"))


def g_test_independence_duck(inner_sql: str, row_col: str,
                             col_col: str, chi2_crit: float) -> str:
    """DuckDB mirror of :func:`g_test_independence` — same observed
    cells, same 9-dp ln quantization, same exact decimal term sum."""
    dp, odp = GTEST_LN_DP, GTEST_DP
    return f"""
WITH g_src AS (
  SELECT {row_col} AS r, {col_col} AS cc FROM ({inner_sql})
  WHERE {row_col} IS NOT NULL AND {col_col} IS NOT NULL),
obs AS (
  SELECT r, cc, COUNT(*) AS o FROM g_src GROUP BY r, cc),
rt AS (SELECT r, SUM(o) AS rt FROM obs GROUP BY r),
ct AS (SELECT cc, SUM(o) AS ct FROM obs GROUP BY cc),
j AS (
  SELECT obs.o, rt.rt, ct.ct,
         SUM(obs.o) OVER () AS n
  FROM obs JOIN rt ON obs.r = rt.r JOIN ct ON obs.cc = ct.cc),
terms AS (
  SELECT o, n,
         CAST(o AS DECIMAL(20,0))
           * CAST(ROUND(LN(CAST(o AS DOUBLE)
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(n AS DOUBLE))), {dp})
             AS DECIMAL(14,{dp})) AS term
  FROM j),
agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS n_rows,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_cols,
         SUM(term) AS g2
  FROM terms)
SELECT n, n_rows, n_cols,
       CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
       CAST(ROUND(2 * g2, {odp}) AS DOUBLE) AS g,
       (2 * g2 > {chi2_crit!r}) AS significant
FROM agg
"""


# ---------------------------------- association effect sizes

CRAMER_DP = 6


def cramers_v(df: DataFrame, row_col: str, col_col: str,
              chi2_crit: float) -> DataFrame:
    """Cramér's V (and φ) — the EFFECT-SIZE companion to
    :func:`chi2_independence`'s verdict (chi² says "dependent?", V
    says "how strongly", on the comparable 0..1 scale):

        φ = √(χ²/n),   V = √(χ² / (n·min(r−1, c−1)))

    Pure composition: the chi² pipeline's one row, plus two double
    expressions over its 6-dp-rounded statistic (the determinism is
    inherited — V is DEFINED from the rounded χ², the quantized-input
    discipline). Output ONE row: (n, n_rows, n_cols, dof, chi2, phi,
    cramers_v, significant)."""
    base = chi2_independence(df, row_col, col_col, chi2_crit)
    n = F.col("n").cast("double")
    mindim = F.least(F.col("n_rows") - 1, F.col("n_cols") - 1) \
        .cast("double")
    phi = F.sqrt(F.col("chi2") / n)
    v = F.when(mindim > 0, F.sqrt(F.col("chi2") / (n * mindim)))
    return base.select(
        "n", "n_rows", "n_cols", "dof", "chi2",
        F.round(phi, CRAMER_DP).alias("phi"),
        F.round(v, CRAMER_DP).alias("cramers_v"),
        "significant")


def cramers_v_duck(inner_sql: str, row_col: str, col_col: str,
                   chi2_crit: float) -> str:
    """DuckDB mirror of :func:`cramers_v` — the chi² mirror wrapped
    with the same rounded-statistic effect sizes."""
    inner = chi2_independence_duck(inner_sql, row_col, col_col,
                                   chi2_crit)
    return f"""
SELECT n, n_rows, n_cols, dof, chi2,
       ROUND(SQRT(chi2 / CAST(n AS DOUBLE)), {CRAMER_DP}) AS phi,
       ROUND(CASE WHEN LEAST(n_rows - 1, n_cols - 1) > 0 THEN
         SQRT(chi2 / (CAST(n AS DOUBLE)
                      * CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE)))
         END, {CRAMER_DP}) AS cramers_v,
       significant
FROM ({inner}) _cv
"""


MI_DP = 6


def mutual_information(df: DataFrame, x_col: str,
                       y_col: str) -> DataFrame:
    """Mutual information between two categorical columns, with the
    √(H(X)·H(Y))-normalized NMI — the INFORMATION-theoretic strength
    measure beside Cramér's V (V is χ²-shaped; MI is the KL divergence
    from independence, MI = G/(2n) of :func:`g_test_independence`):

        MI  = Σ_xy (O/n)·ln(n·O / (rt·ct)),
        NMI = MI / √(H(X)·H(Y))   (NULL when either entropy is 0)

    Output ONE row: (n, mi, h_x, h_y, nmi), nats. NULL categories are
    excluded.

    Exactness (the G-test discipline): every ln runs on IEEE-identical
    double ratios and quantizes to 9-dp DECIMAL before multiplying by
    the exact integer count, so the MI and entropy sums are
    order-independent exact decimals; the final /n divisions run on
    floor-split doubles."""
    from flink_rag_spark.operators.util import dec_to_double

    r, c = F.col(x_col), F.col(y_col)
    obs = (df.filter(r.isNotNull() & c.isNotNull())
           .groupBy(r.alias("r"), c.alias("cc"))
           .agg(F.count(F.lit(1)).alias("o")))
    rows = obs.groupBy("r").agg(F.sum("o").alias("rt"))
    cols = obs.groupBy("cc").agg(F.sum("o").alias("ct"))
    g = (obs.join(F.broadcast(rows), "r")
         .join(F.broadcast(cols), "cc"))
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    g = g.withColumn("n", F.sum("o").over(w_all))
    lndec = f"decimal(14,{GTEST_LN_DP})"
    nd = F.col("n").cast("double")
    ln_mi = F.round(F.log(nd * F.col("o").cast("double")
                          / (F.col("rt").cast("double")
                             * F.col("ct").cast("double"))),
                    GTEST_LN_DP).cast(lndec)
    dint = "decimal(20,0)"
    mi_term = F.col("o").cast(dint) * ln_mi
    agg = g.agg(F.max("n").cast("bigint").alias("n"),
                F.sum(mi_term).alias("_mi"))

    def _entropy(margin: DataFrame, cnt: str):
        tot = (Window.orderBy(F.lit(1))
               .rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing))
        m = margin.withColumn("_n", F.sum(cnt).over(tot))
        lnq = F.round(F.log(F.col(cnt).cast("double")
                            / F.col("_n").cast("double")),
                      GTEST_LN_DP).cast(lndec)
        return m.agg(F.sum(F.col(cnt).cast(dint) * lnq).alias("_h"))

    hx = _entropy(rows, "rt").select(F.col("_h").alias("_hx"))
    hy = _entropy(cols, "ct").select(F.col("_h").alias("_hy"))
    one = (agg.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy)))
    n_d = F.col("n").cast("double")
    mi = dec_to_double(F.col("_mi")) / n_d
    hxd = -dec_to_double(F.col("_hx")) / n_d
    hyd = -dec_to_double(F.col("_hy")) / n_d
    nmi = F.when((hxd > 0) & (hyd > 0), mi / F.sqrt(hxd * hyd))
    return one.select(
        "n",
        F.round(mi, MI_DP).alias("mi"),
        F.round(hxd, MI_DP).alias("h_x"),
        F.round(hyd, MI_DP).alias("h_y"),
        F.round(nmi, MI_DP).alias("nmi"))


def mutual_information_duck(inner_sql: str, x_col: str,
                            y_col: str) -> str:
    """DuckDB mirror of :func:`mutual_information` — same quantized
    ln terms, exact decimal sums, floor-split divisions."""
    from flink_rag_spark.operators.util import dec_to_double_duck

    dp = GTEST_LN_DP
    mi_d = dec_to_double_duck("mi_s")
    hx_d = dec_to_double_duck("hx_s")
    hy_d = dec_to_double_duck("hy_s")
    return f"""
WITH mi_src AS (
  SELECT {x_col} AS r, {y_col} AS cc FROM ({inner_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL),
obs AS (SELECT r, cc, COUNT(*) AS o FROM mi_src GROUP BY r, cc),
rt AS (SELECT r, SUM(o) AS rt FROM obs GROUP BY r),
ct AS (SELECT cc, SUM(o) AS ct FROM obs GROUP BY cc),
j AS (
  SELECT obs.o, rt.rt, ct.ct, SUM(obs.o) OVER () AS n
  FROM obs JOIN rt ON obs.r = rt.r JOIN ct ON obs.cc = ct.cc),
mi_agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         SUM(CAST(o AS DECIMAL(20,0))
             * CAST(ROUND(LN(CAST(n AS DOUBLE) * CAST(o AS DOUBLE)
                 / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))), {dp})
               AS DECIMAL(14,{dp}))) AS mi_s
  FROM j),
hx AS (
  SELECT SUM(CAST(rt AS DECIMAL(20,0))
             * CAST(ROUND(LN(CAST(rt AS DOUBLE)
                 / CAST(nn AS DOUBLE)), {dp})
               AS DECIMAL(14,{dp}))) AS hx_s
  FROM (SELECT rt, SUM(rt) OVER () AS nn FROM rt)),
hy AS (
  SELECT SUM(CAST(ct AS DECIMAL(20,0))
             * CAST(ROUND(LN(CAST(ct AS DOUBLE)
                 / CAST(nn AS DOUBLE)), {dp})
               AS DECIMAL(14,{dp}))) AS hy_s
  FROM (SELECT ct, SUM(ct) OVER () AS nn FROM ct)),
s AS (
  SELECT n,
         {mi_d} / CAST(n AS DOUBLE) AS mi,
         -({hx_d}) / CAST(n AS DOUBLE) AS hxd,
         -({hy_d}) / CAST(n AS DOUBLE) AS hyd
  FROM mi_agg CROSS JOIN hx CROSS JOIN hy)
SELECT n, ROUND(mi, {MI_DP}) AS mi,
       ROUND(hxd, {MI_DP}) AS h_x, ROUND(hyd, {MI_DP}) AS h_y,
       ROUND(CASE WHEN hxd > 0 AND hyd > 0
             THEN mi / SQRT(hxd * hyd) END, {MI_DP}) AS nmi
FROM s
"""


# ---------------------------------------- Levene's test (mean center)

LEVENE_MEAN_DP = 6


def levene_test(df: DataFrame, group_col: str, value_col: str,
                f_crit: float) -> DataFrame:
    """Levene's equal-variance test with the classical MEAN center —
    :func:`brown_forsythe` is this test with the median center (the
    robust modern default); the mean form is the textbook original
    (Levene 1960) and the one a user porting legacy SPSS/R
    ``center='mean'`` output needs. A one-way ANOVA F on
    z = |x − mean_g|; same output contract as :func:`anova_f`.

    Pure composition: per-group means from EXACT decimal sums through
    the floor-split cast, quantized to ``LEVENE_MEAN_DP`` before the
    deviations (the brown_forsythe quantized-center discipline — an
    un-quantized mean shifts every z across anova_f's 6-dp cast grid),
    broadcast back, then the exact-decimal ANOVA machinery.

    Plan at 100 TB: one grouped aggregate + one broadcast join +
    anova_f's single grouped aggregate."""
    src = df.filter(F.col(group_col).isNotNull()
                    & F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double").cast(ANOVA_DEC)
    mean = (src.groupBy(group_col)
            .agg(F.round(dec_to_double(F.sum(v))
                         / F.count(F.lit(1)).cast("double"),
                         LEVENE_MEAN_DP).alias("_mean")))
    j = (src.join(F.broadcast(mean.withColumnRenamed(group_col, "_g")),
                  src[group_col].eqNullSafe(F.col("_g")))
         .withColumn("_z", F.abs(F.col(value_col).cast("double")
                                 - F.col("_mean"))))
    return anova_f(j, group_col, "_z", f_crit)


def levene_test_duck(inner_sql: str, group_col: str, value_col: str,
                     f_crit: float) -> str:
    """DuckDB mirror of :func:`levene_test` — exact-decimal means
    feeding the anova mirror."""
    s = f"SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))"
    inner = f"""
SELECT s.{group_col}, ABS(CAST(s.{value_col} AS DOUBLE) - m._mean) AS _z
FROM ({inner_sql}) s
JOIN (SELECT {group_col} AS _g,
             ROUND({dec_to_double_duck(s)}
                   / CAST(COUNT(*) AS DOUBLE), {LEVENE_MEAN_DP}) AS _mean
      FROM ({inner_sql})
      WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL
      GROUP BY 1) m
  ON s.{group_col} IS NOT DISTINCT FROM m._g
WHERE s.{group_col} IS NOT NULL AND s.{value_col} IS NOT NULL"""
    return anova_f_duck(inner, group_col, "_z", f_crit)


# ----------------------------------- Cohen's d / Hedges' g effect size

EFFECT_DP = 6


def cohens_d(a: DataFrame, b: DataFrame, value_col: str) -> DataFrame:
    """Cohen's d with the Hedges' g small-sample correction — the
    standardized effect SIZE companion to :func:`welch_t`'s verdict
    (a significant t says the difference exists; d says whether it is
    worth acting on — the 0.2/0.5/0.8 small/medium/large convention):

        d = (m_a − m_b) / s_p,
        s_p = sqrt(((n_a−1)s_a² + (n_b−1)s_b²) / (n_a+n_b−2)),
        g = d · (1 − 3/(4(n_a+n_b) − 9))

    Output ONE row: (n_a, n_b, mean_a, mean_b, pooled_sd, d, g).
    Either side n < 2, or zero pooled variance ⇒ NULL d/g.

    Exactness: the welch_t discipline — per-side exact DECIMAL(20,6)
    Σv / Σv², every later expression the same IEEE double form.

    Plan at 100 TB: one 1-row aggregate per side crossed broadcast-
    style — no shuffle of data rows."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col).cast("double").cast(ANOVA_DEC)
        return (df.filter(F.col(value_col).isNotNull())
                .agg(F.count(F.lit(1)).alias(f"n_{tag}"),
                     F.sum(v).alias(f"_s_{tag}"),
                     F.sum(v * v).alias(f"_q_{tag}")))
    one = side(a, "a").crossJoin(F.broadcast(side(b, "b")))

    def stats(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"_s_{tag}").cast("double")
        q = F.col(f"_q_{tag}").cast("double")
        ss = F.when(F.col(f"n_{tag}") >= 2, q - s * s / n)
        return n, s / n, ss

    na, ma, ssa = stats("a")
    nb, mb, ssb = stats("b")
    sp2 = F.when((na >= 2) & (nb >= 2),
                 (ssa + ssb) / (na + nb - F.lit(2.0)))
    d = F.when(sp2 > 0, (ma - mb) / F.sqrt(sp2))
    g = d * (F.lit(1.0) - F.lit(3.0) / (4.0 * (na + nb) - F.lit(9.0)))
    return one.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(ma, EFFECT_DP).alias("mean_a"),
        F.round(mb, EFFECT_DP).alias("mean_b"),
        F.round(F.when(sp2 > 0, F.sqrt(sp2)), EFFECT_DP)
        .alias("pooled_sd"),
        F.round(d, EFFECT_DP).alias("d"),
        F.round(g, EFFECT_DP).alias("g"))


def cohens_d_duck(a_sql: str, b_sql: str, value_col: str) -> str:
    """DuckDB mirror of :func:`cohens_d` — identical decimal sums and
    double expressions."""
    dp = EFFECT_DP

    def side(sql, tag):
        return f"""
  SELECT COUNT(*) AS n_{tag},
         SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6))) AS s_{tag},
         SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6))
             * CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))
           AS q_{tag}
  FROM ({sql}) WHERE {value_col} IS NOT NULL"""

    def ss(tag):
        return (f"CASE WHEN n_{tag} >= 2 THEN "
                f"CAST(q_{tag} AS DOUBLE) "
                f"- CAST(s_{tag} AS DOUBLE) * CAST(s_{tag} AS DOUBLE) "
                f"/ CAST(n_{tag} AS DOUBLE) END")
    return f"""
WITH sa AS ({side(a_sql, 'a')}), sb AS ({side(b_sql, 'b')}),
one AS (SELECT * FROM sa CROSS JOIN sb),
st AS (
  SELECT n_a, n_b,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         CASE WHEN n_a >= 2 AND n_b >= 2 THEN
           (({ss('a')}) + ({ss('b')}))
           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0) END AS sp2
  FROM one),
eff AS (
  SELECT *,
         CASE WHEN sp2 > 0 THEN (ma - mb) / SQRT(sp2) END AS d
  FROM st)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(ma, {dp}) AS mean_a, ROUND(mb, {dp}) AS mean_b,
       ROUND(CASE WHEN sp2 > 0 THEN SQRT(sp2) END, {dp}) AS pooled_sd,
       ROUND(d, {dp}) AS d,
       ROUND(d * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE)
                                      + CAST(n_b AS DOUBLE)) - 9.0)),
             {dp}) AS g
FROM eff
"""


# -------------------------------------- point-biserial correlation


def point_biserial(df: DataFrame, flag_col, value_col: str,
                   z_crit: float = Z_CRIT) -> DataFrame:
    """Point-biserial correlation — Pearson r between a BINARY flag
    and a continuous value (the effect-size form of the two-sample
    comparison; ``flag_col`` may be a boolean column name or a Column
    predicate):

        r_pb = (m_1 − m_0)/s_n · sqrt(n_1·n_0/n²)

    with s_n the population (n-denominator) standard deviation of the
    whole sample. Output ONE row: (n, n_1, n_0, mean_1, mean_0, r_pb,
    z, significant) — z = r·√(n−1), the large-sample normal
    approximation with the threshold verdict. Either class empty or
    zero variance ⇒ NULL r/z, False verdict. NULL flags or values are
    excluded.

    Exactness: ONE grouped-by-flag aggregate of exact DECIMAL(20,6)
    sums folded to a single row — the welch_t discipline, one scan.

    Plan at 100 TB: one partial+final aggregate (2 rows) + a 1-row
    fold; no joins."""
    flag = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    v = F.col(value_col).cast("double").cast(ANOVA_DEC)
    g = (df.filter(flag.isNotNull() & F.col(value_col).isNotNull())
         .groupBy(flag.cast("boolean").alias("_f"))
         .agg(F.count(F.lit(1)).alias("_n"),
              F.sum(v).alias("_s"),
              F.sum(v * v).alias("_q")))
    one = g.agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum(F.when(F.col("_f"), F.col("_n"))).cast("bigint")
        .alias("n_1"),
        F.sum(F.when(~F.col("_f"), F.col("_n"))).cast("bigint")
        .alias("n_0"),
        F.sum(F.when(F.col("_f"), F.col("_s"))).alias("_s1"),
        F.sum(F.when(~F.col("_f"), F.col("_s"))).alias("_s0"),
        F.sum("_s").alias("_s"),
        F.sum("_q").alias("_q"))
    n = F.col("n").cast("double")
    n1 = F.col("n_1").cast("double")
    n0 = F.col("n_0").cast("double")
    m1 = F.col("_s1").cast("double") / n1
    m0 = F.col("_s0").cast("double") / n0
    s = F.col("_s").cast("double")
    q = F.col("_q").cast("double")
    var_n = (q - s * s / n) / n
    r = F.when((F.col("n_1") > 0) & (F.col("n_0") > 0) & (var_n > 0),
               (m1 - m0) / F.sqrt(var_n) * F.sqrt(n1 * n0 / (n * n)))
    z = F.when(n > 1, r * F.sqrt(n - F.lit(1.0)))
    return one.select(
        "n", "n_1", "n_0",
        F.round(m1, EFFECT_DP).alias("mean_1"),
        F.round(m0, EFFECT_DP).alias("mean_0"),
        F.round(r, EFFECT_DP).alias("r_pb"),
        F.round(z, EFFECT_DP).alias("z"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant"))


def point_biserial_duck(inner_sql: str, flag_sql: str, value_col: str,
                        z_crit: float = Z_CRIT) -> str:
    """DuckDB mirror of :func:`point_biserial` — ``flag_sql`` is the
    boolean expression rendering of the caller's flag."""
    dp = EFFECT_DP
    vdec = f"CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6))"
    return f"""
WITH pb_g AS (
  SELECT CAST({flag_sql} AS BOOLEAN) AS f, COUNT(*) AS cn,
         SUM({vdec}) AS cs, SUM({vdec} * {vdec}) AS cq
  FROM ({inner_sql})
  WHERE ({flag_sql}) IS NOT NULL AND {value_col} IS NOT NULL
  GROUP BY 1),
pb_one AS (
  SELECT CAST(SUM(cn) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN f THEN cn END) AS BIGINT) AS n_1,
         CAST(SUM(CASE WHEN NOT f THEN cn END) AS BIGINT) AS n_0,
         SUM(CASE WHEN f THEN cs END) AS s1,
         SUM(CASE WHEN NOT f THEN cs END) AS s0,
         SUM(cs) AS s, SUM(cq) AS q
  FROM pb_g),
pb_st AS (
  SELECT n, n_1, n_0,
         CAST(s1 AS DOUBLE) / CAST(n_1 AS DOUBLE) AS m1,
         CAST(s0 AS DOUBLE) / CAST(n_0 AS DOUBLE) AS m0,
         (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                              / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
           AS var_n
  FROM pb_one),
pb_r AS (
  SELECT *,
         CASE WHEN n_1 > 0 AND n_0 > 0 AND var_n > 0 THEN
           (m1 - m0) / SQRT(var_n)
           * SQRT(CAST(n_1 AS DOUBLE) * CAST(n_0 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) END AS r
  FROM pb_st)
SELECT n, n_1, n_0,
       ROUND(m1, {dp}) AS mean_1,
       ROUND(m0, {dp}) AS mean_0,
       ROUND(r, {dp}) AS r_pb,
       ROUND(CASE WHEN n > 1 THEN r * SQRT(CAST(n AS DOUBLE) - 1.0) END,
             {dp}) AS z,
       COALESCE(ABS(CASE WHEN n > 1
                    THEN r * SQRT(CAST(n AS DOUBLE) - 1.0) END)
                > {z_crit}, FALSE) AS significant
FROM pb_r
"""


# --------------------------------------------- Friedman rank test

FRIEDMAN_DP = 6
FRIEDMAN_CELL_DP = 6


def friedman_test(df: DataFrame, block_col: str, treatment_col: str,
                  value_col: str, chi2_crit: float) -> DataFrame:
    """Friedman test — the REPEATED-MEASURES member of the rank
    battery (Kruskal–Wallis compares independent groups; Friedman
    ranks k treatments WITHIN each block, removing block-level
    variation — the nonparametric two-way-ANOVA-by-ranks):

        T = (k−1)·(ΣR_j² − k·n²(k+1)²/4) / (A − n·k(k+1)²/4)

    over the within-block midranks r_ij (Conover's tie-corrected
    form; A = Σ r_ij², R_j the treatment rank sums). Output ONE row:
    (n_blocks, k, q, significant) — threshold verdict at the caller's
    dof-(k−1) critical value. Contract: replicated (block, treatment)
    observations pre-average to one cell (exact-decimal mean quantized
    to ``FRIEDMAN_CELL_DP`` — the quantized-center discipline);
    INCOMPLETE blocks (missing any treatment) are EXCLUDED, k being
    the GLOBAL distinct-treatment count; fewer than 1 complete block,
    k < 2, or all-tied ranks (zero denominator) ⇒ NULL q, False.

    Exactness: midranks enter DOUBLED — dr = 2·rank + t − 1 is an
    exact INTEGER (rank = min rank, t = tie size), so 4ΣR_j² = Σ(Σdr)²
    and 4A = Σdr² are exact DECIMAL(38,0) sums and T's quotient is one
    double expression over exact integers, engine-identical.

    Plan at 100 TB: one (block, treatment) collapse (the only
    full-data shuffle), per-BLOCK rank windows (k rows per block — no
    global sort), one treatment aggregate (k rows) + one 1-row fold."""
    src = df.filter(F.col(block_col).isNotNull()
                    & F.col(treatment_col).isNotNull()
                    & F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double").cast(ANOVA_DEC)
    cells = (src.groupBy(F.col(block_col).alias("_b"),
                         F.col(treatment_col).alias("_t"))
             .agg(F.round(dec_to_double(F.sum(v))
                          / F.count(F.lit(1)).cast("double"),
                          FRIEDMAN_CELL_DP).alias("_v")))
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    w_blk = Window.partitionBy("_b")
    cells = (cells
             .withColumn("_k", F.size(F.collect_set("_t").over(w_all)))
             .withColumn("_bk", F.count(F.lit(1)).over(w_blk))
             .filter(F.col("_bk") == F.col("_k")))
    w_rank = Window.partitionBy("_b").orderBy("_v")
    w_tie = Window.partitionBy("_b", "_v")
    d38 = "decimal(38,0)"
    # doubled midrank: 2·(minrank + (t−1)/2) = 2·rank + t − 1, integer
    ranked = cells.withColumn(
        "_dr", (F.lit(2) * F.rank().over(w_rank)
                + F.count(F.lit(1)).over(w_tie) - F.lit(1)).cast(d38))
    by_t = (ranked.groupBy("_t")
            .agg(F.sum("_dr").alias("_rj"),
                 F.sum(F.col("_dr") * F.col("_dr")).alias("_a2"),
                 F.count(F.lit(1)).alias("_nb")))
    one = by_t.agg(
        F.max("_nb").cast("bigint").alias("n_blocks"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("_rj") * F.col("_rj")).alias("_sr2"),
        F.sum("_a2").alias("_sa2"))
    n = F.col("n_blocks").cast("double")
    k = F.col("k").cast("double")
    kp1 = k + F.lit(1.0)
    num = (F.col("_sr2").cast("double") - k * n * n * kp1 * kp1)
    den = (F.col("_sa2").cast("double") - n * k * kp1 * kp1)
    q = F.when((F.col("k") >= 2) & (F.col("n_blocks") >= 1) & (den > 0),
               (k - F.lit(1.0)) * num / den)
    return one.select(
        "n_blocks", "k",
        F.round(q, FRIEDMAN_DP).alias("q"),
        F.coalesce(q > F.lit(chi2_crit), F.lit(False))
        .alias("significant"))


def friedman_test_duck(inner_sql: str, block_col: str,
                       treatment_col: str, value_col: str,
                       chi2_crit: float) -> str:
    """DuckDB mirror of :func:`friedman_test` — same cell averaging,
    complete-block filter, doubled-midrank integers."""
    s = f"SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))"
    return f"""
WITH fr_src AS (
  SELECT {block_col} AS b, {treatment_col} AS t, {value_col} AS v
  FROM ({inner_sql})
  WHERE {block_col} IS NOT NULL AND {treatment_col} IS NOT NULL
    AND {value_col} IS NOT NULL),
fr_cells AS (
  SELECT b, t,
         ROUND({dec_to_double_duck(s.replace(value_col, 'v'))}
               / CAST(COUNT(*) AS DOUBLE), {FRIEDMAN_CELL_DP}) AS v
  FROM fr_src GROUP BY b, t),
fr_k AS (SELECT COUNT(DISTINCT t) AS k FROM fr_cells),
fr_complete AS (
  SELECT c.* FROM fr_cells c
  JOIN (SELECT b, COUNT(*) AS bk FROM fr_cells GROUP BY b) g
    ON c.b = g.b
  CROSS JOIN fr_k WHERE g.bk = fr_k.k),
fr_ranked AS (
  SELECT b, t,
         CAST(2 * RANK() OVER (PARTITION BY b ORDER BY v)
              + COUNT(*) OVER (PARTITION BY b, v) - 1
              AS DECIMAL(38,0)) AS dr
  FROM fr_complete),
fr_by_t AS (
  SELECT t, SUM(dr) AS rj, SUM(dr * dr) AS a2, COUNT(*) AS nb
  FROM fr_ranked GROUP BY t),
fr_one AS (
  SELECT CAST(MAX(nb) AS BIGINT) AS n_blocks,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(rj * rj) AS sr2, SUM(a2) AS sa2
  FROM fr_by_t),
fr_q AS (
  SELECT *,
         CASE WHEN k >= 2 AND n_blocks >= 1
                   AND (CAST(sa2 AS DOUBLE)
                        - CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
                          * (CAST(k AS DOUBLE) + 1.0)
                          * (CAST(k AS DOUBLE) + 1.0)) > 0 THEN
           (CAST(k AS DOUBLE) - 1.0)
           * (CAST(sr2 AS DOUBLE)
              - CAST(k AS DOUBLE) * CAST(n_blocks AS DOUBLE)
                * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
                * (CAST(k AS DOUBLE) + 1.0))
           / (CAST(sa2 AS DOUBLE)
              - CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
                * (CAST(k AS DOUBLE) + 1.0) * (CAST(k AS DOUBLE) + 1.0))
         END AS q
  FROM fr_one)
SELECT n_blocks, k, ROUND(q, {FRIEDMAN_DP}) AS q,
       COALESCE(q > {chi2_crit}, FALSE) AS significant
FROM fr_q
"""


# ------------------------------------------------- Cochran's Q test


def cochran_q(df: DataFrame, block_col: str, treatment_col: str,
              success_col, chi2_crit: float) -> DataFrame:
    """Cochran's Q — the BINARY-outcome member of the repeated-
    measures family (Friedman ranks values; Q compares k SUCCESS
    RATES measured on the same blocks — "did conversion differ across
    the k variants each cohort saw?"):

        Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)

    with C_j treatment success totals, R_i block success totals, N
    total successes, all over COMPLETE blocks only. Output ONE row:
    (n_blocks, k, q, significant) — threshold verdict at dof k−1.
    Contract: replicated cells collapse by MAX (any success counts —
    document upstream if another fold is wanted); incomplete blocks
    are excluded; zero denominator (every block all-success or
    all-failure) ⇒ NULL q, False.

    Exactness: PURE INTEGER sums end to end (DECIMAL(38,0) squares);
    one double quotient at the end.

    Plan at 100 TB: one (block, treatment) collapse, one block
    aggregate + one treatment aggregate on it, a 1-row fold."""
    succ = (F.col(success_col) if isinstance(success_col, str)
            else success_col)
    src = df.filter(F.col(block_col).isNotNull()
                    & F.col(treatment_col).isNotNull()
                    & succ.isNotNull())
    cells = (src.groupBy(F.col(block_col).alias("_b"),
                         F.col(treatment_col).alias("_t"))
             .agg(F.max(succ.cast("boolean")).cast("int").alias("_x")))
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    w_blk = Window.partitionBy("_b")
    cells = (cells
             .withColumn("_k", F.size(F.collect_set("_t").over(w_all)))
             .withColumn("_bk", F.count(F.lit(1)).over(w_blk))
             .filter(F.col("_bk") == F.col("_k")))
    d38 = "decimal(38,0)"
    by_b = (cells.groupBy("_b")
            .agg(F.sum("_x").cast(d38).alias("_ri")))
    by_t = (cells.groupBy("_t")
            .agg(F.sum("_x").cast(d38).alias("_cj"),
                 F.count(F.lit(1)).alias("_nb")))
    tt = by_t.agg(
        F.max("_nb").cast("bigint").alias("n_blocks"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("_cj") * F.col("_cj")).alias("_sc2"),
        F.sum("_cj").alias("_n"))
    bb = by_b.agg(F.sum(F.col("_ri") * F.col("_ri")).alias("_sr2"))
    one = tt.crossJoin(F.broadcast(bb))
    k = F.col("k").cast("double")
    nn = F.col("_n").cast("double")
    num = k * F.col("_sc2").cast("double") - nn * nn
    den = k * nn - F.coalesce(F.col("_sr2").cast("double"), F.lit(0.0))
    q = F.when((F.col("k") >= 2) & (den > 0),
               (k - F.lit(1.0)) * num / den)
    return one.select(
        "n_blocks", "k",
        F.round(q, FRIEDMAN_DP).alias("q"),
        F.coalesce(q > F.lit(chi2_crit), F.lit(False))
        .alias("significant"))


def cochran_q_duck(inner_sql: str, block_col: str, treatment_col: str,
                   success_sql: str, chi2_crit: float) -> str:
    """DuckDB mirror of :func:`cochran_q` — ``success_sql`` is the
    boolean expression rendering of the caller's flag."""
    return f"""
WITH cq_src AS (
  SELECT {block_col} AS b, {treatment_col} AS t,
         CAST({success_sql} AS BOOLEAN) AS x
  FROM ({inner_sql})
  WHERE {block_col} IS NOT NULL AND {treatment_col} IS NOT NULL
    AND ({success_sql}) IS NOT NULL),
cq_cells AS (
  SELECT b, t, CAST(MAX(x) AS INT) AS x FROM cq_src GROUP BY b, t),
cq_k AS (SELECT COUNT(DISTINCT t) AS k FROM cq_cells),
cq_complete AS (
  SELECT c.* FROM cq_cells c
  JOIN (SELECT b, COUNT(*) AS bk FROM cq_cells GROUP BY b) g
    ON c.b = g.b
  CROSS JOIN cq_k WHERE g.bk = cq_k.k),
cq_b AS (SELECT b, CAST(SUM(x) AS DECIMAL(38,0)) AS ri
         FROM cq_complete GROUP BY b),
cq_t AS (SELECT t, CAST(SUM(x) AS DECIMAL(38,0)) AS cj,
                COUNT(*) AS nb
         FROM cq_complete GROUP BY t),
cq_tt AS (
  SELECT CAST(MAX(nb) AS BIGINT) AS n_blocks,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(cj * cj) AS sc2, SUM(cj) AS n
  FROM cq_t),
cq_bb AS (SELECT SUM(ri * ri) AS sr2 FROM cq_b),
cq_one AS (SELECT * FROM cq_tt CROSS JOIN cq_bb),
cq_q AS (
  SELECT *,
         CASE WHEN k >= 2
                   AND (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)
                        - COALESCE(CAST(sr2 AS DOUBLE), 0.0)) > 0 THEN
           (CAST(k AS DOUBLE) - 1.0)
           * (CAST(k AS DOUBLE) * CAST(sc2 AS DOUBLE)
              - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
           / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)
              - COALESCE(CAST(sr2 AS DOUBLE), 0.0)) END AS q
  FROM cq_one)
SELECT n_blocks, k, ROUND(q, {FRIEDMAN_DP}) AS q,
       COALESCE(q > {chi2_crit}, FALSE) AS significant
FROM cq_q
"""


# --------------------------- ordinal association: gamma / Somers / τ-c

ORDASSOC_DP = 6


def ordinal_association(df: DataFrame, x_col: str,
                        y_col: str) -> DataFrame:
    """The concordance-family ordinal-association coefficients beside
    :func:`kendall_tau`'s τ-b — the three a cross-tab consumer asks
    for next, all from the SAME concordant/discordant pair counts
    (same grid contract: rows collapse to distinct (x, y) cells, pairs
    are C(m,2) over cells — bin continuous columns first):

        gamma       = (C − D) / (C + D)          (Goodman–Kruskal)
        somers_d_yx = (C − D) / (n0 − n1)        (y predicted by x)
        somers_d_xy = (C − D) / (n0 − n2)        (x predicted by y)
        tau_c       = 2m(C − D) / (n²(m − 1))    (Stuart; m = min(r,c))

    with n0 = n(n−1)/2, n1/n2 the x/y tie-pair counts, r/c the
    distinct x/y counts. Output ONE row: (n, gamma, somers_d_yx,
    somers_d_xy, tau_c). Zero denominators ⇒ NULL for that
    coefficient; NULL-in-either rows are excluded.

    Exactness: the kendall discipline — C, D, tie sums and distinct
    counts are exact integers; each coefficient is one double
    expression over them."""
    src = (df.filter(F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull())
           .select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y")))
    d38 = "decimal(38,0)"
    cells = (src.groupBy("_x", "_y")
             .agg(F.count(F.lit(1)).cast(d38).alias("_c")))
    b = cells.select(F.col("_x").alias("_x2"),
                     F.col("_y").alias("_y2"),
                     F.col("_c").alias("_c2"))
    # broadcast by the grid contract (the kendall rationale)
    pairs = cells.join(F.broadcast(b), F.col("_x2") > F.col("_x"))
    cd = pairs.agg(
        F.sum(F.when(F.col("_y2") > F.col("_y"),
                     F.col("_c") * F.col("_c2"))).alias("_conc"),
        F.sum(F.when(F.col("_y2") < F.col("_y"),
                     F.col("_c") * F.col("_c2"))).alias("_disc"))
    tx = (cells.groupBy("_x").agg(F.sum("_c").alias("_t"))
          .agg(F.sum(F.col("_t") * (F.col("_t") - 1)).alias("_t2"),
               F.count(F.lit(1)).cast("bigint").alias("_r")))
    ty = (cells.groupBy("_y").agg(F.sum("_c").alias("_u"))
          .agg(F.sum(F.col("_u") * (F.col("_u") - 1)).alias("_u2"),
               F.count(F.lit(1)).cast("bigint").alias("_cc")))
    ntot = src.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    one = (ntot.crossJoin(F.broadcast(cd))
           .crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty)))
    n = F.col("n").cast("double")
    conc = F.coalesce(F.col("_conc"), F.lit(0).cast(d38)).cast("double")
    disc = F.coalesce(F.col("_disc"), F.lit(0).cast(d38)).cast("double")
    s = conc - disc
    t2 = F.coalesce(F.col("_t2").cast("double"), F.lit(0.0))
    u2 = F.coalesce(F.col("_u2").cast("double"), F.lit(0.0))
    n0x2 = n * (n - 1)                          # 2·n0
    gamma = F.when(conc + disc > 0, s / (conc + disc))
    dyx = F.when(n0x2 - t2 > 0, 2 * s / (n0x2 - t2))
    dxy = F.when(n0x2 - u2 > 0, 2 * s / (n0x2 - u2))
    m = F.least(F.col("_r"), F.col("_cc")).cast("double")
    tau_c = F.when((m > 1) & (n > 0),
                   2 * m * s / (n * n * (m - F.lit(1.0))))
    return one.select(
        "n",
        F.round(gamma, ORDASSOC_DP).alias("gamma"),
        F.round(dyx, ORDASSOC_DP).alias("somers_d_yx"),
        F.round(dxy, ORDASSOC_DP).alias("somers_d_xy"),
        F.round(tau_c, ORDASSOC_DP).alias("tau_c"))


def ordinal_association_duck(inner_sql: str, x_col: str,
                             y_col: str) -> str:
    """DuckDB mirror of :func:`ordinal_association` — same cell grid,
    exact integer sums, identical double expressions."""
    dp = ORDASSOC_DP
    return f"""
WITH oa0 AS (
  SELECT {x_col} AS x, {y_col} AS y FROM ({inner_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL),
oa_cells AS (
  SELECT x, y, CAST(COUNT(*) AS DECIMAL(38,0)) AS c
  FROM oa0 GROUP BY x, y),
oa_cd AS (
  SELECT SUM(CASE WHEN b.y > a.y THEN a.c * b.c END) AS conc,
         SUM(CASE WHEN b.y < a.y THEN a.c * b.c END) AS disc
  FROM oa_cells a JOIN oa_cells b ON b.x > a.x),
oa_tx AS (
  SELECT SUM(t * (t - 1)) AS t2, CAST(COUNT(*) AS BIGINT) AS r
  FROM (SELECT SUM(c) AS t FROM oa_cells GROUP BY x)),
oa_ty AS (
  SELECT SUM(u * (u - 1)) AS u2, CAST(COUNT(*) AS BIGINT) AS cc
  FROM (SELECT SUM(c) AS u FROM oa_cells GROUP BY y)),
oa_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM oa0),
oa_one AS (
  SELECT * FROM oa_n CROSS JOIN oa_cd CROSS JOIN oa_tx CROSS JOIN oa_ty),
oa_st AS (
  SELECT n,
         COALESCE(CAST(conc AS DOUBLE), 0.0) AS conc,
         COALESCE(CAST(disc AS DOUBLE), 0.0) AS disc,
         COALESCE(CAST(t2 AS DOUBLE), 0.0) AS t2,
         COALESCE(CAST(u2 AS DOUBLE), 0.0) AS u2,
         CAST(LEAST(r, cc) AS DOUBLE) AS m,
         CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) AS n0x2
  FROM oa_one)
SELECT n,
       ROUND(CASE WHEN conc + disc > 0
             THEN (conc - disc) / (conc + disc) END, {dp}) AS gamma,
       ROUND(CASE WHEN n0x2 - t2 > 0
             THEN 2 * (conc - disc) / (n0x2 - t2) END, {dp})
         AS somers_d_yx,
       ROUND(CASE WHEN n0x2 - u2 > 0
             THEN 2 * (conc - disc) / (n0x2 - u2) END, {dp})
         AS somers_d_xy,
       ROUND(CASE WHEN m > 1 AND n > 0
             THEN 2 * m * (conc - disc)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (m - 1.0))
             END, {dp}) AS tau_c
FROM oa_st
"""


# ------------------------------------------------- Cohen's kappa

KAPPA_DP = 6


def cohen_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two label
    columns (two raters, two model versions, label-vs-heuristic audit
    — the agreement complement of the association grid family):

        po = Σ_l O_ll / n,   pe = Σ_l rt_l·ct_l / n²,
        kappa = (po − pe) / (1 − pe)

    Output ONE row: (n, po, pe, kappa) — pe = 1 (both raters constant
    and equal) ⇒ NULL kappa. NULL-in-either rows are excluded.

    Exactness: the grid discipline — O, margins and Σ rt·ct are exact
    integers (DECIMAL(38,0) products); po/pe/kappa are one double
    expression each.

    Plan at 100 TB: one (a, b) collapse, two margin aggregates on the
    grid, one broadcast margin equi-join, a 1-row fold."""
    src = (df.filter(F.col(a_col).isNotNull()
                     & F.col(b_col).isNotNull())
           .select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b")))
    d38 = "decimal(38,0)"
    obs = (src.groupBy("_a", "_b")
           .agg(F.count(F.lit(1)).cast(d38).alias("_o")))
    diag = obs.agg(F.sum(F.when(F.col("_a") == F.col("_b"),
                                F.col("_o"))).alias("_diag"),
                   F.sum("_o").alias("_n"))
    rows = obs.groupBy("_a").agg(F.sum("_o").alias("_rt"))
    cols = (obs.groupBy("_b").agg(F.sum("_o").alias("_ct"))
            .withColumnRenamed("_b", "_a"))
    pe = (rows.join(F.broadcast(cols), "_a")
          .agg(F.sum(F.col("_rt") * F.col("_ct")).alias("_pe_num")))
    one = diag.crossJoin(F.broadcast(pe))
    n = F.col("_n").cast("double")
    po = F.coalesce(F.col("_diag").cast("double"), F.lit(0.0)) / n
    ped = (F.coalesce(F.col("_pe_num").cast("double"), F.lit(0.0))
           / (n * n))
    kappa = F.when(ped < 1, (po - ped) / (F.lit(1.0) - ped))
    return one.select(
        F.col("_n").cast("bigint").alias("n"),
        F.round(po, KAPPA_DP).alias("po"),
        F.round(ped, KAPPA_DP).alias("pe"),
        F.round(kappa, KAPPA_DP).alias("kappa"))


def cohen_kappa_duck(inner_sql: str, a_col: str, b_col: str) -> str:
    """DuckDB mirror of :func:`cohen_kappa` — same exact-integer grid."""
    dp = KAPPA_DP
    return f"""
WITH ck0 AS (
  SELECT {a_col} AS a, {b_col} AS b FROM ({inner_sql})
  WHERE {a_col} IS NOT NULL AND {b_col} IS NOT NULL),
ck_obs AS (
  SELECT a, b, CAST(COUNT(*) AS DECIMAL(38,0)) AS o
  FROM ck0 GROUP BY a, b),
ck_diag AS (
  SELECT SUM(CASE WHEN a = b THEN o END) AS diag, SUM(o) AS n
  FROM ck_obs),
ck_pe AS (
  SELECT SUM(r.rt * c.ct) AS pe_num
  FROM (SELECT a, SUM(o) AS rt FROM ck_obs GROUP BY a) r
  JOIN (SELECT b AS a, SUM(o) AS ct FROM ck_obs GROUP BY b) c
    ON r.a = c.a),
ck_one AS (SELECT * FROM ck_diag CROSS JOIN ck_pe),
ck_st AS (
  SELECT CAST(n AS BIGINT) AS n,
         COALESCE(CAST(diag AS DOUBLE), 0.0) / CAST(n AS DOUBLE) AS po,
         COALESCE(CAST(pe_num AS DOUBLE), 0.0)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
  FROM ck_one)
SELECT n, ROUND(po, {dp}) AS po, ROUND(pe, {dp}) AS pe,
       ROUND(CASE WHEN pe < 1 THEN (po - pe) / (1.0 - pe) END, {dp})
         AS kappa
FROM ck_st
"""


# --------------------------------- Theil's uncertainty coefficient


def uncertainty_coefficient(df: DataFrame, x_col: str,
                            y_col: str) -> DataFrame:
    """Theil's uncertainty coefficient — the ASYMMETRIC normalization
    of :func:`mutual_information` ("what fraction of X's entropy does
    knowing Y remove?" — NMI is the symmetric geometric-mean form):

        U(X|Y) = I(X;Y) / H(X),   U(Y|X) = I(X;Y) / H(Y),
        U_sym  = 2·I / (H(X) + H(Y))

    Output ONE row: (n, mi, h_x, h_y, u_x_given_y, u_y_given_x,
    u_symmetric) — zero entropies ⇒ NULL for the affected ratio.

    DEFINED over :func:`mutual_information`'s 6-dp-rounded outputs
    (the Cramér's-V composition discipline — determinism inherited
    from the graded MI pipeline), so the ratios are one double
    division each."""
    base = mutual_information(df, x_col, y_col)
    mi, hx, hy = F.col("mi"), F.col("h_x"), F.col("h_y")
    return base.select(
        "n", "mi", "h_x", "h_y",
        F.round(F.when(hx > 0, mi / hx), MI_DP).alias("u_x_given_y"),
        F.round(F.when(hy > 0, mi / hy), MI_DP).alias("u_y_given_x"),
        F.round(F.when(hx + hy > 0, 2 * mi / (hx + hy)), MI_DP)
        .alias("u_symmetric"))


def uncertainty_coefficient_duck(inner_sql: str, x_col: str,
                                 y_col: str) -> str:
    """DuckDB mirror of :func:`uncertainty_coefficient` — composes the
    MI mirror identically."""
    return f"""
SELECT n, mi, h_x, h_y,
       ROUND(CASE WHEN h_x > 0 THEN mi / h_x END, {MI_DP})
         AS u_x_given_y,
       ROUND(CASE WHEN h_y > 0 THEN mi / h_y END, {MI_DP})
         AS u_y_given_x,
       ROUND(CASE WHEN h_x + h_y > 0 THEN 2 * mi / (h_x + h_y) END,
             {MI_DP}) AS u_symmetric
FROM ({mutual_information_duck(inner_sql, x_col, y_col)})
"""


# ------------------------------------------------- McNemar's test


def mcnemar_test(df: DataFrame, a_col, b_col,
                 chi2_crit: float) -> DataFrame:
    """McNemar's test — the PAIRED 2×2 marginal-homogeneity check
    beside :func:`cohen_kappa`'s agreement score (kappa asks "do the
    two labelings agree?"; McNemar asks "do they disagree
    ASYMMETRICALLY?" — did the new model flip more negatives to
    positives than vice versa on the same rows; Cochran's Q is its
    k-treatment generalization):

        chi2 = (|b − c| − 1)² / (b + c)

    with b/c the discordant counts (a∧¬b / ¬a∧b) and the classic
    continuity correction. ``a_col``/``b_col`` are boolean column
    names or Column predicates. Output ONE row: (n, n_discordant_ab,
    n_discordant_ba, chi2, significant) — threshold verdict at the
    caller's dof-1 critical value; b + c = 0 (no discordant pairs) ⇒
    NULL chi2, False. NULL-in-either rows are excluded.

    Exactness: pure integer counts from ONE aggregate; chi2 is one
    double expression.

    Plan at 100 TB: one scan-shaped partial+final aggregate — no
    shuffle of data rows, no join."""
    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    ab, bb = a.cast("boolean"), b.cast("boolean")
    agg = (df.filter(ab.isNotNull() & bb.isNotNull())
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum((ab & ~bb).cast("long")).cast("bigint")
                .alias("n_discordant_ab"),
                F.sum((~ab & bb).cast("long")).cast("bigint")
                .alias("n_discordant_ba")))
    bd = F.col("n_discordant_ab").cast("double")
    cd = F.col("n_discordant_ba").cast("double")
    num = F.abs(bd - cd) - F.lit(1.0)
    chi2 = F.when(bd + cd > 0, num * num / (bd + cd))
    return agg.select(
        "n", "n_discordant_ab", "n_discordant_ba",
        F.round(chi2, ANOVA_DP).alias("chi2"),
        F.coalesce(chi2 > F.lit(chi2_crit), F.lit(False))
        .alias("significant"))


def mcnemar_test_duck(inner_sql: str, a_sql: str, b_sql: str,
                      chi2_crit: float) -> str:
    """DuckDB mirror of :func:`mcnemar_test` — ``a_sql``/``b_sql`` are
    the boolean expression renderings."""
    return f"""
WITH mn AS (
  SELECT CAST({a_sql} AS BOOLEAN) AS a, CAST({b_sql} AS BOOLEAN) AS b
  FROM ({inner_sql})
  WHERE ({a_sql}) IS NOT NULL AND ({b_sql}) IS NOT NULL),
mn_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_discordant_ab,
         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_discordant_ba
  FROM mn),
mn_st AS (
  SELECT *,
         CASE WHEN n_discordant_ab + n_discordant_ba > 0 THEN
           (ABS(CAST(n_discordant_ab AS DOUBLE)
                - CAST(n_discordant_ba AS DOUBLE)) - 1.0)
           * (ABS(CAST(n_discordant_ab AS DOUBLE)
                  - CAST(n_discordant_ba AS DOUBLE)) - 1.0)
           / (CAST(n_discordant_ab AS DOUBLE)
              + CAST(n_discordant_ba AS DOUBLE)) END AS chi2
  FROM mn_agg)
SELECT n, n_discordant_ab, n_discordant_ba,
       ROUND(chi2, {ANOVA_DP}) AS chi2,
       COALESCE(chi2 > {chi2_crit}, FALSE) AS significant
FROM mn_st
"""
