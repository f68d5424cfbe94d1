"""Privacy auditing — k-anonymity over quasi-identifier combinations.

Regex PII redaction (`operators/redaction.py`) scrubs direct
identifiers; the remaining re-identification risk in a released corpus
is the QUASI-identifier combination (segment × nation × age band …)
that is rare enough to single someone out. The k-anonymity audit is the
standard measure: every QI combination must be shared by ≥ k rows.

Plan at 100 TB: the audit is ONE partial+final aggregate over the QI
columns (map-side combine collapses the corpus to the QI-combination
cardinality); the suppression pass is a broadcast semi join of the
at-risk combinations back onto the scan — at-risk groups are small *by
definition* (each has < k rows), so the broadcast side is bounded by
k · |at-risk combinations|. No window, no second full shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def k_anonymity_audit(df: DataFrame, qi_cols: list[str],
                      k: int) -> DataFrame:
    """Per-QI-combination audit: (qi..., group_size, at_risk).

    ``at_risk`` marks combinations with fewer than ``k`` rows — the rows
    a release would have to suppress or generalize. NULL QI values are
    audited as their own combination (a NULL segment still identifies).
    The overall k-anonymity level of the table is
    ``min(group_size)`` over this result."""
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("group_size"))
            .withColumn("at_risk", F.col("group_size") < k))


def suppress_below_k(df: DataFrame, qi_cols: list[str],
                     k: int) -> DataFrame:
    """The enforcement twin: drop every row whose QI combination has
    fewer than ``k`` occurrences, leaving a table that IS k-anonymous
    on ``qi_cols``. Anti join against the at-risk combination set —
    NULL-SAFE on every QI column, because the audit treats NULL as a
    combination value and a plain equality anti join would let an
    at-risk NULL-QI group slip through.

    The at-risk set is k-bounded per combination but NOT corpus-bounded
    in combination count (near-unique QIs make it corpus-scale), so the
    join strategy is deliberately left to AQE: it broadcasts when the
    runtime size fits and falls back to a shuffle join when it doesn't —
    no forced hint that could OOM the driver at 100 TB."""
    risky = (k_anonymity_audit(df, qi_cols, k)
             .filter(F.col("at_risk"))
             .select(*[F.col(c).alias(f"_r_{c}") for c in qi_cols]))
    cond = None
    for c in qi_cols:
        eq = df[c].eqNullSafe(F.col(f"_r_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(risky, cond, "left_anti")


def l_diversity_audit(df: DataFrame, qi_cols: list[str],
                      sensitive_col: str, l: int) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    necessary complement: a QI group can be large (k-anonymous) yet
    still leak if every member shares the SAME sensitive value, so each
    combination must contain at least ``l`` DISTINCT sensitive values.
    Returns (qi..., group_size, n_sensitive, at_risk) with ``at_risk``
    marking combinations whose sensitive diversity is below ``l``.

    NULL QI values are audited as their own combination (the k-anon
    stance); NULL SENSITIVE values add no diversity (count(DISTINCT)
    skips NULLs identically in both engines — an unknown diagnosis
    doesn't protect the known ones). The table's l-diversity level is
    ``min(n_sensitive)`` over this result.

    Plan at 100 TB: ONE partial+final aggregate over the QI columns —
    count + exact countDistinct share the grouping; the distinct
    expansion is bounded by rows, and at extreme sensitive cardinality
    the documented swap is approx_count_distinct (the evaluation then
    becomes an accuracy contract, like the HLL rollup)."""
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("group_size"),
                 F.countDistinct(F.col(sensitive_col))
                 .cast("bigint").alias("n_sensitive"))
            .withColumn("at_risk", F.col("n_sensitive") < l))


def l_diversity_audit_duck(inner_sql: str, qi_cols: list[str],
                           sensitive_col: str, l: int) -> str:
    """DuckDB mirror of :func:`l_diversity_audit`."""
    qs = ", ".join(qi_cols)
    return f"""
SELECT {qs}, COUNT(*) AS group_size,
       CAST(COUNT(DISTINCT {sensitive_col}) AS BIGINT) AS n_sensitive,
       COUNT(DISTINCT {sensitive_col}) < {l} AS at_risk
FROM ({inner_sql}) GROUP BY {qs}
"""


def k_anonymity_audit_duck(inner_sql: str, qi_cols: list[str],
                           k: int) -> str:
    """DuckDB mirror of :func:`k_anonymity_audit`."""
    qs = ", ".join(qi_cols)
    return f"""
SELECT {qs}, COUNT(*) AS group_size, COUNT(*) < {k} AS at_risk
FROM ({inner_sql}) GROUP BY {qs}
"""


def suppress_below_k_duck(inner_sql: str, qi_cols: list[str],
                          k: int) -> str:
    """DuckDB mirror of :func:`suppress_below_k` — the join is
    IS NOT DISTINCT FROM on every QI column (USING would silently drop
    every NULL-QI row, even safe ones), and the count alias is
    collision-proofed against QI columns named ``n``."""
    on = " AND ".join(
        f"src.{c} IS NOT DISTINCT FROM sizes.{c}" for c in qi_cols)
    gs = ", ".join(qi_cols)
    return f"""
WITH src AS (SELECT * FROM ({inner_sql})),
sizes AS (SELECT {gs}, COUNT(*) AS __grp_n FROM src GROUP BY {gs})
SELECT src.* FROM src
JOIN sizes ON {on}
WHERE sizes.__grp_n >= {k}
"""


# ------------------------------------------------- t-closeness audit

TCLOSE_TERM_DP = 9
TCLOSE_DP = 6


def t_closeness_audit(df: DataFrame, qi_cols: list[str],
                      sensitive_col: str, t: float,
                      ordered: bool = True) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    distributional tightening of :func:`l_diversity_audit`: a QI group
    can be l-diverse yet still leak when its sensitive-value
    DISTRIBUTION skews far from the table's (all-but-one member with
    the same diagnosis). Each combination's Earth Mover's Distance to
    the GLOBAL sensitive distribution must stay ≤ t:

    * ``ordered=True`` (numeric/ordinal sensitive values): the 1-D EMD
      closed form EMD = Σ_i |Σ_{j≤i}(p_g − p)| / (m−1) over the m
      distinct values in order — mass moves along the value axis;
    * ``ordered=False`` (categorical): equal ground distance, EMD =
      total-variation Σ|p_g − p| / 2.

    Output: (qi..., group_size, emd, at_risk) with at_risk = emd > t.
    NULL QI values audit as their own combination (the k-anon stance);
    NULL sensitive rows are excluded from BOTH the group and global
    distributions (an unknown outcome carries no disclosure mass —
    the l-diversity stance). A single distinct sensitive value ⇒ every
    distribution is identical ⇒ emd = 0.

    Exactness: the p_g(v) − p(v) integer-ratio doubles quantize to
    9-dp DECIMAL per grid cell, so the cumulative and absolute sums
    are exact decimal arithmetic; the final /(m−1) (or /2) and 6-dp
    round are identical double expressions in both engines.

    Plan at 100 TB: one m-bounded global value frame (broadcast), one
    (|groups|·m)-bounded grid via crossJoin against it, one left join
    of the grouped counts onto the grid (absent cells carry p_g = 0 —
    dropping them is the classic wrong answer), one ordered window per
    group over m rows, one final |groups|-row aggregate. The full-data
    work is the two grouped counts."""
    src = df.filter(F.col(sensitive_col).isNotNull())
    v = F.col(sensitive_col).alias("_v")
    vals = src.groupBy(v).agg(F.count(F.lit(1)).alias("_nv"))
    tot = vals.agg(F.sum("_nv").alias("_N"),
                   F.count(F.lit(1)).alias("_m"))
    groups = src.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("_ng"))
    cells = src.groupBy(*qi_cols, v).agg(F.count(F.lit(1)).alias("_ngv"))
    grid = (groups.crossJoin(F.broadcast(vals))
            .crossJoin(F.broadcast(tot)))
    cond = F.col("_v").eqNullSafe(F.col("_cv"))
    for c in qi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_c_{c}"))
    cells_r = cells.select(
        *[F.col(c).alias(f"_c_{c}") for c in qi_cols],
        F.col("_v").alias("_cv"), "_ngv")
    dec9 = f"decimal(30,{TCLOSE_TERM_DP})"
    diff = F.round(
        F.coalesce(F.col("_ngv"), F.lit(0)).cast("double")
        / F.col("_ng")
        - F.col("_nv").cast("double") / F.col("_N"),
        TCLOSE_TERM_DP).cast(dec9)
    j = (grid.join(cells_r, cond, "left")
         .select(*qi_cols, "_v", "_ng", "_m", diff.alias("_d")))
    w_cum = (Window.partitionBy(*qi_cols).orderBy("_v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    j = j.withColumn("_cum", F.sum("_d").over(w_cum))
    term = F.abs(F.col("_cum")) if ordered else F.abs(F.col("_d"))
    per_g = (j.groupBy(*qi_cols)
             .agg(F.max("_ng").cast("bigint").alias("group_size"),
                  F.max("_m").alias("_m"),
                  F.sum(term).alias("_e")))
    denom = (F.col("_m") - F.lit(1)).cast("double") if ordered \
        else F.lit(2.0)
    emd = F.when(F.col("_m") <= 1, F.lit(0.0)) \
        .otherwise(F.col("_e").cast("double") / denom)
    return per_g.select(
        *qi_cols, "group_size",
        F.round(emd, TCLOSE_DP).alias("emd"),
        (emd > t).alias("at_risk"))


def t_closeness_audit_duck(inner_sql: str, qi_cols: list[str],
                           sensitive_col: str, t: float,
                           ordered: bool = True) -> str:
    """DuckDB mirror of :func:`t_closeness_audit` — the same full grid,
    9-dp cell quantization, and cumulative/total-variation fold."""
    dp, odp = TCLOSE_TERM_DP, TCLOSE_DP
    qs = ", ".join(qi_cols)
    on = " AND ".join(
        [f"c.{q} IS NOT DISTINCT FROM g.{q}" for q in qi_cols]
        + ["c._v IS NOT DISTINCT FROM v._v"])
    term = "ABS(cum)" if ordered else "ABS(d)"
    denom = "(CAST(m AS DOUBLE) - 1.0)" if ordered else "2.0"
    return f"""
WITH tc0 AS (SELECT * FROM ({inner_sql})
             WHERE {sensitive_col} IS NOT NULL),
v AS (SELECT {sensitive_col} AS _v, COUNT(*) AS nv
      FROM tc0 GROUP BY 1),
tot AS (SELECT SUM(nv) AS N, COUNT(*) AS m FROM v),
g AS (SELECT {qs}, COUNT(*) AS ng FROM tc0 GROUP BY {qs}),
c AS (SELECT {qs}, {sensitive_col} AS _v, COUNT(*) AS ngv
      FROM tc0 GROUP BY {qs}, {sensitive_col}),
grid AS (
  SELECT g.*, v._v, v.nv, tot.N, tot.m,
         CAST(ROUND(COALESCE(c.ngv, 0) / CAST(g.ng AS DOUBLE)
                    - v.nv / CAST(tot.N AS DOUBLE), {dp})
              AS DECIMAL(30,{dp})) AS d
  FROM g CROSS JOIN v CROSS JOIN tot
  LEFT JOIN c ON {on}),
cum AS (
  SELECT *, SUM(d) OVER (PARTITION BY {qs} ORDER BY _v
             ROWS UNBOUNDED PRECEDING) AS cum
  FROM grid),
per_g AS (
  SELECT {qs}, CAST(MAX(ng) AS BIGINT) AS group_size,
         MAX(m) AS m, SUM({term}) AS e
  FROM cum GROUP BY {qs})
SELECT {qs}, group_size,
       ROUND(CASE WHEN m <= 1 THEN 0.0
             ELSE CAST(e AS DOUBLE) / {denom} END, {odp}) AS emd,
       (CASE WHEN m <= 1 THEN 0.0
        ELSE CAST(e AS DOUBLE) / {denom} END) > {t!r} AS at_risk
FROM per_g
"""
