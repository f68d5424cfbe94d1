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
from pyspark.sql import DataFrame


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
