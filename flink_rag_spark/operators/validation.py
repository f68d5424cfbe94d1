"""Rule-based data validation — the expectation-check stage of a data
pipeline (Great-Expectations-shaped; ABSENT in the reference): evaluate a
set of named boolean rules over a table and report, per rule, how many
rows violate it — plus table-level expectations (key uniqueness) that no
row-local predicate can express.

Plan at 100 TB: ALL row-local rules evaluate in ONE aggregate pass over
one scan (each rule is a conditional count — no per-rule jobs, no
shuffle beyond the single final-aggregation exchange), and the
uniqueness check rides the same pass as count - countDistinct over the
key. The per-rule report unpivots from that single row via stack —
|rules| output rows, never a second scan. ``violating_rows`` is the
debugging companion: one filtered scan returning offending rows with the
list of rules each breaks (pushdown-friendly OR of the negated rules).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def validate(df: DataFrame, rules: dict[str, str],
             unique_key: str | None = None) -> DataFrame:
    """(rule, violations, passed) — one aggregate pass for every rule.

    ``rules`` maps rule name → SQL boolean expression that must hold for
    every row (NULL counts as a violation: an unevaluable expectation is
    a failed one). ``unique_key``: also check that the column's values
    are unique (violations = n_rows − n_distinct, the number of surplus
    duplicate rows)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.sum(F.when(F.expr(expr), 0).otherwise(1)).alias(name)
            for name, expr in rules.items()]
    if unique_key is not None:
        aggs.append((F.count(F.col(unique_key))
                     - F.countDistinct(F.col(unique_key)))
                    .alias(f"unique_{unique_key}"))
    one = df.agg(*aggs)
    names = list(rules) + ([f"unique_{unique_key}"]
                           if unique_key is not None else [])
    stack = ", ".join(f"'{n}', cast(`{n}` as bigint)" for n in names)
    return (one.select(F.expr(
        f"stack({len(names)}, {stack}) as (rule, violations)"))
        .withColumn("passed", F.col("violations") == 0))


def violating_rows(df: DataFrame, rules: dict[str, str],
                   id_col: str) -> DataFrame:
    """(id, failed_rules array<string>) for rows breaking ≥1 rule — the
    drill-down companion to ``validate``; the filter is the OR of the
    negated rules, so clean tables scan once and return nothing."""
    if not rules:
        raise ValueError("rules must be non-empty")
    flags = [F.when(~F.coalesce(F.expr(e), F.lit(False)), F.lit(n))
             for n, e in rules.items()]
    arr = F.array_compact(F.array(*flags)).alias("failed_rules")
    return (df.select(F.col(id_col), arr)
            .filter(F.size("failed_rules") > 0))


def validate_duck(table: str, rules: dict[str, str],
                  unique_key: str | None = None) -> str:
    """DuckDB mirror of ``validate`` — same one-pass conditional counts,
    same NULL-is-violation semantics, same unique-key surplus count."""
    parts = [
        f"SELECT '{n}' AS rule, "
        f"CAST(SUM(CASE WHEN ({e}) THEN 0 ELSE 1 END) AS BIGINT) "
        f"AS violations FROM {table}"
        for n, e in rules.items()]
    if unique_key is not None:
        parts.append(
            f"SELECT 'unique_{unique_key}' AS rule, "
            f"COUNT({unique_key}) - COUNT(DISTINCT {unique_key}) "
            f"AS violations FROM {table}")
    union = " UNION ALL ".join(parts)
    return (f"SELECT rule, violations, violations = 0 AS passed "
            f"FROM ({union})")


# --------------------------------------------- referential integrity

def fk_integrity_audit(relations) -> "DataFrame":
    """Referential-integrity audit across tables: for each named
    relationship ``(name, facts, fact_key, dims, dim_key)``, count the
    fact rows whose key resolves nowhere in the dimension — the orphan
    check every warehouse load gate runs (the cross-TABLE complement of
    this module's row-local expectations). NULL fact keys are counted
    separately (a NULL is a missing link, not an orphan). Output: one
    row per relationship — (relation, n_rows, n_null_keys, n_orphans,
    orphan_rate).

    Plan: per relationship, ONE left join of the fact keys onto the
    DISTINCT dimension keys (AQE broadcasts the dimension side) feeding
    ONE fused aggregate — total rows, NULL keys and orphans are three
    conditional counts over the same pass, so each relation costs one
    fact scan instead of three, and the per-relation 1-row frames union
    LAZILY: Spark schedules all |relations| branches inside a single
    job rather than |relations|×3 driver-serialized actions (the
    round-9 plan this replaces ran facts.count(), a null-filter count
    and an anti-join count per relation)."""
    import pyspark.sql.functions as F

    out = None
    for name, facts, fact_key, dims, dim_key in relations:
        dk = dims.select(F.col(dim_key).alias("_dk")).distinct()
        joined = (facts.select(F.col(fact_key).alias("_fk"))
                  .join(dk, F.col("_fk") == F.col("_dk"), "left"))
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("_fk").isNull(), 1))
             .alias("n_null_keys"),
            F.count(F.when(F.col("_fk").isNotNull()
                           & F.col("_dk").isNull(), 1))
             .alias("n_orphans"))
        row = agg.select(
            F.lit(name).alias("relation"),
            "n_rows", "n_null_keys", "n_orphans",
            F.when(F.col("n_rows") > 0,
                   F.round(F.col("n_orphans")
                           / F.col("n_rows").cast("double"), 6))
             .otherwise(F.lit(0.0)).alias("orphan_rate"))
        out = row if out is None else out.unionByName(row)
    return out


def fk_integrity_audit_duck(relations: list[tuple]) -> str:
    """DuckDB mirror of :func:`fk_integrity_audit`; ``relations`` is a
    list of (name, fact_table, fact_key, dim_table, dim_key)."""
    parts = []
    for name, ft, fk, dt, dk in relations:
        parts.append(f"""
SELECT '{name}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER ({fk} IS NULL) AS BIGINT) AS n_null_keys,
       CAST(COUNT(*) FILTER ({fk} IS NOT NULL AND NOT EXISTS (
           SELECT 1 FROM {dt} d WHERE d.{dk} = f.{fk})) AS BIGINT)
         AS n_orphans,
       ROUND(COUNT(*) FILTER ({fk} IS NOT NULL AND NOT EXISTS (
           SELECT 1 FROM {dt} d WHERE d.{dk} = f.{fk}))
             / CAST(COUNT(*) AS DOUBLE), 6) AS orphan_rate
FROM {ft} f""")
    return " UNION ALL ".join(parts)
