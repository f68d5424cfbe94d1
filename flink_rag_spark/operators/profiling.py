"""Column profiling: per-column stats of a table in one aggregation.

The ANALYZE/data-quality pass every pipeline runs before trusting a new
drop of data: row count, null count, distinct count, min/max per column —
as a DataFrame (one row per column), so the profile itself is queryable
and diffable across drops.

Physical shape: ONE aggregate computes every column's measures (count,
distinct, min, max all share the scan), then a ``stack`` over the single
aggregate row unpivots to (col_name, ...) rows — no per-column scans, no
driver-side loop over columns issuing jobs (the naive profiling shape).

The distinct counts pick the scale story:

- ``approx=False`` (default): exact COUNT(DISTINCT) per column. Spark
  plans multi-column distinct aggregates with an Expand node — the scan's
  rows are replicated once per distinct column before the shuffle, so a
  C-column exact profile shuffles ~C× the rows. Right for test-scale and
  for the DuckDB oracle (exact values).
- ``approx=True``: HLL++ sketches (approx_count_distinct). One ordinary
  partial+final aggregate — no Expand, shuffle is one sketch per column
  per partition regardless of row count. The 100 TB default; rel. error
  ``rsd`` (2.5% default). Plan difference asserted in tests.

min/max are computed in the column's native type and THEN cast to string
(cast(min(c)) — never min(cast(c)): lexicographic string order would
corrupt numeric extremes), so one output schema fits every column type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    approx: bool = False, rsd: float = 0.025) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (F.approx_count_distinct(c, rsd) if approx
              else F.countDistinct(c))
        aggs += [F.count(F.col(c)).alias(f"{c}__nn"),
                 nd.alias(f"{c}__nd"),
                 F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                 F.max(F.col(c)).cast("string").alias(f"{c}__max")]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in cols)
    stacked = one.select(
        F.col("__n"),
        F.expr(f"stack({len(cols)}, {parts})")
        .alias("col_name", "__nn", "n_distinct", "min_value", "max_value"))
    return stacked.select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        "n_distinct", "min_value", "max_value")


def profile_columns_duck(table: str, cols: list[str]) -> str:
    """DuckDB mirror (exact path): one UNION ALL branch per column with
    identical cast-of-extreme semantics."""
    branches = []
    for c in cols:
        branches.append(f"""
SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM {table}""")
    return "\nUNION ALL\n".join(branches)


def quantile_bins(df: DataFrame, value_col: str, n_bins: int = 10,
                  out_col: str = "bin", exact: bool = True) -> DataFrame:
    """Equal-frequency (quantile) binning — the feature-discretization
    stage of a training pipeline: every row gets the 1-based index of its
    value's decile/quantile bucket, with boundaries computed from the
    data itself.

    Two-pass by nature (boundaries, then assignment), but each pass is
    one scan: the n_bins−1 boundaries aggregate to a SINGLE row that
    broadcasts back onto the assignment scan, where the bin index is
    1 + Σ (value > boundary_i) — a codegen'd conditional sum, no join
    per boundary, no shuffle beyond the boundary aggregation's own.
    Ties sit in the LOWER bin (strict >), so assignment is deterministic.

    ``exact=True`` uses interpolated ``percentile`` (≡ DuckDB
    quantile_cont — the engine-parity tier); at 100 TB pass
    ``exact=False`` for ``approx_percentile`` (t-digest-backed, one
    pass, mergeable partials) — identical plan shape, approximate
    boundaries."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fn = "percentile" if exact else "approx_percentile"
    ps = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(*[
        F.expr(f"{fn}({value_col}, {p!r})").alias(f"_qb{i}")
        for i, p in enumerate(ps)])
    idx = F.lit(1)
    for i in range(len(ps)):
        idx = idx + F.when(F.col(value_col) > F.col(f"_qb{i}"), 1) \
                     .otherwise(0)
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn(out_col, idx.cast("int"))
            .drop(*[f"_qb{i}" for i in range(len(ps))]))


def quantile_bins_duck(table: str, value_col: str, n_bins: int,
                       select_cols: str, out_col: str = "bin") -> str:
    """DuckDB mirror of the exact path: quantile_cont boundaries, same
    strict-> conditional sum, same 1-based index."""
    ps = [i / n_bins for i in range(1, n_bins)]
    bs = ", ".join(f"quantile_cont({value_col}, {p!r}) AS _qb{i}"
                   for i, p in enumerate(ps))
    terms = " + ".join(
        f"(CASE WHEN {value_col} > _qb{i} THEN 1 ELSE 0 END)"
        for i in range(len(ps)))
    return f"""
WITH b AS (SELECT {bs} FROM {table})
SELECT {select_cols}, CAST(1 + {terms} AS INT) AS {out_col}
FROM {table}, b
"""
