"""Snapshot diff — change-data capture between two table versions.

A 100 TB corpus is re-curated continuously (upserts
`maintenance.upsert_into_store`, deletions `maintenance.forget_documents`,
re-scored quality); the operational question after every run is *what
changed* — for incremental re-embedding, cache invalidation, audit. The
reference has no diff surface (OpenSearch mutations are fire-and-forget,
`StreamingStoreKnowledge.java:69-71`); this module makes the diff itself
one declarative query.

Plan at 100 TB: ONE full outer join on the key — both sides shuffle
exactly once on the key (or not at all when the snapshots share a
bucketing layout, the layout `upsert_into_store` maintains), every
column comparison is a null-safe equality inside whole-stage codegen,
and the output is only the delta (added / removed / changed) — the
unchanged majority never leaves the join. No driver-side row loops, no
per-column jobs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns (key..., status, changed_csv) where status ∈ {'added',
    'removed', 'changed'} and ``changed_csv`` lists the differing
    columns (in ``compare_cols`` order) for changed rows, '' otherwise.
    Unchanged rows are dropped inside the join — the common case at
    scale is a tiny delta over a huge table. NULL-safe semantics: a
    column going NULL→value or value→NULL counts as changed; two NULLs
    are equal."""
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_o"))
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_n"))
    j = o.join(n, on=key_cols, how="full")
    diff_names = F.array_compact(F.array(*[
        F.when(~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c))
        for c in compare_cols]))
    status = (F.when(F.col("_in_o").isNull(), F.lit("added"))
              .when(F.col("_in_n").isNull(), F.lit("removed"))
              .when(F.size(diff_names) > 0, F.lit("changed")))
    return (j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .withColumn(
                "changed_csv",
                F.when(F.col("status") == "changed",
                       F.array_join(diff_names, ",")).otherwise(F.lit("")))
            .select(*key_cols, "status", "changed_csv"))


def snapshot_diff_duck(old_sql: str, new_sql: str, key_cols: list[str],
                       compare_cols: list[str]) -> str:
    """DuckDB mirror of ``snapshot_diff`` — same full outer join, same
    IS DISTINCT FROM null-safe comparison, same changed-column order."""
    keys = ", ".join(key_cols)
    key_coal = ", ".join(
        f"COALESCE(o.{k}, n.{k}) AS {k}" for k in key_cols)
    on = " AND ".join(f"o.{k} = n.{k}" for k in key_cols)
    diff_list = ", ".join(
        f"CASE WHEN o._o_{c} IS DISTINCT FROM n._n_{c} THEN '{c}' END"
        for c in compare_cols)
    o_cols = ", ".join(f"{c} AS _o_{c}" for c in compare_cols)
    n_cols = ", ".join(f"{c} AS _n_{c}" for c in compare_cols)
    return f"""
WITH o AS (SELECT {keys}, {o_cols}, TRUE AS _in_o FROM ({old_sql})),
n AS (SELECT {keys}, {n_cols}, TRUE AS _in_n FROM ({new_sql})),
j AS (
  SELECT {key_coal}, o._in_o, n._in_n,
         list_filter([{diff_list}], x -> x IS NOT NULL) AS diffs
  FROM o FULL OUTER JOIN n ON {on}),
s AS (
  SELECT {keys},
         CASE WHEN _in_o IS NULL THEN 'added'
              WHEN _in_n IS NULL THEN 'removed'
              WHEN len(diffs) > 0 THEN 'changed' END AS status,
         diffs
  FROM j)
SELECT {keys}, status,
       CASE WHEN status = 'changed'
            THEN array_to_string(diffs, ',') ELSE '' END AS changed_csv
FROM s WHERE status IS NOT NULL
"""
