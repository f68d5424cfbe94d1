"""Approximate string matching — blocked fuzzy joins for record linkage.

Entity resolution across noisy sources (vendor names, product titles,
user-typed fields) needs a similarity join on STRINGS the way the dedup
family needs one on documents — and the same scale discipline applies:
never all-pairs; candidates from an equi-join on a cheap BLOCKING key,
then an exact edit-distance verify on candidates only (the classic
blocking/windowing recipe of the record-linkage literature,
Fellegi-Sunter lineage).

Spark-first shape:

- the blocking key is any SQL expression over the string (default: the
  2-char lowercase prefix; pass e.g. the last token for
  structured names) — the candidate join is a plain shuffled equi-join
  on it, so only block-mates ever meet;
- a LENGTH-BAND prune (|len(a) − len(b)| ≤ d is a necessary condition
  for levenshtein ≤ d) cuts candidates before any edit distance runs —
  a codegen'd filter;
- the verify is Spark's built-in ``levenshtein`` WITH the threshold
  argument, which abandons a pair as soon as the running distance
  exceeds ``max_distance`` (O(d·min(m,n)) instead of O(m·n) per pair) —
  JVM codegen, no Python anywhere.

Like LSH bucketing, blocking trades recall for tractability: two
strings in different blocks are never compared (choose the key so true
matches share it — prefixes for typo workloads, a token for
structured names). ``block_stats`` is the observability surface for hot
blocks, the analog of dedup's ``lsh_bucket_stats``; a degenerate block
(every row blocking to one key) degrades to the all-pairs join blocking
exists to avoid, so watch it, then tighten the key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: 2-char lowercase prefix — the standard typo-workload blocking key
DEFAULT_BLOCK = "substring(lower({s}), 1, 2)"


def fuzzy_join_pairs(left: DataFrame, right: DataFrame,
                     left_id: str, left_str: str,
                     right_id: str, right_str: str,
                     max_distance: int = 2,
                     block_expr: str = DEFAULT_BLOCK) -> DataFrame:
    """(id_a, id_b, str_a, str_b, distance) — every cross-frame pair
    sharing a block whose Levenshtein distance ≤ ``max_distance``.
    ``block_expr`` is a SQL template over ``{s}``; both sides use the
    same expression so the join key is comparable."""
    lb = left.select(F.col(left_id).alias("id_a"),
                     F.col(left_str).alias("str_a"),
                     F.expr(block_expr.format(s=left_str)).alias("_blk"))
    rb = right.select(F.col(right_id).alias("id_b"),
                      F.col(right_str).alias("str_b"),
                      F.expr(block_expr.format(s=right_str)).alias("_blk"))
    cand = (lb.join(rb, on="_blk")
            .filter(F.abs(F.length("str_a") - F.length("str_b"))
                    <= max_distance))
    # threshold form early-abandons above max_distance (returns -1)
    out = (cand.withColumn(
        "distance", F.levenshtein("str_a", "str_b", max_distance))
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "str_a", "str_b", "distance"))
    return out


def fuzzy_self_pairs(df: DataFrame, str_col: str,
                     max_distance: int = 2,
                     block_expr: str = DEFAULT_BLOCK) -> DataFrame:
    """(str_a, str_b, distance) over the DISTINCT values of ``str_col``,
    str_a < str_b — the near-miss report for one column (variant
    spellings, typo clusters). Distinct first: the self-join runs over
    the value VOCABULARY, not the row count, so a 100 TB column with
    10^5 distinct values verifies ≤ blocked |V|² pairs."""
    vals = df.select(F.col(str_col).alias("v")).distinct()
    pairs = fuzzy_join_pairs(vals, vals, "v", "v", "v", "v",
                             max_distance=max_distance,
                             block_expr=block_expr)
    return (pairs.filter(F.col("str_a") < F.col("str_b"))
            .select("str_a", "str_b", "distance"))


def block_stats(df: DataFrame, str_col: str,
                block_expr: str = DEFAULT_BLOCK) -> DataFrame:
    """(block, n) sizes of every block — run before a big fuzzy join to
    catch degenerate keys (the hot-bucket guard's observability twin)."""
    return (df.select(F.expr(block_expr.format(s=str_col)).alias("block"))
            .groupBy("block").agg(F.count(F.lit(1)).alias("n")))


def fuzzy_self_pairs_duck(table: str, str_col: str,
                          max_distance: int = 2,
                          block_sql: str | None = None) -> str:
    """DuckDB mirror of ``fuzzy_self_pairs`` — same blocking, length
    prune, threshold semantics (DuckDB's levenshtein has no early-exit
    arg; the ≤ filter is value-equivalent)."""
    if block_sql is None:
        block_sql = "substring(lower({s}), 1, 2)"
    blk = block_sql.format(s="v")
    return f"""
WITH vals AS (SELECT DISTINCT {str_col} AS v FROM {table}),
b AS (SELECT v, {blk} AS blk FROM vals)
SELECT a.v AS str_a, c.v AS str_b,
       CAST(levenshtein(a.v, c.v) AS INT) AS distance
FROM b a JOIN b c ON a.blk = c.blk AND a.v < c.v
WHERE abs(length(a.v) - length(c.v)) <= {max_distance}
  AND levenshtein(a.v, c.v) <= {max_distance}
"""


# ------------------------------------------------- golden records

def golden_records(df: DataFrame, entity_col: str,
                   rules: dict[str, str],
                   ts_col: str | None = None,
                   tiebreak: str | None = None) -> DataFrame:
    """Survivorship: collapse each entity's variant records into ONE
    golden row — the step after entity resolution turns clusters into a
    master table. ``rules`` maps each surviving column to its merge
    rule:

    - ``most_frequent``: the value appearing on the most variant rows;
      ties break on the smaller value — deterministic, the consensus
      rule for categorical attributes;
    - ``latest``: the non-NULL value of the most recent row by
      (``ts_col``, ``tiebreak``) — the freshness rule (requires
      ts_col);
    - ``min`` / ``max``: plain extremes.

    NULLs never win: a rule only considers rows where the column is
    non-NULL (an entity whose column is all-NULL stays NULL). Output:
    (entity_col, n_records, <one column per rule>).

    Plan at 100 TB: every rule is an aggregate keyed on the entity —
    min/max/latest fold in ONE shared groupBy (latest = struct-max of
    (ts, tiebreak, value) over non-NULL rows); each most_frequent
    column needs its own (entity, value) pre-count + argmax, joined
    back on the entity key. r frequency rules cost r extra key-local
    aggregates — bounded by the schema, never the data."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_records")]
    freq_cols = []
    for col, rule in rules.items():
        if rule == "most_frequent":
            freq_cols.append(col)
        elif rule == "latest":
            if ts_col is None:
                raise ValueError(f"rule 'latest' for {col!r} needs ts_col")
            order = [F.col(ts_col)] + \
                ([F.col(tiebreak)] if tiebreak else [])
            aggs.append(
                F.max(F.when(F.col(col).isNotNull(),
                             F.struct(*order, F.col(col).alias("v"))))
                ["v"].alias(col))
        elif rule in ("min", "max"):
            aggs.append(getattr(F, rule)(col).alias(col))
        else:
            raise ValueError(f"unknown survivorship rule {rule!r}")
    out = df.groupBy(entity_col).agg(*aggs)
    for col in freq_cols:
        counts = (df.filter(F.col(col).isNotNull())
                  .groupBy(entity_col, col)
                  .agg(F.count(F.lit(1)).alias("_c")))
        # argmax (count DESC, value ASC): min-struct over (-count, value)
        best = (counts.groupBy(entity_col)
                .agg(F.min(F.struct((-F.col("_c")).alias("_nc"),
                                    F.col(col).alias("v")))["v"]
                     .alias(col)))
        out = out.join(best, on=entity_col, how="left")
    return out.select(entity_col, "n_records", *rules.keys())


def golden_records_duck(inner_sql: str, entity_col: str,
                        rules: dict[str, str],
                        ts_col: str | None = None,
                        tiebreak: str | None = None) -> str:
    """DuckDB mirror of :func:`golden_records` — same per-rule
    semantics, same (count DESC, value ASC) consensus tie order; the
    latest rule replays as a (ts DESC, tiebreak DESC) row_number cut
    over non-NULL rows (DuckDB's MAX_BY takes no composite order)."""
    sel = [entity_col, "CAST(COUNT(*) AS BIGINT) AS n_records"]
    joins = []
    for col, rule in rules.items():
        if rule == "most_frequent":
            joins.append(f"""
LEFT JOIN (
  SELECT {entity_col}, {col} FROM (
    SELECT {entity_col}, {col},
           ROW_NUMBER() OVER (PARTITION BY {entity_col}
                              ORDER BY COUNT(*) DESC, {col} ASC) AS r
    FROM src WHERE {col} IS NOT NULL GROUP BY {entity_col}, {col})
  WHERE r = 1) AS mf_{col} USING ({entity_col})""")
        elif rule == "latest":
            if ts_col is None:
                raise ValueError(f"rule 'latest' for {col!r} needs ts_col")
            tb = f", {tiebreak} DESC" if tiebreak else ""
            # the value column is the FINAL tie-breaker: the Spark side
            # is a struct-max over (ts, tiebreak, value), which resolves
            # rows tied on (ts, tiebreak) by the LARGER value — without
            # `{col} DESC` here the row_number pick among such ties
            # would be arbitrary and the mirror flaky
            joins.append(f"""
LEFT JOIN (
  SELECT {entity_col}, {col} FROM (
    SELECT {entity_col}, {col},
           ROW_NUMBER() OVER (PARTITION BY {entity_col}
                              ORDER BY {ts_col} DESC{tb}, {col} DESC) AS r
    FROM src WHERE {col} IS NOT NULL)
  WHERE r = 1) AS lt_{col} USING ({entity_col})""")
        else:
            sel.append(f"{rule.upper()}({col}) AS {col}")
    join_sel = ", ".join(
        f"{'mf' if r == 'most_frequent' else 'lt'}_{c}.{c} AS {c}"
        for c, r in rules.items() if r in ("most_frequent", "latest"))
    base_cols = ", ".join(
        [f"b.{entity_col}", "b.n_records"]
        + [f"b.{c} AS {c}" for c, r in rules.items()
           if r not in ("most_frequent", "latest")])
    order_cols = ", ".join([f"{entity_col}", "n_records"]
                           + list(rules.keys()))
    return f"""
WITH src AS (SELECT * FROM ({inner_sql})),
base AS (SELECT {", ".join(sel)} FROM src GROUP BY {entity_col})
SELECT {order_cols} FROM (
  SELECT {base_cols}{", " + join_sel if join_sel else ""}
  FROM base b {"".join(joins)})
"""
