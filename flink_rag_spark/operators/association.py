"""Categorical association — contingency grid, PMI and chi-square terms.

Feature auditing over a corpus asks "are these two labels independent?"
— language vs source, market segment vs region, license vs domain. The
primitive is the contingency table with its independence diagnostics:
per-cell observed count, expected count under independence, pointwise
mutual information, and the chi-square contribution. (Token-level PMI
for collocations lives in `operators/phrases.py`; this is the
column-level analogue.)

Plan at 100 TB: ONE partial+final aggregate over (a, b) collapses the
corpus to at most |A|·|B| cells; marginals and the grand total are
re-aggregations of that tiny frame, joined back broadcast. The full
grid (including empty cells — chi-square needs them) is a cross join of
the two marginal frames, which is |A|·|B| rows by construction. Nothing
after the first aggregate touches data-scale rows.

Determinism: all counts are exact integers; expected/PMI/chi² are the
same IEEE-double expressions in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

EXPECTED_DP = 4
PMI_DP = 6
CHI2_DP = 6


def categorical_association(df: DataFrame, col_a: str,
                            col_b: str) -> DataFrame:
    """Contingency diagnostics for ``col_a`` × ``col_b``.

    Returns one row per grid cell (col_a, col_b, n_xy, n_x, n_y,
    expected, pmi, chi2_term): ``expected`` = n_x·n_y/n, ``pmi`` =
    ln(n_xy·n/(n_x·n_y)) (NULL for empty cells), ``chi2_term`` =
    (n_xy−expected)²/expected — sum it for the chi-square statistic
    with (|A|−1)(|B|−1) degrees of freedom. Rows with NULL in either
    column are excluded."""
    base = (df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
            .filter(F.col("a").isNotNull() & F.col("b").isNotNull()))
    # the corpus-scale scan happens ONCE: joint is the |A|·|B|-cell
    # aggregate, pinned so the marginal/total re-aggregations below read
    # the cells, not the corpus
    joint = (base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_xy"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    ma = joint.groupBy("a").agg(F.sum("n_xy").alias("n_x"))
    mb = joint.groupBy("b").agg(F.sum("n_xy").alias("n_y"))
    tot = joint.agg(F.sum("n_xy").alias("n"))
    grid = (ma.crossJoin(F.broadcast(mb))
            .join(joint, ["a", "b"], "left")
            .crossJoin(F.broadcast(tot))
            .withColumn("n_xy", F.coalesce("n_xy", F.lit(0))))
    nd = F.col("n").cast("double")
    nxd = F.col("n_x").cast("double")
    nyd = F.col("n_y").cast("double")
    nxyd = F.col("n_xy").cast("double")
    expected = nxd * nyd / nd
    pmi = F.when(F.col("n_xy") > 0, F.log(nxyd * nd / (nxd * nyd)))
    chi2 = (nxyd - expected) * (nxyd - expected) / expected
    return grid.select(
        F.col("a").alias(col_a), F.col("b").alias(col_b),
        "n_xy", "n_x", "n_y",
        F.round(expected, EXPECTED_DP).alias("expected"),
        F.round(pmi, PMI_DP).alias("pmi"),
        F.round(chi2, CHI2_DP).alias("chi2_term"))


def categorical_association_duck(inner_sql: str, col_a: str,
                                 col_b: str) -> str:
    """DuckDB mirror of :func:`categorical_association` — same grid
    construction, same exact counts, same double expressions."""
    return f"""
WITH base AS (
  SELECT {col_a} AS a, {col_b} AS b FROM ({inner_sql})
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL),
joint AS (SELECT a, b, COUNT(*) AS n_xy FROM base GROUP BY a, b),
ma AS (SELECT a, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM joint GROUP BY a),
mb AS (SELECT b, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM joint GROUP BY b),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM joint),
grid AS (
  SELECT ma.a, mb.b, ma.n_x, mb.n_y, tot.n,
         COALESCE(joint.n_xy, 0) AS n_xy
  FROM ma CROSS JOIN mb CROSS JOIN tot
  LEFT JOIN joint ON joint.a = ma.a AND joint.b = mb.b)
SELECT a AS {col_a}, b AS {col_b}, n_xy, n_x, n_y,
       ROUND(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE),
             {EXPECTED_DP}) AS expected,
       ROUND(CASE WHEN n_xy > 0 THEN LN(
               CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))) END,
             {PMI_DP}) AS pmi,
       ROUND((CAST(n_xy AS DOUBLE)
              - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n_xy AS DOUBLE)
              - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                / CAST(n AS DOUBLE)), {CHI2_DP}) AS chi2_term
FROM grid
"""


# -------------------------------------------- market-basket pair rules

RULE_DP = 6


MAX_BASKET_ITEMS = 512  # hub-basket guard: pairs/basket ≤ C(512,2)


def itemset_pair_rules(df: DataFrame, basket_col: str, item_col: str,
                       min_pair_count: int = 2,
                       max_basket_items: int | None = MAX_BASKET_ITEMS,
                       ) -> DataFrame:
    """Market-basket association rules over item PAIRS (the depth-2
    slice of Apriori — at corpus scale pair rules are what basket
    analyses actually ship; deeper itemsets explode combinatorially
    and are mined on the pruned pair output): for every ordered rule
    a → b with the pair occurring in ≥ ``min_pair_count`` baskets,

        support    = n_ab / N           (pair frequency)
        confidence = n_ab / n_a         (P(b | a))
        lift       = confidence / (n_b / N)

    Plan at 100 TB: baskets dedup to distinct (basket, item) ONCE — the
    frame is persisted, because four consumers (basket count, item
    supports, both self-join sides) would otherwise each re-run the
    scan + distinct shuffle; the pair frame is the degree-bounded
    self-join on the basket key (the triangle/co-purchase shape);
    item supports are one |items|-bounded aggregate joined back on the
    item key (AQE broadcasts when the catalog is small); N is a 1-row
    broadcast. Exact integer counts; ratios rounded at 6dp. The pruned
    pair table and the tiny support frames are checkpointed so ``bi``
    can be unpersisted before returning.

    **Hub-basket guard** (the skew bound the self-join needs — one
    pathological 10^5-item basket would otherwise materialize ~10^10
    pair rows on a single key, and ``min_pair_count`` prunes only
    AFTER enumeration): a basket holding more than ``max_basket_items``
    distinct items is deterministically capped to its
    ``max_basket_items`` lowest-(poly_hash, item) members BEFORE any
    counting — the hash-ordered take-N is an unbiased-in-expectation
    sample that both engines replay bit-identically (the shared
    polynomial hash, ``functions/hashing.py``), mirroring
    ``dedup.span_pairs``'s ``max_span_docs`` star-reduction line. The
    cap bounds pairs-per-basket at C(cap, 2) and applies to the WHOLE
    analysis (basket count, supports, pairs) so the reported ratios
    stay internally consistent. ``None`` disables."""
    from pyspark.storagelevel import StorageLevel

    from flink_rag_spark.operators.util import hash_capped_groups

    bi = (df.select(F.col(basket_col).alias("b"),
                    F.col(item_col).alias("i"))
          .distinct())
    if max_basket_items is not None:
        bi = hash_capped_groups(bi, "b", "i", max_basket_items)
    bi = bi.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_baskets = (bi.select(F.countDistinct("b").alias("_nb"))
                     .localCheckpoint(eager=True))
        item_n = (bi.groupBy("i").agg(F.count(F.lit(1)).alias("n_item"))
                  .localCheckpoint(eager=True))
        a = bi.select(F.col("b"), F.col("i").alias("item_a"))
        b = bi.select(F.col("b"), F.col("i").alias("item_b"))
        pairs = (a.join(b, on="b")
                 .filter(F.col("item_a") < F.col("item_b"))
                 .groupBy("item_a", "item_b")
                 .agg(F.count(F.lit(1)).alias("n_pair"))
                 .filter(F.col("n_pair") >= min_pair_count)
                 .localCheckpoint(eager=True))
    finally:
        bi.unpersist()
    directed = pairs.unionByName(
        pairs.select(F.col("item_b").alias("item_a"),
                     F.col("item_a").alias("item_b"), "n_pair"))
    out = (directed
           .join(item_n.select(F.col("i").alias("item_a"),
                               F.col("n_item").alias("_na")), "item_a")
           .join(item_n.select(F.col("i").alias("item_b"),
                               F.col("n_item").alias("_nb_item")), "item_b")
           .crossJoin(F.broadcast(n_baskets)))
    nb = F.col("_nb").cast("double")
    return out.select(
        "item_a", "item_b",
        F.col("n_pair").cast("bigint").alias("n_pair"),
        F.round(F.col("n_pair") / nb, RULE_DP).alias("support"),
        F.round(F.col("n_pair") / F.col("_na").cast("double"),
                RULE_DP).alias("confidence"),
        F.round((F.col("n_pair") / F.col("_na").cast("double"))
                / (F.col("_nb_item") / nb), RULE_DP).alias("lift"))


def itemset_pair_rules_duck(inner_sql: str, basket_col: str,
                            item_col: str,
                            min_pair_count: int = 2,
                            max_basket_items: int | None = MAX_BASKET_ITEMS,
                            ) -> str:
    """DuckDB mirror of :func:`itemset_pair_rules` — same hash-ordered
    hub-basket cap (shared polynomial hash), same exact counts."""
    from flink_rag_spark.functions.hashing import hash_capped_sql

    distinct_bi = (f"SELECT DISTINCT {basket_col} AS b, {item_col} AS i "
                   f"FROM ({inner_sql})")
    if max_basket_items is None:
        bi_cte = f"bi AS ({distinct_bi})"
    else:
        bi_cte = "bi AS (" + hash_capped_sql(
            distinct_bi, "b", "i", max_basket_items) + ")"
    return f"""
WITH {bi_cte},
nb AS (SELECT COUNT(DISTINCT b) AS n FROM bi),
item_n AS (SELECT i, COUNT(*) AS n_item FROM bi GROUP BY i),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_pair
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_pair_count}),
directed AS (
  SELECT item_a, item_b, n_pair FROM pairs
  UNION ALL
  SELECT item_b, item_a, n_pair FROM pairs)
SELECT d.item_a, d.item_b, CAST(d.n_pair AS BIGINT) AS n_pair,
       ROUND(d.n_pair / CAST(nb.n AS DOUBLE), {RULE_DP}) AS support,
       ROUND(d.n_pair / CAST(na.n_item AS DOUBLE), {RULE_DP})
         AS confidence,
       ROUND((d.n_pair / CAST(na.n_item AS DOUBLE))
             / (nbi.n_item / CAST(nb.n AS DOUBLE)), {RULE_DP}) AS lift
FROM directed d
JOIN item_n na ON na.i = d.item_a
JOIN item_n nbi ON nbi.i = d.item_b, nb
"""


# ----------------------------------------- co-visitation recommendations

COVIS_DP = 6


def covisitation_topn(df: DataFrame, basket_col: str, item_col: str,
                      top_n: int = 10, min_pair_count: int = 2,
                      max_basket_items: int | None = MAX_BASKET_ITEMS,
                      ) -> DataFrame:
    """Item-item co-visitation recommendations — the "people also
    bought" primitive mined straight from interaction logs: for every
    item, its top-N neighbors by cosine over co-occurrence counts,

        cosine(i, j) = n_ij / sqrt(n_i · n_j)

    which normalizes away item popularity (raw co-counts just recommend
    bestsellers; the rules view in :func:`itemset_pair_rules` reads the
    same counts as support/confidence/lift). Output: (item_a, item_b,
    n_pair, cosine, rank), rank 1..top_n per item_a by (rounded cosine
    DESC, item_b) — a total order both engines replay.

    Plan: the pair-rules machinery verbatim — ONE persisted distinct
    (basket, item) frame (hub-capped: the same deterministic
    hash-ordered take-N bound), the basket-key self-join, one
    |items|-bounded support aggregate — plus one per-item top-N window
    over the min-count-pruned pair frame. Never a global sort."""
    from pyspark.sql import Window

    from flink_rag_spark.operators.util import hash_capped_groups

    bi = (df.select(F.col(basket_col).alias("b"),
                    F.col(item_col).alias("i"))
          .distinct())
    if max_basket_items is not None:
        bi = hash_capped_groups(bi, "b", "i", max_basket_items)
    bi = bi.persist()
    try:
        item_n = (bi.groupBy("i").agg(F.count(F.lit(1)).alias("n_item"))
                  .localCheckpoint(eager=True))
        a = bi.select(F.col("b"), F.col("i").alias("item_a"))
        b = bi.select(F.col("b"), F.col("i").alias("item_b"))
        pairs = (a.join(b, on="b")
                 .filter(F.col("item_a") < F.col("item_b"))
                 .groupBy("item_a", "item_b")
                 .agg(F.count(F.lit(1)).alias("n_pair"))
                 .filter(F.col("n_pair") >= min_pair_count)
                 .localCheckpoint(eager=True))
    finally:
        bi.unpersist()
    directed = pairs.unionByName(
        pairs.select(F.col("item_b").alias("item_a"),
                     F.col("item_a").alias("item_b"), "n_pair"))
    scored = (directed
              .join(item_n.select(F.col("i").alias("item_a"),
                                  F.col("n_item").alias("_na")), "item_a")
              .join(item_n.select(F.col("i").alias("item_b"),
                                  F.col("n_item").alias("_nb")), "item_b")
              .select("item_a", "item_b",
                      F.col("n_pair").cast("bigint").alias("n_pair"),
                      F.round(F.col("n_pair")
                              / F.sqrt(F.col("_na").cast("double")
                                       * F.col("_nb").cast("double")),
                              COVIS_DP).alias("cosine")))
    w_top = Window.partitionBy("item_a").orderBy(
        F.desc("cosine"), F.asc("item_b"))
    return (scored.withColumn("rank", F.row_number().over(w_top)
                              .cast("bigint"))
            .filter(F.col("rank") <= top_n))


def covisitation_topn_duck(inner_sql: str, basket_col: str,
                           item_col: str, top_n: int = 10,
                           min_pair_count: int = 2,
                           max_basket_items: int | None = MAX_BASKET_ITEMS,
                           ) -> str:
    """DuckDB mirror of :func:`covisitation_topn` — same hub cap, same
    counts, same rounded-cosine total order."""
    from flink_rag_spark.functions.hashing import hash_capped_sql

    distinct_bi = (f"SELECT DISTINCT {basket_col} AS b, {item_col} AS i "
                   f"FROM ({inner_sql})")
    if max_basket_items is None:
        bi_cte = f"bi AS ({distinct_bi})"
    else:
        bi_cte = "bi AS (" + hash_capped_sql(
            distinct_bi, "b", "i", max_basket_items) + ")"
    return f"""
WITH {bi_cte},
item_n AS (SELECT i, COUNT(*) AS n_item FROM bi GROUP BY i),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_pair
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_pair_count}),
directed AS (
  SELECT item_a, item_b, n_pair FROM pairs
  UNION ALL
  SELECT item_b, item_a, n_pair FROM pairs),
scored AS (
  SELECT d.item_a, d.item_b, CAST(d.n_pair AS BIGINT) AS n_pair,
         ROUND(d.n_pair / SQRT(CAST(na.n_item AS DOUBLE)
                               * CAST(nb.n_item AS DOUBLE)),
               {COVIS_DP}) AS cosine
  FROM directed d
  JOIN item_n na ON na.i = d.item_a
  JOIN item_n nb ON nb.i = d.item_b)
SELECT item_a, item_b, n_pair, cosine,
       CAST("rank" AS BIGINT) AS "rank"
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY item_a
                                   ORDER BY cosine DESC, item_b) AS "rank"
      FROM scored)
WHERE "rank" <= {top_n}
"""
