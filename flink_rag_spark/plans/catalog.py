"""The query catalog — single source of truth for the driver contract.

Every entry pairs an idiomatic-Spark builder (plans/relational.py,
plans/llm.py) with the equivalent ANSI/DuckDB oracle SQL. ``__spark_entry__``
assembles its ``queries()`` / ``oracle_sql()`` dicts from here, so a query
cannot be registered without deciding its oracle story.

Oracle strings are built from the SAME constants (decimal casts, rounding,
minhash parameters, stopword lists) as the Spark plans — see the shared
generators in functions/hashing.py, functions/textfns.py,
functions/vector.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.config import DEFAULT_CONFIG as CFG
from flink_rag_spark.functions.hashing import (
    minhash_params,
    minhash_sig_duck,
    poly_hash_duck,
    shingle_hashes_duck,
)
from flink_rag_spark.functions.textfns import (
    LANG_MARKERS,
    punct_ratio_duck,
    stopword_ratio_duck,
    token_count_duck,
)
from flink_rag_spark.functions.vector import cosine_duck
from flink_rag_spark.plans import llm, relational as R
from flink_rag_spark.plans.rag import rag_answer


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # None → driver does a rows-only check
    tags: tuple[str, ...] = ()


# ---- shared oracle fragments (mirror plans/relational.py helpers) ----

DEC_EP = "CAST(l_extendedprice AS DECIMAL(18,2))"
DP = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
      "CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))")
CH = (f"CAST(CAST({DP} AS DECIMAL(18,4)) * "
      "CAST(1 + l_tax AS DECIMAL(18,2)) AS DECIMAL(30,6))")


def _money(c: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
  SUM(l_quantity) AS sum_qty,
  {_money('l_extendedprice')} AS sum_base_price,
  CAST(SUM({DP}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({CH}) AS DOUBLE) AS sum_charge,
  SUM(l_quantity) / COUNT(*) AS avg_qty,
  {_money('l_extendedprice')} / COUNT(*) AS avg_price,
  {_money('l_discount')} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLE_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({DP}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ORACLE_Q5 = f"""
SELECT n_name, CAST(SUM({DP}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

ORACLE_SEMI = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
"""

ORACLE_ANTI = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

ORACLE_AGG_STATUS = f"""
SELECT o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  {_money('o_totalprice')} AS total_price,
  MIN(o_orderdate) AS first_order,
  MAX(o_orderdate) AS last_order
FROM orders GROUP BY o_orderstatus
"""

ORACLE_ROLLUP = f"""
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       COUNT(*) AS n_customers,
       {_money('c_acctbal')} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""

ORACLE_CUBE = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {_money('o_totalprice')} AS total_price
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

ORACLE_TOP3 = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 3
"""

ORACLE_RUNNING = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_spend,
  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1)
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
    AS prev_price,
  CAST(ROW_NUMBER()
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
    AS order_seq
FROM orders
"""

ORACLE_SETOPS = """
WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT nk, 'both' AS tag FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s) t1
UNION ALL
SELECT nk, 'customer_only' AS tag FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s) t2
UNION ALL
SELECT nk, 'supplier_only' AS tag FROM (SELECT nk FROM s EXCEPT SELECT nk FROM c) t3
"""

ORACLE_STRING = """
SELECT p_partkey,
  lower(p_name) AS lname,
  substring(p_type, 1, 6) AS type_prefix,
  concat_ws('|', p_brand, p_type) AS brand_type,
  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
  CAST(length(p_name) AS BIGINT) AS name_len,
  CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS lev_to_13
FROM part
"""

ORACLE_MONTHLY = f"""
SELECT month, CAST(EXTRACT(year FROM month) AS BIGINT) AS yr,
       CAST(EXTRACT(month FROM month) AS BIGINT) AS mo,
       n_orders, total_price
FROM (
  SELECT date_trunc('month', o_orderdate) AS month,
         COUNT(*) AS n_orders,
         {_money('o_totalprice')} AS total_price
  FROM orders GROUP BY 1) t
"""

ORACLE_MATH = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
  ROUND(sqrt(l_quantity), 6) AS qty_sqrt,
  ROUND(ln(l_extendedprice), 6) AS price_ln,
  ROUND(abs(l_discount - 0.05), 6) AS disc_dev,
  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
"""

ORACLE_JSON = f"""
SELECT k, COUNT(*) AS n_events, {_money('value')} AS sum_value
FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
      FROM events) t
GROUP BY k
"""

ORACLE_TUMBLING = f"""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS win_end,
       event_type, COUNT(*) AS n_events, {_money('value')} AS sum_value
FROM events
GROUP BY 1, 2, 3
"""

ORACLE_ASOF = """
SELECT event_id, user_id, ts, p_ts, p_value FROM (
  SELECT e.event_id, e.user_id, e.ts, p.ts AS p_ts, p.value AS p_value,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY p.ts DESC NULLS LAST,
                                     p.event_id DESC NULLS LAST) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'error') e
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON e.user_id = p.user_id AND p.ts <= e.ts) t
WHERE rn = 1
"""

ORACLE_DEDUP_EXACT = """
SELECT lang, source, MIN(doc_id) AS doc_id, COUNT(*) AS group_size
FROM documents GROUP BY lang, source
"""

_COS_Q = cosine_duck("embedding", "qv")
ORACLE_KNN_SINGLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (SELECT vec_id, ROUND({_COS_Q}, 6) AS score
           FROM embeddings CROSS JOIN q),
ranked AS (SELECT vec_id, score,
                  ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rnk
           FROM scored)
SELECT vec_id, score, CAST(rnk AS BIGINT) AS "rank" FROM ranked WHERE rnk <= 10
"""

_COS_B = cosine_duck("e.embedding", "q.query_vec")
ORACLE_KNN_BATCH = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec
           FROM embeddings WHERE vec_id < 5),
scored AS (SELECT q.query_id, e.vec_id, ROUND({_COS_B}, 6) AS score
           FROM embeddings e CROSS JOIN q),
ranked AS (SELECT query_id, vec_id, score,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, vec_id) AS rnk
           FROM scored)
SELECT query_id, vec_id, score, CAST(rnk AS BIGINT) AS "rank"
FROM ranked WHERE rnk <= 5
"""

_COS_AB = cosine_duck("a.embedding", "b.embedding")
ORACLE_NEARDUP_EMB = f"""
SELECT id_a, id_b, score FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS_AB}, 6) AS score
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id) t
WHERE score >= 0.9
"""


def _oracle_minhash_sigs() -> str:
    params = minhash_params(CFG.lsh_num_hashes, CFG.seed)
    hashes = shingle_hashes_duck("text", CFG.shingle_size)
    mh_cols = ", ".join(
        f"{minhash_sig_duck('hs', a, b)} AS mh{i}"
        for i, (a, b) in enumerate(params))
    return f"""
SELECT doc_id, {mh_cols}
FROM (SELECT doc_id, {hashes} AS hs FROM documents WHERE doc_id < 50) t
"""


def _oracle_lsh_pairs() -> str:
    params = minhash_params(CFG.lsh_num_hashes, CFG.seed)
    hashes = shingle_hashes_duck("text", CFG.shingle_size)
    mh_cols = ", ".join(
        f"{minhash_sig_duck('hs', a, b)} AS mh{i}"
        for i, (a, b) in enumerate(params))
    rows = CFG.lsh_num_hashes // CFG.lsh_bands
    band_selects = []
    for b in range(CFG.lsh_bands):
        cols = ", ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS band_key FROM sigs")
    bands = " UNION ALL ".join(band_selects)
    return f"""
WITH sigs AS (
  SELECT doc_id, {mh_cols}
  FROM (SELECT doc_id, {hashes} AS hs FROM documents) t
),
bands AS ({bands})
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM bands l JOIN bands r
  ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
"""


def _oracle_jaccard() -> str:
    hashes = shingle_hashes_duck("text", CFG.shingle_size)
    return f"""
WITH sh AS (SELECT doc_id, list_distinct({hashes}) AS sh FROM documents),
sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
tok AS (SELECT doc_id, unnest(sh) AS h FROM sh),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
          FROM tok a JOIN tok b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b) t
WHERE jaccard >= 0.4
"""


def _oracle_text_quality() -> str:
    return f"""
SELECT doc_id,
  CAST({token_count_duck('text')} AS BIGINT) AS n_tokens,
  ROUND({punct_ratio_duck('text')}, 6) AS punct_ratio,
  ROUND({stopword_ratio_duck('text', LANG_MARKERS['en'])}, 6) AS en_stop_ratio,
  ROUND(length(text) / greatest({token_count_duck('text')}, 1), 6)
    AS chars_per_token
FROM documents
"""


def _oracle_lang_id() -> str:
    codes = sorted(LANG_MARKERS)
    scores = ", ".join(
        f"{stopword_ratio_duck('text', LANG_MARKERS[c])} AS s_{c}" for c in codes)
    best = "greatest(" + ", ".join(f"s_{c}" for c in codes) + ")"
    whens = " ".join(f"WHEN s_{c} = {best} THEN '{c}'" for c in codes)
    return f"""
SELECT doc_id, lang,
  CASE WHEN {best} > 0 THEN (CASE {whens} ELSE 'unknown' END)
       ELSE 'unknown' END AS pred_lang
FROM (SELECT doc_id, lang, {scores} FROM documents) t
"""


def _oracle_fingerprints() -> str:
    hashes = shingle_hashes_duck("text", CFG.shingle_size)
    return f"""
SELECT doc_id, {poly_hash_duck('text')} AS fp_full,
       list_min({hashes}) AS fp_min_shingle
FROM documents
"""


QUERIES: list[QueryDef] = [
    # relational surface (SURVEY.md §2.2 Tier B)
    QueryDef("q1_pricing_summary", R.q1_pricing_summary, ORACLE_Q1, ("agg", "scan")),
    QueryDef("q3_top_revenue_orders", R.q3_top_revenue_orders, ORACLE_Q3, ("join", "topk")),
    QueryDef("q5_region_revenue", R.q5_region_revenue, ORACLE_Q5, ("join",)),
    QueryDef("semi_join_big_spenders", R.semi_join_big_spenders, ORACLE_SEMI, ("join",)),
    QueryDef("anti_join_no_orders", R.anti_join_no_orders, ORACLE_ANTI, ("join",)),
    QueryDef("agg_orders_by_status", R.agg_orders_by_status, ORACLE_AGG_STATUS, ("agg",)),
    QueryDef("rollup_region_nation", R.rollup_region_nation, ORACLE_ROLLUP, ("agg",)),
    QueryDef("cube_status_priority", R.cube_status_priority, ORACLE_CUBE, ("agg",)),
    QueryDef("window_top3_orders_per_customer", R.window_top3_orders_per_customer,
             ORACLE_TOP3, ("window",)),
    QueryDef("window_running_customer_spend", R.window_running_customer_spend,
             ORACLE_RUNNING, ("window",)),
    QueryDef("setops_nation_presence", R.setops_nation_presence, ORACLE_SETOPS, ("setop",)),
    QueryDef("string_part_features", R.string_part_features, ORACLE_STRING, ("scalar",)),
    QueryDef("date_orders_monthly", R.date_orders_monthly, ORACLE_MONTHLY, ("scalar", "agg")),
    QueryDef("math_lineitem_features", R.math_lineitem_features, ORACLE_MATH, ("scalar",)),
    QueryDef("json_events_props", R.json_events_props, ORACLE_JSON, ("scalar", "agg")),
    QueryDef("events_tumbling_5min", R.events_tumbling_5min, ORACLE_TUMBLING, ("window", "stream")),
    QueryDef("asof_error_last_purchase", R.asof_error_last_purchase, ORACLE_ASOF, ("join", "asof")),
    # similarity (reference A9 generalized, SURVEY.md §2.4)
    QueryDef("knn_single_vec0", llm.knn_single_vec0, ORACLE_KNN_SINGLE, ("similarity",)),
    QueryDef("knn_batch", llm.knn_batch, ORACLE_KNN_BATCH, ("similarity",)),
    QueryDef("embedding_neardup_pairs", llm.embedding_neardup_pairs,
             ORACLE_NEARDUP_EMB, ("similarity", "dedup")),
    # dedup family (north star)
    QueryDef("dedup_exact_docs", llm.dedup_exact_docs, ORACLE_DEDUP_EXACT, ("dedup",)),
    QueryDef("minhash_sig_sample", llm.minhash_sig_sample, _oracle_minhash_sigs(), ("dedup",)),
    QueryDef("lsh_dup_candidates", llm.lsh_dup_candidates, _oracle_lsh_pairs(), ("dedup",)),
    QueryDef("jaccard_neardup_pairs", llm.jaccard_neardup_pairs, _oracle_jaccard(), ("dedup",)),
    # text analysis (north star)
    QueryDef("text_quality_stats", llm.text_quality_stats, _oracle_text_quality(), ("text",)),
    QueryDef("lang_id_heuristic", llm.lang_id_heuristic, _oracle_lang_id(), ("text",)),
    QueryDef("doc_fingerprints", llm.doc_fingerprints, _oracle_fingerprints(), ("text",)),
    # RAG end-to-end (pandas-UDF providers → non-SQL-expressible, rows-only)
    QueryDef("rag_answer_batch",
             lambda spark, sf_dir: rag_answer(spark, sf_dir), None, ("rag",)),
]


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in QUERIES}


def oracle_sqls() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES if q.oracle is not None}
