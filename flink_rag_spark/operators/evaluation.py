"""Retrieval-quality evaluation: recall@k, MRR@k, nDCG@k as relational ops.

Every retrieval stack the reference fronts (OpenSearch k-NN,
`RAG.java:51-59`) gets evaluated offline before serving changes ship —
swap the index type, re-run the eval, compare. The reference has no eval
surface at all; this module makes the metrics themselves engine queries,
so a 100 TB run-vs-qrels join is just another partitioned aggregate
instead of a driver-side script looping over queries.

Shape: ``eval_ranking(run, qrels, k)`` where ``run`` is a system's ranked
output (query_id, doc_id, rank) and ``qrels`` the relevance labels
(query_id, doc_id). One equi-join on (query_id, doc_id) marks hits, one
groupBy(query_id) folds them into the three metrics, one broadcast-sized
join attaches per-query relevant counts. Everything shuffles on query_id
— at any corpus size the cost is O(|run| + |qrels|), never per-query
jobs. Binary relevance (the qrels shape TREC/BEIR publish); graded gain
would only change the DCG numerator.

Metric definitions (k fixed up front, binary gains):

- recall@k   = |hits in top-k| / |qrels for the query|
- MRR@k      = 1 / rank of the first hit (0 when no hit in top-k)
- nDCG@k     = DCG@k / IDCG@k,  DCG = Σ_hits 1/log2(rank+1),
               IDCG = Σ_{i=1..min(|qrels|,k)} 1/log2(i+1)

Scores are ROUND()ed (vector.ROUND_DP) like every oracle-checked double.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.functions.vector import ROUND_DP


def _idcg_expr(n_rel: str, k: int) -> str:
    """SQL: ideal DCG for ``n_rel`` relevant docs at cutoff k — a
    sequential fold over the first min(n_rel, k) ideal ranks."""
    return (
        f"aggregate(sequence(1, least(CAST({n_rel} AS INT), {k})), "
        f"CAST(0.0 AS DOUBLE), (s, i) -> s + 1.0 / log2(i + 1))"
    )


def eval_ranking(run: DataFrame, qrels: DataFrame, k: int = 10,
                 query_col: str = "query_id", doc_col: str = "doc_id",
                 rank_col: str = "rank") -> DataFrame:
    """Per-query retrieval metrics: (query_id, n_rel, n_hits, recall_at_k,
    mrr_at_k, ndcg_at_k). Queries with qrels but an empty run still
    appear (all-zero metrics) — silent query loss is the classic eval
    bug, so the output is keyed by the QRELS' query set."""
    topk = run.filter(F.col(rank_col) <= k)
    per_q_rel = qrels.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_rel"))
    hits = (topk.join(qrels.select(query_col, doc_col),
                      on=[query_col, doc_col], how="inner"))
    folded = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min(rank_col).alias("_first_hit"),
        F.sum(1.0 / F.log2(F.col(rank_col) + 1.0)).alias("_dcg"))
    out = (per_q_rel.join(folded, on=query_col, how="left")
           .fillna({"n_hits": 0}))
    idcg = F.expr(_idcg_expr("n_rel", k))
    return out.select(
        query_col, "n_rel",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") / F.col("n_rel"), ROUND_DP)
        .alias("recall_at_k"),
        F.round(F.coalesce(1.0 / F.col("_first_hit"), F.lit(0.0)),
                ROUND_DP).alias("mrr_at_k"),
        F.round(F.coalesce(F.col("_dcg"), F.lit(0.0)) / idcg, ROUND_DP)
        .alias("ndcg_at_k"))


def eval_ranking_duck(run_sql: str, qrels_sql: str, k: int = 10,
                      query_col: str = "query_id",
                      doc_col: str = "doc_id",
                      rank_col: str = "rank") -> str:
    """DuckDB mirror of ``eval_ranking`` — same joins, folds, and the same
    sequential IDCG fold (list_reduce over generate_series)."""
    idcg = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, least(CAST(n_rel AS INT), {k})), "
        f"i -> 1.0 / log2(i + 1))), (s, x) -> s + x)"
    )
    return f"""
WITH run AS ({run_sql}),
qrels AS ({qrels_sql}),
per_q AS (
  SELECT {query_col}, COUNT(*) AS n_rel FROM qrels GROUP BY 1),
hits AS (
  SELECT r.{query_col}, r.{rank_col}
  FROM run r JOIN qrels q
    ON r.{query_col} = q.{query_col} AND r.{doc_col} = q.{doc_col}
  WHERE r.{rank_col} <= {k}),
folded AS (
  SELECT {query_col}, COUNT(*) AS n_hits, MIN({rank_col}) AS first_hit,
         SUM(1.0 / log2({rank_col} + 1.0)) AS dcg
  FROM hits GROUP BY 1)
SELECT p.{query_col}, p.n_rel,
       CAST(COALESCE(f.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(COALESCE(f.n_hits, 0) / CAST(p.n_rel AS DOUBLE),
             {ROUND_DP}) AS recall_at_k,
       ROUND(COALESCE(1.0 / f.first_hit, 0.0), {ROUND_DP}) AS mrr_at_k,
       ROUND(COALESCE(f.dcg, 0.0) / ({idcg}), {ROUND_DP}) AS ndcg_at_k
FROM per_q p LEFT JOIN folded f ON p.{query_col} = f.{query_col}
"""


def roc_auc(scored: DataFrame, score_col: str,
            label_col: str) -> DataFrame:
    """ROC-AUC of ``score_col`` separating ``label_col`` (boolean/0-1),
    with the Mann-Whitney tie correction — one row (n_pos, n_neg, auc).

    Scale shape — the classifier-eval metric WITHOUT a global sort:
    scores aggregate to a (score, n_pos, n_neg) histogram first
    (map-side combined; the exchange carries the score VOCABULARY, not
    rows), then AUC folds over that histogram with one cumulative
    window: AUC = Σ_s pos_s · (cum_neg_below + neg_s/2) / (n_pos·n_neg)
    — ties contribute half, exactly the trapezoidal/U-statistic value.
    A 100 TB eval costs one aggregate; only distinct scores are sorted.
    NULL scores/labels are excluded (count them upstream if they matter).
    AUC is NULL when either class is empty."""
    from pyspark.sql import Window
    hist = (scored
            .filter(F.col(score_col).isNotNull()
                    & F.col(label_col).isNotNull())
            .select(F.col(score_col).alias("s"),
                    F.col(label_col).cast("int").alias("y"))
            .groupBy("s")
            .agg(F.sum("y").alias("n_pos"),
                 F.sum(1 - F.col("y")).alias("n_neg")))
    w = (Window.orderBy("s")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    contrib = hist.select(
        "n_pos", "n_neg",
        (F.col("n_pos")
         * (F.sum("n_neg").over(w) - F.col("n_neg")
            + F.col("n_neg") / 2.0)).alias("_u"))
    return contrib.agg(
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
        F.round(F.when(
            (F.sum("n_pos") > 0) & (F.sum("n_neg") > 0),
            F.sum("_u") / (F.sum("n_pos") * F.sum("n_neg"))),
            ROUND_DP).alias("auc"))


def roc_auc_duck(scored_sql: str, score_col: str = "s",
                 label_col: str = "y") -> str:
    """DuckDB mirror of roc_auc — same histogram fold, tie handling,
    rounding, empty-class NULL. ``scored_sql`` yields (score, label)."""
    return f"""
WITH src AS ({scored_sql}),
hist AS (
  SELECT {score_col} AS s,
         SUM(CAST({label_col} AS INT)) AS n_pos,
         SUM(1 - CAST({label_col} AS INT)) AS n_neg
  FROM src
  WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
  GROUP BY 1),
c AS (
  SELECT n_pos, n_neg,
         n_pos * (SUM(n_neg) OVER (ORDER BY s
                                   ROWS UNBOUNDED PRECEDING)
                  - n_neg + n_neg / 2.0) AS _u
  FROM hist)
SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       CAST(SUM(n_neg) AS BIGINT) AS n_neg,
       ROUND(CASE WHEN SUM(n_pos) > 0 AND SUM(n_neg) > 0
                  THEN SUM(_u) / (SUM(n_pos) * SUM(n_neg)) END,
             {ROUND_DP}) AS auc
FROM c
"""


GROUND_DP = 6
UNGROUNDED_SAMPLE = 5


def answer_grounding(df: DataFrame, id_col: str, answer_col: str,
                     context_col: str) -> DataFrame:
    """Generation-side eval: how much of each answer is GROUNDED in its
    retrieved context — the token-overlap faithfulness audit run before
    any RAG serving change ships (the retrieval twin is
    :func:`eval_ranking`). A hallucination shows up as answer tokens
    absent from the context.

    Returns (id, n_answer_tokens, grounded_tokens, grounded_frac,
    ungrounded_sample): distinct-token counts, their ratio, and the
    first ``UNGROUNDED_SAMPLE`` missing tokens in lexical order (a
    deterministic debugging handle). Empty answers yield NULL frac.

    Shape at 100 TB: two explodes collapse to DISTINCT (id, token)
    frames (wordcount-shaped, map-side combined), one equi-join on
    (id, token) marks grounding, one groupBy(id) folds the metrics —
    everything shuffles on the id, no per-question work."""
    atoks = (df.select(F.col(id_col),
                       F.explode(F.split(F.trim(F.lower(answer_col)),
                                         r"\s+")).alias("tok"))
             .filter(F.col("tok") != "").distinct())
    ctoks = (df.select(F.col(id_col),
                       F.explode(F.split(F.trim(F.lower(context_col)),
                                         r"\s+")).alias("tok"))
             .filter(F.col("tok") != "").distinct()
             .withColumn("_in_ctx", F.lit(True)))
    marked = atoks.join(ctoks, [id_col, "tok"], "left")
    agg = (marked.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_answer_tokens"),
                F.count("_in_ctx").alias("grounded_tokens"),
                F.concat_ws(",", F.slice(F.array_sort(F.collect_list(
                    F.when(F.col("_in_ctx").isNull(), F.col("tok")))),
                    1, UNGROUNDED_SAMPLE)).alias("ungrounded_sample")))
    return (df.select(id_col).distinct()
            .join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_answer_tokens", F.lit(0))
                    .alias("n_answer_tokens"),
                    F.coalesce("grounded_tokens", F.lit(0))
                    .alias("grounded_tokens"),
                    F.round(F.col("grounded_tokens").cast("double")
                            / F.col("n_answer_tokens").cast("double"),
                            GROUND_DP).alias("grounded_frac"),
                    F.coalesce("ungrounded_sample", F.lit(""))
                    .alias("ungrounded_sample")))


def answer_grounding_duck(inner_sql: str, id_col: str, answer_col: str,
                          context_col: str) -> str:
    """DuckDB mirror of :func:`answer_grounding` — same tokenizer, same
    distinct-token sets, same lexical missing-token sample."""
    return f"""
WITH src AS (SELECT * FROM ({inner_sql})),
atoks AS (
  SELECT DISTINCT {id_col}, t.tok
  FROM src, UNNEST(string_split_regex(trim(lower({answer_col})), '\\s+'))
       AS t(tok)
  WHERE t.tok <> ''),
ctoks AS (
  SELECT DISTINCT {id_col}, t.tok
  FROM src, UNNEST(string_split_regex(trim(lower({context_col})), '\\s+'))
       AS t(tok)
  WHERE t.tok <> ''),
marked AS (
  SELECT a.{id_col}, a.tok, (c.tok IS NOT NULL) AS in_ctx
  FROM atoks a LEFT JOIN ctoks c
    ON c.{id_col} = a.{id_col} AND c.tok = a.tok),
agg AS (
  SELECT {id_col},
         COUNT(*) AS n_answer_tokens,
         COUNT(*) FILTER (WHERE in_ctx) AS grounded_tokens,
         array_to_string(
           list_sort(list(tok) FILTER (WHERE NOT in_ctx))
             [1:{UNGROUNDED_SAMPLE}], ',') AS ungrounded_sample
  FROM marked GROUP BY {id_col})
SELECT s.{id_col},
       CAST(COALESCE(a.n_answer_tokens, 0) AS BIGINT) AS n_answer_tokens,
       CAST(COALESCE(a.grounded_tokens, 0) AS BIGINT) AS grounded_tokens,
       ROUND(CAST(a.grounded_tokens AS DOUBLE)
             / CAST(a.n_answer_tokens AS DOUBLE),
             {GROUND_DP}) AS grounded_frac,
       COALESCE(a.ungrounded_sample, '') AS ungrounded_sample
FROM (SELECT DISTINCT {id_col} FROM src) s
LEFT JOIN agg a USING ({id_col})
"""
