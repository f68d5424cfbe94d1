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


# --------------------------------------- rank-biased overlap (RBO)

RBO_P = 0.9
RBO_W_DP = 12
RBO_DP = 6


def _rbo_weights(p: float, k: int) -> list[tuple[int, str]]:
    """(depth, weight) with weight = (1−p)·p^{d−1}/d quantized to
    12-dp literals — Python-precomputed so neither engine's POWER runs
    (the SES weight-table discipline)."""
    from decimal import ROUND_HALF_UP, Decimal
    out = []
    for d in range(1, k + 1):
        w = (1.0 - p) * (p ** (d - 1)) / d
        out.append((d, str(Decimal(w).quantize(
            Decimal(f"1e-{RBO_W_DP}"), rounding=ROUND_HALF_UP))))
    return out


def rbo_overlap(run_a: DataFrame, run_b: DataFrame, depth: int,
                p: float = RBO_P,
                query_id: str = "query_id", id_col: str = "doc_id",
                rank_col: str = "rank") -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    per-query rankings — "how similar are these two retrieval tiers'
    result LISTS?", where recall@k (``eval_ranking``) scores each
    against ground truth and set overlap ignores order. The truncated
    lower bound RBO_min = Σ_{d≤depth} (1−p)·p^{d−1}·|A_:d ∩ B_:d|/d —
    top-weighted (p the persistence: 0.9 ≈ the top 10 carry ~86% of
    the weight), 1 = identical prefixes, 0 = disjoint.

    Output: (query_id, rbo) per query present in EITHER run.

    Exactness: an id's contribution switches on at depth
    m = max(rank_a, rank_b) — so overlap-at-depth is one cumulative
    count over the ≤depth-row m-frame, and RBO = Σ_d w_d·C(d) with
    Python-precomputed 12-dp DECIMAL weights (no engine POWER): every
    term is an exact decimal product, rounded at 6 dp in decimal
    space.

    Plan at 100 TB: one full-outer id join of the two runs (both ≤
    depth rows per query), one ≤depth-row-per-query cumulative window,
    one broadcast weight join, one aggregate — all on the query-id
    partitioning."""
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1), got {p}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    from decimal import Decimal
    spark = run_a.sparkSession
    wdec = f"decimal(14,{RBO_W_DP})"
    wtab = F.broadcast(spark.createDataFrame(
        [(d, Decimal(w)) for d, w in _rbo_weights(p, depth)],
        f"_d int, _w {wdec}"))
    a = (run_a.filter(F.col(rank_col) <= depth)
         .select(query_id, id_col, F.col(rank_col).alias("_ra")))
    b = (run_b.filter(F.col(rank_col) <= depth)
         .select(query_id, id_col, F.col(rank_col).alias("_rb")))
    m = (a.join(b, [query_id, id_col], "full")
         .select(query_id,
                 F.greatest(F.coalesce("_ra", F.lit(depth + 1)),
                            F.coalesce("_rb", F.lit(depth + 1)))
                 .alias("_m"))
         .filter(F.col("_m") <= depth)
         .groupBy(query_id, "_m").agg(F.count(F.lit(1)).alias("_c")))
    # C(d) = Σ_{m ≤ d} cnt(m): join the ≤depth weight frame and count
    # every m ≤ d — one bounded join per query instead of a window +
    # per-depth densification
    contrib = (m.join(wtab, m["_m"] <= wtab["_d"])
               .select(query_id,
                       (F.col("_w") * F.col("_c").cast("decimal(10,0)"))
                       .alias("_t")))
    # queries in either run but with zero overlap still emit rbo = 0
    qs = (a.select(query_id).unionByName(b.select(query_id)).distinct())
    out = (qs.join(contrib.groupBy(query_id)
                   .agg(F.sum("_t").alias("_s")), query_id, "left"))
    return out.select(
        query_id,
        F.round(F.coalesce(F.col("_s"),
                           F.lit(0).cast(f"decimal(14,{RBO_W_DP})")),
                RBO_DP).cast("double").alias("rbo"))


def rbo_overlap_duck(a_sql: str, b_sql: str, depth: int,
                     p: float = RBO_P,
                     query_id: str = "query_id", id_col: str = "doc_id",
                     rank_col: str = "rank") -> str:
    """DuckDB mirror of :func:`rbo_overlap` — the same literal weight
    table, the same max-rank switch-on depths."""
    wvals = ", ".join(f"({d}, {w})" for d, w in _rbo_weights(p, depth))
    dp = RBO_W_DP
    return f"""
WITH rbo_w (d, w) AS (
  SELECT d, CAST(w AS DECIMAL(14,{dp}))
  FROM (VALUES {wvals}) t(d, w)),
ra AS (SELECT {query_id}, {id_col}, {rank_col} AS r FROM ({a_sql})
       WHERE {rank_col} <= {depth}),
rb AS (SELECT {query_id}, {id_col}, {rank_col} AS r FROM ({b_sql})
       WHERE {rank_col} <= {depth}),
m AS (
  SELECT COALESCE(ra.{query_id}, rb.{query_id}) AS {query_id},
         GREATEST(COALESCE(ra.r, {depth + 1}),
                  COALESCE(rb.r, {depth + 1})) AS m
  FROM ra FULL JOIN rb
    ON ra.{query_id} = rb.{query_id} AND ra.{id_col} = rb.{id_col}),
cnt AS (
  SELECT {query_id}, m, COUNT(*) AS c FROM m
  WHERE m <= {depth} GROUP BY {query_id}, m),
contrib AS (
  SELECT {query_id}, SUM(w.w * CAST(c.c AS DECIMAL(10,0))) AS s
  FROM cnt c JOIN rbo_w w ON c.m <= w.d
  GROUP BY {query_id}),
qs AS (SELECT DISTINCT {query_id} FROM ra
       UNION SELECT DISTINCT {query_id} FROM rb)
SELECT qs.{query_id},
       CAST(ROUND(COALESCE(contrib.s, CAST(0 AS DECIMAL(14,{dp}))),
                  {RBO_DP}) AS DOUBLE) AS rbo
FROM qs LEFT JOIN contrib ON contrib.{query_id} = qs.{query_id}
"""
