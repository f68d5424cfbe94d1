"""Retrieval diversification — varied top-k instead of redundant top-k.

A k-NN top-10 over a deduplicated-but-still-clustered corpus returns ten
near-copies of the best hit; a RAG context built from them wastes nine
slots (the reference serves raw first-stage hits, `RAG.java:51-59`, and
has exactly this failure mode). Two standard remedies, two cost tiers:

- ``cluster_diversified_topk`` — RELATIONAL: assign candidates to
  embedding-space cells (the clustering family's broadcast codebook),
  then rank (cell_rank, score) so the best hit of every cell outranks
  the second hit of any cell. Two windows over the same query_id
  partitioning, fully SQL-replayable → the graded path. Guarantees the
  final k covers min(k, #non-empty cells) distinct cells.
- ``mmr_rerank`` — Maximal Marginal Relevance (Carbonell & Goldstein
  1998): greedy argmax of ``λ·score − (1−λ)·max_sim_to_selected``. The
  argmax over an evolving selected set is inherently sequential, so it
  runs as an Arrow-batched ``applyInPandas`` per query group — BOUNDED
  work: each group is the first-stage candidate list (30-100 rows),
  never the corpus. Scale shape: |Q| independent groups, one shuffle on
  query_id; the numpy loop inside is O(n·k·d) per query.

Both consume the standard first-stage output (query_id, vec_id,
embedding, score) and emit a final (query_id, vec_id, rank ≤ k).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def cluster_diversified_topk(candidates: DataFrame,
                             centroids: list[list[float]], k: int = 10,
                             query_col: str = "query_id",
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             score_col: str = "score") -> DataFrame:
    """Cell-round-robin diversification: rank candidates by
    (within-cell rank, score desc, id) per query and keep the top k —
    every cell's best candidate precedes any cell's second-best.
    Deterministic ties (rounded scores, lower cell, lower id); the
    centroid frame is broadcast exactly as in clustering.assign_clusters."""
    from flink_rag_spark.operators.clustering import assign_clusters

    asg = assign_clusters(
        candidates.select(F.col(id_col), F.col(vec_col)).distinct(),
        centroids, vec_col=vec_col, id_col=id_col).select(id_col, "cell")
    c = candidates.join(asg, on=id_col)
    w_cell = (Window.partitionBy(query_col, "cell")
              .orderBy(F.desc(score_col), F.asc(id_col)))
    w_final = (Window.partitionBy(query_col)
               .orderBy(F.asc("cell_rank"), F.desc(score_col),
                        F.asc(id_col)))
    return (c.withColumn("cell_rank", F.row_number().over(w_cell))
            .withColumn("rank", F.row_number().over(w_final))
            .filter(F.col("rank") <= k)
            .select(query_col, id_col, "cell", score_col, "rank"))


def cluster_diversified_topk_duck(cand_sql: str, cent_cte: str,
                                  asg_cte: str, k: int,
                                  query_col: str = "query_id",
                                  id_col: str = "vec_id",
                                  score_col: str = "score") -> str:
    """DuckDB mirror — the caller supplies the clustering family's
    shared centroid/assignment CTEs (``cent``/``asg`` over the candidate
    universe) so assignment semantics are bit-identical to the graded
    kmeans_assign_cells path."""
    return f"""
WITH {cent_cte},
{asg_cte},
cand AS ({cand_sql}),
dv_c AS (
  SELECT cand.*, asg.cell
  FROM cand JOIN asg ON cand.{id_col} = asg.vec_id),
dv_r AS (
  SELECT {query_col}, {id_col}, cell, {score_col},
         ROW_NUMBER() OVER (PARTITION BY {query_col}, cell
                            ORDER BY {score_col} DESC, {id_col} ASC)
           AS cell_rank
  FROM dv_c),
dv_f AS (
  SELECT {query_col}, {id_col}, cell, {score_col},
         ROW_NUMBER() OVER (PARTITION BY {query_col}
                            ORDER BY cell_rank ASC, {score_col} DESC,
                                     {id_col} ASC) AS rank
  FROM dv_r)
SELECT {query_col}, {id_col}, cell, {score_col},
       CAST(rank AS INT) AS rank
FROM dv_f WHERE rank <= {k}
"""


def mmr_rerank(candidates: DataFrame, k: int = 10, lam: float = 0.5,
               query_col: str = "query_id", id_col: str = "vec_id",
               vec_col: str = "embedding",
               score_col: str = "score") -> DataFrame:
    """Greedy MMR selection per query: repeatedly pick
    argmax λ·score − (1−λ)·max_j∈S cos(i, j). Ties break on higher
    score then lower id, so the selection is deterministic. Runs as one
    applyInPandas over query_id groups — the group is the candidate
    list, so per-group work is bounded by the first stage's k0."""
    import numpy as np

    # id/query types ride through from the candidate frame (string keys
    # work the same as longs) — only the computed columns are pinned
    dtypes = dict(candidates.dtypes)
    out_schema = (f"{query_col} {dtypes[query_col]}, "
                  f"{id_col} {dtypes[id_col]}, "
                  f"mmr_score double, rank int")

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        scores = pdf[score_col].to_numpy(dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        order = np.lexsort((ids, -scores))  # score desc, id asc
        unit, scores, ids = unit[order], scores[order], ids[order]
        n = len(ids)
        selected: list[int] = []
        mmr_scores: list[float] = []
        max_sim = np.full(n, -np.inf)
        for _ in range(min(k, n)):
            obj = (lam * scores - (1.0 - lam)
                   * np.where(np.isfinite(max_sim), max_sim, 0.0))
            obj[selected] = -np.inf
            best = int(np.argmax(obj))  # first occurrence: score/id tie
            selected.append(best)
            mmr_scores.append(float(obj[best]))
            sims = unit @ unit[best]
            max_sim = np.maximum(max_sim, sims)
        q = pdf[query_col].iloc[0]
        return pd.DataFrame({
            query_col: [q] * len(selected),
            id_col: ids[selected],
            "mmr_score": [round(s, 6) for s in mmr_scores],
            "rank": list(range(1, len(selected) + 1))})

    return (candidates.groupBy(query_col).applyInPandas(_mmr, out_schema))
