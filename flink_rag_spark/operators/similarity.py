"""Similarity search operators — the Spark-native replacement for the
reference's OpenSearch k-NN retrieval (``RAG.java:51-63``: k=10, minScore=0).

Three tiers (SURVEY.md §2.4):

1. ``cosine_topk`` — exact top-k for ONE query vector. Plans as a narrow
   projection + ``TakeOrderedAndProject`` (no full sort, no shuffle of data —
   each partition keeps k rows, driver merges). This is the correctness path
   the DuckDB oracle checks.
2. ``knn_join`` — exact top-k for a SET of query vectors: broadcast the small
   query side, cross-join against embeddings (narrow — no shuffle of the big
   side), per-query window top-k. Shuffle is only (num_queries × k ×
   candidate rows after AQE) — at 100 TB the big side never moves.
3. ``ann_lsh_topk`` — approximate path for scale: random-hyperplane signatures
   bucket the embeddings; candidates come from the query's bucket (and
   optional multi-probe neighbors), then exact re-rank. Sub-linear candidate
   sets; the bucket column doubles as a partition key so repeated queries
   prune partitions.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.functions.vector import ROUND_DP, cosine_expr


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                min_score: float = 0.0, vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k of one query vector. Deterministic tie-break on id
    (FIXTURES.md §C). Returns (id, score, rank)."""
    qlit = "array(" + ", ".join(f"CAST({float(x)} AS DOUBLE)" for x in query_vec) + ")"
    scored = embeddings.select(
        F.col(id_col),
        F.round(F.expr(cosine_expr(vec_col, qlit)), ROUND_DP).alias("score"),
    )
    if min_score > 0.0:  # reference uses 0.0 → keep-all (RAG.java:54)
        scored = scored.filter(F.col("score") >= min_score)
    topk = scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    return topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score"), F.col(id_col))),
    )


def knn_join(queries: DataFrame, embeddings: DataFrame, k: int = 10,
             query_id: str = "query_id", query_vec: str = "query_vec",
             vec_col: str = "embedding", id_col: str = "vec_id",
             min_score: float = 0.0) -> DataFrame:
    """Exact k-NN for every row of `queries` (assumed small → broadcast).

    The cross join is broadcast-nested-loop with the QUERY side broadcast:
    the embeddings table is scanned once, never shuffled. The per-query
    top-k window partitions by query_id — shuffle volume is bounded by
    rows(embeddings) × rows(queries), so for large query sets use
    ann_lsh_topk instead.
    """
    scored = embeddings.crossJoin(broadcast(queries)).select(
        F.col(query_id),
        F.col(id_col),
        F.round(F.expr(cosine_expr(vec_col, query_vec)), ROUND_DP).alias("score"),
    )
    if min_score > 0.0:
        scored = scored.filter(F.col("score") >= min_score)
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hyperplanes(dims: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes for cosine LSH signatures."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((num_planes, dims))
    return [[float(x) for x in row] for row in h]


def signature_col(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-bit signature: bit i = 1 iff dot(vec, plane_i) >= 0. Pure SQL
    HOFs — stays in codegen. Returns an INT bucket id."""
    bits = []
    for i, p in enumerate(planes):
        plit = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in p) + ")"
        dot = (f"aggregate(zip_with({vec_col}, {plit}, (x, y) -> CAST(x AS DOUBLE) * y), "
               f"CAST(0.0 AS DOUBLE), (s, v) -> s + v)")
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def with_ann_buckets(embeddings: DataFrame, vec_col: str = "embedding",
                     cfg: EngineConfig = DEFAULT_CONFIG,
                     dims: int | None = None) -> DataFrame:
    """Attach the LSH bucket column. At scale, persist this partitioned by
    `bucket` so ANN queries prune partitions at the scan."""
    if dims is None:
        dims = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dims, cfg.ann_num_planes, cfg.seed)
    return embeddings.withColumn("bucket", signature_col(vec_col, planes))


def ann_lsh_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket (plus buckets at
    Hamming distance ≤ multiprobe), exact re-rank inside. Recall grows with
    multiprobe; candidates shrink ~2^planes-fold. Bench-path only — the
    oracle checks the exact operators."""
    dims = len(query_vec)
    planes = hyperplanes(dims, cfg.ann_num_planes, cfg.seed)
    q = np.array(query_vec)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(q, np.array(p))) >= 0:
            qsig |= 1 << i
    probe = {qsig}
    if multiprobe >= 1:
        probe |= {qsig ^ (1 << i) for i in range(cfg.ann_num_planes)}
    bucketed = with_ann_buckets(embeddings, vec_col, cfg, dims)
    cand = bucketed.filter(F.col("bucket").isin(list(probe)))
    return cosine_topk(cand, query_vec, k, vec_col=vec_col, id_col=id_col)
