"""Hard-negative mining — contrastive-training pair construction.

Training retrieval/embedding models (DPR, Karpukhin et al. 2020; SimCSE;
the models behind the reference's OpenAI embedding endpoint,
``EmbeddingConfig.java``) needs, for every anchor, the candidates that
are MOST similar under the current geometry while being known
non-matches — "hard" negatives, far more informative than random ones.
Given a labeled embedding table, that is a k-NN join with a label
inequality predicate pushed below the top-k.

Spark-first shape, inherited from similarity.knn_join: the anchor set
broadcasts (bounded — a training batch or sampled anchor pool), the
corpus is scanned ONCE and never shuffled, the ``label != label`` and
``id != id`` predicates filter INSIDE the broadcast-nested-loop join
before any cosine is computed, and the same size-gated per-partition
partial top-k (``_partition_topk``) cuts each scan partition to ≤ k
rows per anchor before the ranking window — shuffle volume is
|anchors| × k × partitions, never |anchors| × |corpus|. For anchor sets
too large to broadcast, run per-shard over an IVF-pruned candidate set
(operators/index.py) exactly like ann_knn_join; the exact path here is
the recall-1.0 oracle tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.functions.vector import ROUND_DP, cosine_duck, cosine_expr
from flink_rag_spark.operators.similarity import _partition_topk
from flink_rag_spark.operators.util import (
    estimated_scan_rows,
    widen_if_narrow as _widen_if_narrow,
)


def hard_negative_mine(anchors: DataFrame, corpus: DataFrame, k: int = 5,
                       id_col: str = "vec_id",
                       label_col: str = "label",
                       vec_col: str = "embedding",
                       partial_topk: bool | None = None,
                       cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """For every anchor row, the top-``k`` corpus rows by cosine whose
    ``label_col`` DIFFERS from the anchor's (and whose id differs) —
    (anchor_id, vec_id, label, score, rank), deterministic tie-break on
    candidate id. ``anchors`` needs (id_col, vec_col, label_col) and is
    assumed broadcastable; ``corpus`` is scanned once, unshuffled."""
    a = anchors.select(F.col(id_col).alias("_anchor_id"),
                       F.col(vec_col).alias("_anchor_vec"),
                       F.col(label_col).alias("_anchor_label"))
    scored = (_widen_if_narrow(corpus).crossJoin(broadcast(a))
              .filter((F.col(label_col) != F.col("_anchor_label"))
                      & (F.col(id_col) != F.col("_anchor_id")))
              .select(F.col("_anchor_id").alias("anchor_id"),
                      F.col(id_col), F.col(label_col),
                      F.round(F.expr(cosine_expr(vec_col, "_anchor_vec")),
                              ROUND_DP).alias("score")))
    if partial_topk is None:
        est = estimated_scan_rows(corpus)
        partial_topk = est is None or est >= cfg.partial_topk_min_rows
    if partial_topk:
        scored = _partition_topk(scored, "anchor_id", id_col, k)
    w = Window.partitionBy("anchor_id").orderBy(F.desc("score"),
                                                F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hard_negatives_duck(anchor_ids: list[int], k: int = 5,
                        id_col: str = "vec_id",
                        label_col: str = "label",
                        vec_col: str = "embedding",
                        table: str = "embeddings") -> str:
    """DuckDB mirror: brute-force cosine over the label-filtered cross
    join, same rounding and tie-breaks."""
    ids = ", ".join(str(int(i)) for i in anchor_ids)
    return f"""
WITH a AS (
  SELECT {id_col} AS anchor_id, {vec_col} AS avec, {label_col} AS albl
  FROM {table} WHERE {id_col} IN ({ids})),
scored AS (
  SELECT a.anchor_id, e.{id_col}, e.{label_col},
         ROUND({cosine_duck(f'e.{vec_col}', 'a.avec')}, {ROUND_DP})
           AS score
  FROM {table} e CROSS JOIN a
  WHERE e.{label_col} <> a.albl AND e.{id_col} <> a.anchor_id),
ranked AS (
  SELECT anchor_id, {id_col}, {label_col}, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
                                 ORDER BY score DESC, {id_col}) AS INT)
           AS rank
  FROM scored)
SELECT anchor_id, {id_col}, {label_col}, score, rank
FROM ranked WHERE rank <= {k}
"""
