from flink_rag_spark.operators.similarity import (
    cosine_topk, knn_join, ann_lsh_topk,
)
from flink_rag_spark.operators.dedup import (
    exact_dedup, minhash_signatures, lsh_candidate_pairs,
)

__all__ = [
    "cosine_topk", "knn_join", "ann_lsh_topk",
    "exact_dedup", "minhash_signatures", "lsh_candidate_pairs",
]
