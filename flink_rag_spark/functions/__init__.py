from flink_rag_spark.functions.vector import (
    dot_expr, norm_expr, cosine_expr, cosine_col,
)
from flink_rag_spark.functions.hashing import (
    poly_hash_expr, poly_hash_duck, minhash_params,
)

__all__ = [
    "dot_expr", "norm_expr", "cosine_expr", "cosine_col",
    "poly_hash_expr", "poly_hash_duck", "minhash_params",
]
