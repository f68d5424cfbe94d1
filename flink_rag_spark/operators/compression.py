"""Embedding compression: per-vector symmetric int8 quantization.

At 100 TB the embedding column IS the storage bill: 1536-dim float32 is
6 KB/row. Symmetric int8 (one scale per vector, q_i = round(v_i / scale),
scale = max|v| / 127) stores 4× smaller and keeps retrieval workable: the
deployment pattern is stored-compressed / query-full-precision —
candidates are scored against dequantized vectors, optionally exact-
re-ranked from the float column for the top results.

Everything is Catalyst HOF expressions (no UDFs), and every arithmetic
step has a DuckDB mirror, so the WHOLE chain — scale, quantized values,
dequantized cosine — is value-verified by the oracle, not just spot-
checked (plans/catalog_extra.py quantized_similarity_vec7, which also
grades an accuracy contract: quantized cosine within a tolerance of
exact).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

QMAX = 127.0


def with_quantized(df: DataFrame, vec_col: str = "embedding",
                   scale_col: str = "qscale",
                   q_col: str = "qvec") -> DataFrame:
    """Add per-vector scale (double) + int8-range codes (array<int>).
    Zero vectors quantize to all-zero codes with scale 0 (dequantize
    reproduces the zero vector exactly)."""
    scale = (f"(array_max(transform({vec_col}, "
             f"x -> abs(CAST(x AS DOUBLE)))) / {QMAX})")
    out = df.withColumn(scale_col, F.expr(scale))
    q = (f"CASE WHEN {scale_col} = 0.0 "
         f"THEN transform({vec_col}, x -> 0) "
         f"ELSE transform({vec_col}, "
         f"x -> CAST(round(CAST(x AS DOUBLE) / {scale_col}) AS INT)) END")
    return out.withColumn(q_col, F.expr(q))


def dequantize_expr(q_col: str = "qvec",
                    scale_col: str = "qscale") -> str:
    """SQL expression: reconstructed array<double> from codes + scale."""
    return f"transform({q_col}, x -> CAST(x AS DOUBLE) * {scale_col})"


# ---- DuckDB mirrors (oracle SQL builders) ----

def quantize_scale_duck(vec_col: str) -> str:
    return (f"(list_max(list_transform(CAST({vec_col} AS DOUBLE[]), "
            f"x -> abs(x))) / {QMAX})")


def dequantize_duck(vec_col: str, scale_sql: str) -> str:
    """Dequantized DOUBLE[] straight from the float column (quantize →
    int → dequantize), mirroring with_quantized + dequantize_expr."""
    return (f"CASE WHEN {scale_sql} = 0.0 "
            f"THEN list_transform(CAST({vec_col} AS DOUBLE[]), x -> 0.0) "
            f"ELSE list_transform(CAST({vec_col} AS DOUBLE[]), "
            f"x -> CAST(CAST(round(x / {scale_sql}) AS INT) AS DOUBLE) "
            f"* {scale_sql}) END")
