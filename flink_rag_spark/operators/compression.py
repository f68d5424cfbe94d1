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


# ---- seeded random projection (Johnson-Lindenstrauss dim reduction) ----

#: mixing constants for the deterministic ±1 projection matrix: the sign
#: of entry (i=input dim, j=output dim) is the parity of
#: ((i·P1 + j + 1)² · P2) mod BIG — the SQUARING is load-bearing: a
#: linear index hash has parity ≡ parity(i+j) (a rank-1 sign matrix, no
#: projection at all); the quadratic term makes the mod-BIG wrap count
#: vary fast in both indices, giving a full-rank matrix with ~0 column
#: correlation (asserted in tests/test_round7_ops.py). Exact in int64:
#: (1536·7919+64+1)² · 104729 ≈ 1.5e16 « 2^63
_RP_P1, _RP_P2, _RP_BIG = 7919, 104729, 2147483647


def random_projection_expr(vec_col: str, out_dim: int) -> str:
    """SQL expression: project an array<numeric> to ``out_dim`` dims with
    a seeded ±1/√k matrix (Achlioptas' database-friendly JL projection —
    no stored matrix, the sign is a pure function of (i, j), so any
    engine reproduces the SAME projection). Components rounded to
    ROUND_DP for oracle comparability.

    Cost is O(d_in × d_out) inside whole-stage codegen — right for the
    one-off compression pass it is. For very large d at interactive
    latency, the same matrix can be materialized once into numpy and
    applied via the Arrow matmul path (similarity.with_ivf_cells
    pattern); the constants above make both paths bit-compatible."""
    sign = (f"CASE WHEN pmod((CAST(i AS BIGINT) * {_RP_P1} + j + 1) "
            f"* (CAST(i AS BIGINT) * {_RP_P1} + j + 1) "
            f"* {_RP_P2}, {_RP_BIG}) % 2 = 0 THEN 1.0D ELSE -1.0D END")
    return (
        f"transform(sequence(0, {out_dim - 1}), j -> "
        f"round(aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), "
        f"sequence(0, size({vec_col}) - 1), (x, i) -> x * {sign}), "
        f"CAST(0.0 AS DOUBLE), (s, v) -> s + v) "
        f"/ sqrt(CAST({out_dim} AS DOUBLE)), 6))"
    )


def random_projection_duck(vec_col: str, out_dim: int) -> str:
    """DuckDB mirror of random_projection_expr (same signs, same
    left-fold sum via list_reduce, same rounding)."""
    sign = (f"CASE WHEN (((i * {_RP_P1} + j + 1) * (i * {_RP_P1} + j + 1) "
            f"* {_RP_P2}) % {_RP_BIG}) % 2 = 0 THEN 1.0 ELSE -1.0 END")
    return (
        f"list_transform(range(0, {out_dim}), j -> "
        f"round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(0, len({vec_col})), i -> "
        f"CAST(list_extract({vec_col}, i + 1) AS DOUBLE) * {sign})), "
        f"(s, v) -> s + v) / sqrt(CAST({out_dim} AS DOUBLE)), 6))"
    )
