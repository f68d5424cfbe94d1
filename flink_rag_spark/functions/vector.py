"""Vector math as Catalyst higher-order-function expressions.

This is the Spark-native replacement for the reference's OpenSearch k-NN
scoring (``RAG.java:51-59``): cosine similarity computed inside whole-stage
codegen on the JVM — no Python in the hot path, no external vector store.

All arithmetic is done in DOUBLE regardless of the stored element type
(driver embeddings are float32) so scores are reproducible against the
DuckDB oracle (SURVEY.md §7.3 float-reproducibility risk). A sequential
left-fold would still differ from DuckDB's SIMD sum in the last ulp, so
every score surfaced in an oracle-checked output is rounded (ROUND_DP).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# decimal places for any similarity score that participates in an
# oracle value-hash comparison. 1e-9-scale fold-order noise disappears;
# genuine score differences (≫1e-6 on this data) survive.
ROUND_DP = 6


def dot_expr(a: str, b: str) -> str:
    """SQL expression: dot product of two array<numeric> columns, in double."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )


def norm_expr(a: str) -> str:
    """SQL expression: L2 norm of an array<numeric> column, in double."""
    return (
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (s, v) -> s + v))"
    )


def cosine_expr(a: str, b: str) -> str:
    """SQL expression: cosine similarity of two array<numeric> columns."""
    return f"({dot_expr(a, b)} / ({norm_expr(a)} * {norm_expr(b)}))"


def cosine_col(a: str, b: str, rounded: bool = False) -> Column:
    c = F.expr(cosine_expr(a, b))
    return F.round(c, ROUND_DP) if rounded else c


# ---- DuckDB-side mirrors (used by plans/*.py to build oracle SQL) ----

def cosine_duck(a: str, b: str) -> str:
    """DuckDB SQL for the same cosine score, computed in double."""
    return (
        f"(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) / "
        f"(sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))) * "
        f"sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
    )
