"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    has fewer partitions than cores.

    Compute-heavy narrow stages (per-row cosine, char-level hashing) are
    otherwise pinned to however many partitions the scan produced — for a
    single small parquet file that is ONE task regardless of cores. At real
    scale the scan already yields ≥cores partitions and this is a no-op; the
    repartition cost is only paid exactly when the input is small enough for
    it to be cheap."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
