"""Table-maintenance operators for the incrementally-maintained vector store
(streaming/ingest.py): each micro-batch appends small parquet files; at scale
the store degrades into a small-files problem without periodic compaction —
the OPTIMIZE-style rewrite the reference's OpenSearch index got for free from
Lucene segment merging (SURVEY.md §2.4 'index maintenance').
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession

from flink_rag_spark.session import ensure_runtime_confs


def store_file_count(store_path: str) -> int:
    # flat stores write at the root; the bucketed ingest store writes under
    # bucket=N/ partition directories — count both layouts
    return len(glob.glob(os.path.join(store_path, "*.parquet"))
               + glob.glob(os.path.join(store_path, "*", "*.parquet")))


def compact_store(spark: SparkSession, store_path: str,
                  target_partitions: int | None = None) -> int:
    """Rewrite the store into `target_partitions` files (default: sized by
    AQE via coalesce). Write-then-swap keeps readers consistent: the rewrite
    lands in a sibling directory and replaces the store atomically at the
    directory level (a real deployment would do this under a table format's
    transaction log — the rewrite itself is identical).

    Returns the new file count."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(store_path)
    if target_partitions:
        df = df.coalesce(target_partitions)
    tmp = store_path.rstrip("/") + ".compact.tmp"
    writer = df.write.mode("overwrite")
    if "bucket" in df.columns:  # preserve the ingest store's pruning layout
        writer = writer.partitionBy("bucket")
    writer.parquet(tmp)
    old = store_path.rstrip("/") + ".compact.old"
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    shutil.rmtree(old)
    return store_file_count(store_path)
