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


def delete_from_store(spark: SparkSession, store_path: str,
                      ids: list[int], id_col: str = "vec_id") -> int:
    """Targeted deletion (the right-to-be-forgotten pass): remove the
    given ids from the bucketed ingest store by rewriting ONLY the bucket
    partitions that can contain them.

    O(touched buckets), not O(store): the ids' buckets are computed
    driver-side (same pmod layout streaming/ingest.py writes), the pruned
    scan reads just those partitions, and dynamic partition overwrite
    (operators/rollup.py's maintenance idiom) rewrites just those
    directories — a 3-id deletion against a petabyte store touches ≤ 3
    buckets. Flat (unbucketed) stores fall back to a full write-then-swap
    rewrite. The id list is driver-side by contract (deletion requests
    are human/audit-scale); wire a frame-valued variant through a join if
    deletions ever arrive as data. Single-writer boundary as per README.

    Returns the number of rows deleted."""
    import pyspark.sql.functions as F

    from flink_rag_spark.streaming.ingest import STORE_BUCKETS

    ensure_runtime_confs(spark)
    if not ids:
        return 0
    df = spark.read.parquet(store_path)
    if "bucket" in df.columns:
        buckets = sorted({i % STORE_BUCKETS for i in ids})
        touched = df.filter(F.col("bucket").isin(buckets))
        n_before = touched.count()
        kept = (touched.filter(~F.col(id_col).isin(ids))
                .repartition("bucket")
                .localCheckpoint(eager=True))  # cut the self-read lineage
        n_deleted = n_before - kept.count()
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (kept.write.mode("overwrite").partitionBy("bucket")
             .parquet(store_path))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # dynamic overwrite only replaces partitions PRESENT in the write:
        # a bucket emptied by the deletion writes nothing and would keep
        # its stale files — remove those directories explicitly
        kept_buckets = {r["bucket"] for r in
                        kept.select("bucket").distinct().collect()}
        for b in set(buckets) - kept_buckets:
            shutil.rmtree(os.path.join(store_path, f"bucket={b}"),
                          ignore_errors=True)
        return int(n_deleted)
    # flat store: full rewrite, write-then-swap
    n_before = df.count()
    kept = df.filter(~F.col(id_col).isin(ids))
    tmp = store_path.rstrip("/") + ".delete.tmp"
    kept.write.mode("overwrite").parquet(tmp)
    old = store_path.rstrip("/") + ".delete.old"
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    shutil.rmtree(old)
    return int(n_before - spark.read.parquet(store_path).count())
