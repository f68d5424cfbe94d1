"""Dataset manifest — per-bucket content checksums for integrity audit.

At 100 TB, "are these two copies of the corpus identical?" cannot be a
row-by-row comparison: replication to another region, a backfill after
an outage, or a format migration all need a CHEAP fingerprint whose
granularity localizes any divergence. The manifest is |buckets| rows —
per deterministic key-hash bucket: row count, an order-independent XOR
of content hashes, key range, and total content bytes. Two manifests
diff in milliseconds (they're tiny), and a mismatched bucket bounds the
expensive row-level `diffing.snapshot_diff` to 1/|buckets| of the data.

Plan shape: ONE scan, one hash + bucket expression in codegen, one
partial-aggregating groupBy(bucket) — XOR and SUM are associative and
commutative, so map-side combine does almost all the work and the final
exchange carries |buckets| rows per task. Layout-independent by
construction: the bucket is a pure function of the KEY (not the file or
partition a row sits in), so a repartitioned, re-sorted, or re-written
copy manifests identically.

The reference has no integrity surface at all — its store is OpenSearch
and divergence is undetectable short of a full dump.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.functions.hashing import poly_hash_duck, poly_hash_expr


def dataset_manifest(df: DataFrame, key_col: str, content_col: str,
                     buckets: int = 256) -> DataFrame:
    """(bucket, n_rows, content_xor, min_key, max_key, total_len) — one
    row per key-hash bucket. ``content_xor`` XORs the poly hash of
    ``content_col`` (order-independent, overflow-free, < 2^31 so any
    engine's BIGINT holds it); equal manifests ⇒ equal (key, content)
    multisets per bucket up to hash collision."""
    h_key = F.expr(poly_hash_expr(f"cast({key_col} as string)"))
    h_content = F.expr(poly_hash_expr(content_col))
    return (df.select(
        F.pmod(h_key, F.lit(buckets)).alias("bucket"),
        F.col(key_col).alias("_k"),
        h_content.alias("_hc"),
        F.length(F.col(content_col)).cast("long").alias("_len"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.expr("bit_xor(_hc)").alias("content_xor"),
             F.min("_k").alias("min_key"),
             F.max("_k").alias("max_key"),
             F.sum("_len").alias("total_len")))


def dataset_manifest_duck(table: str, key_col: str, content_col: str,
                          buckets: int = 256) -> str:
    """DuckDB mirror of ``dataset_manifest`` — same hashes, same bucket
    assignment, same aggregates (sums CAST to BIGINT: DuckDB's SUM
    promotes to HUGEINT, Spark's stays int64)."""
    h_key = poly_hash_duck(f"CAST({key_col} AS VARCHAR)")
    h_content = poly_hash_duck(content_col)
    return f"""
WITH h AS (
  SELECT ({h_key}) % {buckets} AS bucket, {key_col} AS k,
         ({h_content}) AS hc,
         CAST(length({content_col}) AS BIGINT) AS len
  FROM {table})
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       bit_xor(hc) AS content_xor,
       MIN(k) AS min_key, MAX(k) AS max_key,
       CAST(SUM(len) AS BIGINT) AS total_len
FROM h GROUP BY bucket
"""
