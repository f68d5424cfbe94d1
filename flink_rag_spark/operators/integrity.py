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


def merge_manifests(base: DataFrame, delta: DataFrame,
                    remove: bool = False) -> DataFrame:
    """Incremental manifest maintenance: fold a batch's manifest (the
    SAME ``dataset_manifest`` aggregate over just the batch) into a base
    manifest — per bucket, counts and byte totals add (or subtract) and
    the content XOR folds in either direction because XOR is its own
    inverse. This is what makes the manifest a maintainable artifact at
    100 TB: every ingest micro-batch (or ``forget_documents`` deletion)
    updates it with |buckets|-row arithmetic instead of a corpus rescan,
    and an incrementally-maintained manifest is BIT-IDENTICAL to a
    rebuild for n_rows / content_xor / total_len.

    ``min_key``/``max_key`` stay exact under adds (min-of-mins); under
    removes they remain valid conservative BOUNDS (a removed extremum
    can't be retracted without a rescan — same caveat as the dedup
    index's sizes/ min log), so equality checks between manifests should
    compare the three exact columns. Buckets that end exactly empty
    (n_rows = 0 AND content_xor = 0) are dropped; anything else stays
    visible — a NEGATIVE count, or a zero count with a NON-ZERO residual
    XOR (a remove-delta folded twice can net the count to 0 while the
    XOR re-adds the removed hashes), can only mean a delta was folded
    twice (or removed without being added) and an integrity artifact
    must surface that, not filter it away.
    Replay protection is the CALLER's batch-id guard (the codebook and
    text-index paths show the pattern): fold each ingest batch's delta
    exactly once."""
    cols = ["n_rows", "content_xor", "min_key", "max_key", "total_len"]
    b = base.select("bucket",
                    *[F.col(c).alias(f"_b_{c}") for c in cols])
    d = delta.select("bucket",
                     *[F.col(c).alias(f"_d_{c}") for c in cols])
    sign = -1 if remove else 1
    j = b.join(d, on="bucket", how="full")
    zero = F.lit(0).cast("long")
    n = (F.coalesce(F.col("_b_n_rows"), zero)
         + sign * F.coalesce(F.col("_d_n_rows"), zero))
    out = j.select(
        "bucket",
        n.alias("n_rows"),
        (F.coalesce(F.col("_b_content_xor"), zero)
         .bitwiseXOR(F.coalesce(F.col("_d_content_xor"), zero)))
        .alias("content_xor"),
        (F.least(F.col("_b_min_key"), F.col("_d_min_key"))
         if not remove else F.col("_b_min_key")).alias("min_key"),
        (F.greatest(F.col("_b_max_key"), F.col("_d_max_key"))
         if not remove else F.col("_b_max_key")).alias("max_key"),
        (F.coalesce(F.col("_b_total_len"), zero)
         + sign * F.coalesce(F.col("_d_total_len"), zero))
        .alias("total_len"))
    return out.filter((F.col("n_rows") != 0) | (F.col("content_xor") != 0))
