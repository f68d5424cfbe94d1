"""Knowledge-ingestion job: the Spark re-expression of the reference's
``StreamingStoreKnowledge`` (source ``:30-37`` → Embedder map ``:80-97`` →
vector-store sink ``:54-74``).

Differences by design (SURVEY.md §2.1 known-inconsistency fixes):

- ONE embedding config for ingest and retrieval (the reference embeds with a
  library-default model on write, ``StreamingStoreKnowledge.java:88``, but a
  pinned model on read, ``RAG.java:33``).
- The provider is constructed once per executor task and called per Arrow
  batch (the reference's ``open()`` amortization done right), not per record.
- The vector store is a Spark-managed Parquet table maintained by
  ``foreachBatch`` with idempotent content-hash ids — replaying the source
  (the reference's earliest-offsets cold start) cannot duplicate vectors,
  upgrading the sink from at-least-once writes to effectively-once content.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.functions.providers import Provider, embed_text_col
from flink_rag_spark.session import ensure_runtime_confs

# content-addressed id: first 60 bits of md5(text) — deterministic across
# batches/runs, so re-ingesting the same fact is a no-op after the anti-join.
VEC_ID_EXPR = "CAST(conv(substring(md5(value), 1, 15), 16, 10) AS BIGINT)"


def embed_stream(stream: DataFrame, provider: Provider | None = None,
                 cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """value:string stream → (vec_id, text, embedding) — the A5 Embedder."""
    return stream.select(
        F.expr(VEC_ID_EXPR).alias("vec_id"),
        F.col("value").alias("text"),
        embed_text_col(provider, cfg)(F.col("value")).alias("embedding"),
    )


def upsert_batch(batch: DataFrame, store_path: str) -> None:
    """Idempotent append of one micro-batch into the embeddings store.

    Within-batch dups collapse deterministically (min of a stable order);
    against-store dups are dropped with a broadcast-friendly left-anti join
    on vec_id. At real scale the store is a partitioned table (bucket by
    vec_id) and the anti-join prunes to touched partitions; Parquet-append +
    content-keyed ids keeps replays idempotent without a transactional log.
    """
    spark = batch.sparkSession
    deduped = batch.dropDuplicates(["vec_id"])
    try:
        # filesystem-agnostic existence probe (works on DFS paths too,
        # unlike os.path) — PATH_NOT_FOUND just means first batch
        existing = spark.read.parquet(store_path).select("vec_id")
        deduped = deduped.join(existing, on="vec_id", how="left_anti")
    except AnalysisException:
        pass
    deduped.write.mode("append").parquet(store_path)


def run_ingest(spark: SparkSession, source: DataFrame, store_path: str,
               checkpoint: str, provider: Provider | None = None,
               cfg: EngineConfig = DEFAULT_CONFIG,
               available_now: bool = False):
    """Wire source → embed → idempotent store sink; returns the started query.

    ``available_now=True`` drains everything currently in the source and
    stops — the test/batch-backfill trigger; the default processing-time
    trigger mirrors the reference's continuous job.
    """
    ensure_runtime_confs(spark)
    embedded = embed_stream(source, provider, cfg)
    writer = (embedded.writeStream
              .foreachBatch(lambda b, _id: upsert_batch(b, store_path))
              .option("checkpointLocation", checkpoint)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
