"""Streaming source/sink builders.

The reference's sources are value-only Kafka string topics
(``AiJob.java:19-24`` questions w/ committed offsets;
``StreamingStoreKnowledge.java:30-37`` knowledge w/ EARLIEST offsets).
Spark equivalents keep the same semantics; a file source stands in where no
Kafka broker exists (tests, this container) — same downstream code either
way, which is the point of Structured Streaming's unified source API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig


def kafka_string_source(spark: SparkSession, topic: str,
                        cfg: EngineConfig = DEFAULT_CONFIG,
                        starting_offsets: str = "latest") -> DataFrame:
    """value-only UTF-8 string stream from Kafka (A1/A2 mapping).

    ``starting_offsets='earliest'`` reproduces the knowledge source's
    full-replay-on-cold-start behavior (StreamingStoreKnowledge.java:34).
    Requires the spark-sql-kafka package on the cluster — not available in
    the test container, so tests use file_string_source instead.
    """
    return (spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
            .select(F.col("value").cast("string").alias("value")))


def file_string_source(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """One string per line from text files landing in `path` — the broker-less
    stand-in for the reference's string topics."""
    r = spark.readStream
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.format("text").load(path).select(F.col("value"))


def kafka_string_sink(df: DataFrame, topic: str,
                      checkpoint: str,
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """Write a `value: string` stream to Kafka — at-least-once, matching the
    reference's answers sink guarantee (AiJob.java:32)."""
    return (df.selectExpr("CAST(value AS STRING) AS value")
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint))
