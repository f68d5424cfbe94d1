"""Batch table loaders for the driver testdata (TESTDATA.md / FIXTURES.md §B).

The reference's only sources are value-only Kafka string streams
(``AiJob.java:19-24``, ``StreamingStoreKnowledge.java:30-37``); the engine
generalizes to schema-on-read Parquet relations. Everything stays a
DataFrame so Catalyst gets predicate pushdown + column pruning on the scans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.session import ensure_runtime_confs

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Tables whose size is a CONSTANT of the schema (not the scale factor) —
# always safe to broadcast() explicitly. Everything else (customer, supplier,
# part, orders, lineitem, events, documents, embeddings) grows with SF, so
# join strategy is left to Catalyst/AQE statistics.
BROADCAST_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str,
               widen: bool = True) -> DataFrame:
    """Load one testdata table with engine-canonical column types.

    ``widen``: the driver testdata is one single-row-group parquet file per
    table — the row group is Spark's split unit, so the scan yields ONE
    partition and every downstream narrow stage (filters, decimal partial
    aggregation, hashing) runs on one core no matter the cluster size.
    widen_if_narrow round-robins up to default parallelism ONLY in that
    degenerate case; on a real multi-file/multi-row-group table it is a
    no-op and the plan keeps scan-aligned partitioning. Catalyst still
    pushes filters/pruning through the repartition to the scan."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # parquet TIMESTAMP(NANOS) read as raw int64 nanoseconds (see
        # session.RUNTIME_CONFS); convert with integer division — a double
        # roundtrip at ~1.7e18 ns loses precision and can shift microseconds.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if widen and name not in BROADCAST_TABLES:
        from flink_rag_spark.operators.util import widen_if_narrow
        df = widen_if_narrow(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                register_views: bool = True) -> dict[str, DataFrame]:
    """Load all testdata tables; optionally register temp views so the same
    queries are runnable through ``spark.sql`` as through the DataFrame API."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
