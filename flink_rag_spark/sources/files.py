"""File-format connectors (SURVEY.md §2.2 'File formats': ABSENT in the
reference — it does no file I/O at all — but table stakes for a Spark
engine). Parquet is the primary format (testdata, vector store); CSV and
JSON ride Spark's DataSource V2 with explicit schemas (schema inference is
a full extra pass over the data — never default to it at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.session import ensure_runtime_confs


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True) -> DataFrame:
    """Explicit-schema CSV read. `schema` is a DDL string."""
    ensure_runtime_confs(spark)
    return spark.read.schema(schema).option("header", header).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    ensure_runtime_confs(spark)
    return spark.read.schema(schema).json(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet write — the layout that makes partition
    pruning work: a filter on a partition column prunes whole directories
    before any I/O (static pruning; joins get dynamic partition pruning).
    At 100 TB this is the difference between scanning a day and a decade."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; apply partition-column filters BEFORE any
    other transformation so Catalyst prunes at planning time."""
    ensure_runtime_confs(spark)
    return spark.read.parquet(path)
