from flink_rag_spark.sources.tables import TABLE_NAMES, load_table, load_tables
from flink_rag_spark.sources.files import (
    read_csv, read_json, read_pruned, write_csv, write_json, write_partitioned,
)
from flink_rag_spark.sources.streams import (
    file_string_source, kafka_string_sink, kafka_string_source,
)
from flink_rag_spark.sources.fixedwidth import register_fixedwidth

__all__ = [
    "TABLE_NAMES", "load_table", "load_tables",
    "read_csv", "read_json", "read_pruned",
    "write_csv", "write_json", "write_partitioned",
    "file_string_source", "kafka_string_sink", "kafka_string_source",
    "register_fixedwidth",
]
