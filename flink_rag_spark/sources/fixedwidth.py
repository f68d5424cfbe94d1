"""Custom connector via the Python DataSource API (Spark ≥4): a fixed-width
text-file reader — a format Spark has no built-in source for.

Demonstrates the engine's connector extension surface (the reference is
hard-wired to Kafka; here new formats plug into the same ``spark.read``
pipeline as parquet/CSV). One partition per file → scales with file count;
fields are sliced by byte offsets from the ``widths`` option and cast to the
user-supplied schema.

Usage:
    register_fixedwidth(spark)
    df = (spark.read.format("fixedwidth")
          .schema("name string, qty int, price double")
          .option("widths", "8,4,10")
          .load("/data/fw/"))
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _cast(value: str, dtype: str):
    value = value.strip()
    if value == "":
        return None
    if dtype in ("int", "integer", "bigint", "long", "smallint"):
        return int(value)
    if dtype in ("double", "float"):
        return float(value)
    return value


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FixedWidthReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        self.widths = [int(w) for w in options.get("widths", "").split(",") if w]
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        if len(self.widths) != len(self.fields):
            raise ValueError(
                f"widths ({len(self.widths)}) must match schema arity "
                f"({len(self.fields)})")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*")))
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        offsets = []
        pos = 0
        for w in self.widths:
            offsets.append((pos, pos + w))
            pos += w
        with open(partition.path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line.strip():
                    continue
                yield tuple(
                    _cast(line[a:b], dtype)
                    for (a, b), (_name, dtype) in zip(offsets, self.fields))


class FixedWidthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def reader(self, schema) -> DataSourceReader:
        return FixedWidthReader(self.options, schema)


def register_fixedwidth(spark) -> None:
    # the DataSource class is pickled by reference into Spark's Python
    # planning/executor workers — the package must be on their path
    from flink_rag_spark.session import ship_package
    ship_package(spark)
    spark.dataSource.register(FixedWidthDataSource)
