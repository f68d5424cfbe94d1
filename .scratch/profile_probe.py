"""Profile the incremental dedup probe at sf0.1: per-stage wall time."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from flink_rag_spark.session import get_spark  # noqa: E402
from flink_rag_spark.sources.tables import load_table  # noqa: E402
from flink_rag_spark.operators.incremental import (  # noqa: E402
    build_dedup_index,
    incremental_neardup_pairs,
)
from flink_rag_spark.operators.util import unpersist_cached_deps  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark(cpus=32)
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents").select("doc_id", "text")
corpus = docs.filter(F.col("doc_id") % 20 != 0)
batch = docs.filter(F.col("doc_id") % 20 == 0)

import tempfile

path = tempfile.mkdtemp() + "/idx"
t0 = time.perf_counter()
build_dedup_index(spark, corpus, "text", "doc_id", path)
print(f"build: {time.perf_counter()-t0:.3f}s")

for i in range(4):
    t0 = time.perf_counter()
    out = incremental_neardup_pairs(spark, batch, "text", "doc_id", path, 0.5)
    n = out.count()
    dt = time.perf_counter() - t0
    unpersist_cached_deps(out)
    print(f"probe run {i}: {dt:.3f}s rows={n}")
