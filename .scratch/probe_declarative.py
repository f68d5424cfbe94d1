"""Time the declarative (non-local-keys) probe branch + DPP conf experiments."""
import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from flink_rag_spark.session import get_spark
from flink_rag_spark.sources.tables import load_table
import flink_rag_spark.operators.incremental as inc
from flink_rag_spark.operators.util import unpersist_cached_deps

SF = "/root/testdata/sf0.1"; N_PARTS = 32; THRESH = 0.3
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, SF, "documents").select("doc_id", "text")
corpus = docs.filter(F.col("doc_id") % 20 != 0)
batch = docs.filter(F.col("doc_id") % 20 == 0)
path = tempfile.mkdtemp() + "/idx"
inc.build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=N_PARTS)

def run(label, n=3):
    for i in range(n):
        t0 = time.perf_counter()
        out = inc.incremental_neardup_pairs(spark, batch, "text", "doc_id", path, THRESH, n_parts=N_PARTS)
        c = out.count()
        print(f"  {label} run {i}: {time.perf_counter()-t0:.3f}s pairs={c}", flush=True)
        unpersist_cached_deps(out)

run("local-keys (current)", 2)
inc.MAX_LOCAL_KEYS = -1
run("declarative", 3)
spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
run("declarative+dppNoStats", 2)
out = inc.incremental_neardup_pairs(spark, batch, "text", "doc_id", path, THRESH, n_parts=N_PARTS)
plan = out._jdf.queryExecution().executedPlan().toString()
import re
print("dynamicpruning in plan:", "dynamicpruning" in plan.lower())
for m in re.finditer(r"PartitionFilters: \[([^\]]{0,80})", plan):
    print("  PF:", m.group(1)[:80])
unpersist_cached_deps(out)
