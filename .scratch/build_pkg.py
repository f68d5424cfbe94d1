import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from flink_rag_spark.session import get_spark
from flink_rag_spark.sources.tables import load_table
from flink_rag_spark.operators.incremental import build_dedup_index
SF="/root/testdata/sf0.1"
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, SF, "documents").select("doc_id","text")
corpus = docs.filter(F.col("doc_id")%20!=0)
for i in range(4):
    p = tempfile.mkdtemp()+"/idx"
    t0=time.perf_counter()
    build_dedup_index(spark, corpus, "text", "doc_id", p, n_parts=32)
    print(f"build {i}: {time.perf_counter()-t0:.3f}s", flush=True)
