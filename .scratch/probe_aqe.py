import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from flink_rag_spark.session import get_spark
from flink_rag_spark.sources.tables import load_table
import flink_rag_spark.operators.incremental as inc
from flink_rag_spark.operators.util import unpersist_cached_deps
SF="/root/testdata/sf0.1"; N=32; TH=0.3
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, SF, "documents").select("doc_id","text")
corpus = docs.filter(F.col("doc_id")%20!=0); batch = docs.filter(F.col("doc_id")%20==0)
path = tempfile.mkdtemp()+"/idx"
inc.build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=N)
def run(tag, n=3):
    for i in range(n):
        t0=time.perf_counter()
        out=inc.incremental_neardup_pairs(spark,batch,"text","doc_id",path,TH,n_parts=N)
        c=out.count(); print(f"{tag} {i}: {time.perf_counter()-t0:.3f}s pairs={c}",flush=True)
        unpersist_cached_deps(out)
run("aqe-on")
spark.conf.set("spark.sql.adaptive.enabled","false")
run("aqe-off")
spark.conf.set("spark.sql.adaptive.enabled","true")
spark.conf.set("spark.sql.shuffle.partitions","8")
run("aqe-on-8part")
