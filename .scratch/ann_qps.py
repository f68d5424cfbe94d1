import sys, time, tempfile
sys.path.insert(0, "/root/repo")
from flink_rag_spark.session import get_spark
from flink_rag_spark.sources.tables import load_table
from flink_rag_spark.plans.rag import rag_answer
from flink_rag_spark.operators.index import build_ivf_index, load_ivf_index
SF="/root/testdata/sf0.1"
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
def force(df): df.collect()
n_q=1000
qs=[f"question number {i} about topic {i % 37}" for i in range(n_q)]
# warm the session like bench does (exact path first)
force(rag_answer(spark, SF, questions=qs))
idx = tempfile.mkdtemp()+"/ivf"
build_ivf_index(spark, load_table(spark, SF, "embeddings"), idx)
cents, cells = load_ivf_index(spark, idx)
cells = cells.persist(); cells.count()
runs=[]
for i in range(7):
    t0=time.perf_counter()
    force(rag_answer(spark, SF, questions=qs, retrieval="ann", ann_index=(cents, cells)))
    dt=time.perf_counter()-t0
    runs.append(dt)
    print(f"ann run {i}: {dt:.3f}s = {n_q/dt:.1f} q/s", flush=True)
runs.sort()
print(f"median qps: {n_q/runs[len(runs)//2]:.1f}  best: {n_q/runs[0]:.1f}", flush=True)
