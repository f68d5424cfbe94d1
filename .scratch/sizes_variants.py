import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from flink_rag_spark.session import get_spark
from flink_rag_spark.sources.tables import load_table
from flink_rag_spark.config import DEFAULT_CONFIG
from flink_rag_spark.operators.incremental import (
    _band_rows_with_pkey, _bucket_size_deltas)
SF="/root/testdata/sf0.1"; N=32
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
cfg = DEFAULT_CONFIG
docs = load_table(spark, SF, "documents").select("doc_id","text")
corpus = docs.filter(F.col("doc_id")%20!=0)
bands = _band_rows_with_pkey(corpus, "text", "doc_id", cfg, N).persist()
bands.count()  # warm cache
import glob
def timeit(tag, fn, n=3):
    for i in range(n):
        path = tempfile.mkdtemp()+"/sizes"
        t0=time.perf_counter(); fn(path)
        files=len(glob.glob(path+"/*/*.parquet"))
        print(f"{tag} {i}: {time.perf_counter()-t0:.3f}s files={files}", flush=True)
d = _bucket_size_deltas(bands, "doc_id")
timeit("current (repartition bkp)", lambda p: d.repartition("bkp").write.mode("overwrite").partitionBy("bkp").parquet(p))
timeit("repartition(8,bkp)", lambda p: d.repartition(8,"bkp").write.mode("overwrite").partitionBy("bkp").parquet(p))
timeit("no-repartition", lambda p: d.write.mode("overwrite").partitionBy("bkp").parquet(p))
timeit("coalesce(8)", lambda p: d.coalesce(8).write.mode("overwrite").partitionBy("bkp").parquet(p))
