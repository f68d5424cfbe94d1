import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from flink_rag_spark.session import get_spark
from flink_rag_spark.sources.tables import load_table
from flink_rag_spark.config import DEFAULT_CONFIG
from flink_rag_spark.operators.incremental import (
    _band_rows_with_pkey, _shingle_sets_with_pkey, _bucket_size_deltas)
SF="/root/testdata/sf0.1"; N=32
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
cfg = DEFAULT_CONFIG
docs = load_table(spark, SF, "documents").select("doc_id","text")
corpus = docs.filter(F.col("doc_id")%20!=0)
for it in range(3):
    path = tempfile.mkdtemp()+"/idx"
    t0=time.perf_counter()
    bands = _band_rows_with_pkey(corpus, "text", "doc_id", cfg, N).persist()
    (bands.repartition("bkp").write.mode("overwrite").partitionBy("bkp").parquet(path+"/bands"))
    t1=time.perf_counter(); print(f"it{it} bands write: {t1-t0:.3f}s",flush=True)
    (_bucket_size_deltas(bands,"doc_id").repartition("bkp").write.mode("overwrite").partitionBy("bkp").parquet(path+"/sizes"))
    t2=time.perf_counter(); print(f"it{it} sizes write: {t2-t1:.3f}s",flush=True)
    bands.unpersist()
    sh=_shingle_sets_with_pkey(corpus,"text","doc_id",cfg,N)
    (sh.repartition("sbp").write.mode("overwrite").partitionBy("sbp").parquet(path+"/shingles"))
    t3=time.perf_counter(); print(f"it{it} shingles write: {t3-t2:.3f}s  TOTAL {t3-t0:.3f}s",flush=True)
