"""Audit text_quality_stats & stats_order_prices at 1x vs 10x: task counts,
partition counts, CPU saturation."""
import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from flink_rag_spark.session import get_spark
from flink_rag_spark.plans.catalog import query_fns
from flink_rag_spark.sources.scaleup import scale_up_tables
SF="/root/testdata/sf0.1"
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
fns = query_fns()
dst = tempfile.mkdtemp()+"/scale"
t0=time.perf_counter(); scale_up_tables(spark, SF, dst, k=10)
print(f"gen: {time.perf_counter()-t0:.1f}s", flush=True)

sc = spark.sparkContext
for name in ("text_quality_stats", "stats_order_prices"):
    for label, src in (("1x", SF), ("10x", dst)):
        # warm-up + timed
        for it in range(2):
            tracker = sc.statusTracker()
            before = tracker.getJobIdsForGroup(None) or []
            t0=time.perf_counter()
            df = fns[name](spark, src)
            df.collect()
            dt=time.perf_counter()-t0
        # stage structure from the final run's plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        ntasks = plan.count("Scan parquet")
        print(f"{name} {label}: {dt:.3f}s", flush=True)
    # partition counts of the scan at 10x
    df = fns[name](spark, dst)
    rdd_parts = df.rdd.getNumPartitions()
    print(f"  {name} 10x output partitions: {rdd_parts}", flush=True)
