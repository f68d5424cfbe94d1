"""Stage-by-stage timing of the probe's driver-side job chain (bench shape:
n_parts=32, threshold=0.3)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from flink_rag_spark.session import get_spark  # noqa: E402
from flink_rag_spark.sources.tables import load_table  # noqa: E402
from flink_rag_spark.config import DEFAULT_CONFIG  # noqa: E402
from flink_rag_spark.operators.incremental import (  # noqa: E402
    MAX_LOCAL_KEYS,
    _band_rows_with_pkey,
    _shingle_sets_with_pkey,
    build_dedup_index,
    incremental_neardup_pairs,
)
from flink_rag_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    verify_jaccard_candidates,
)
from flink_rag_spark.operators.util import unpersist_cached_deps  # noqa: E402

SF = "/root/testdata/sf0.1"
N_PARTS = 32
THRESH = 0.3
spark = get_spark(cpus=32)
spark.sparkContext.setLogLevel("ERROR")
cfg = DEFAULT_CONFIG

docs = load_table(spark, SF, "documents").select("doc_id", "text")
corpus = docs.filter(F.col("doc_id") % 20 != 0)
batch = docs.filter(F.col("doc_id") % 20 == 0)

import tempfile

path = tempfile.mkdtemp() + "/idx"
t0 = time.perf_counter()
build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=N_PARTS)
print(f"build: {time.perf_counter()-t0:.3f}s", flush=True)

# warm-up run (parity with bench median-of-3 after warm JVM)
out = incremental_neardup_pairs(spark, batch, "text", "doc_id", path,
                                THRESH, n_parts=N_PARTS)
out.count()
unpersist_cached_deps(out)

# instrumented run: replicate the function's stages with timers
root = path.rstrip("/")
T = time.perf_counter
t_start = T()
sh_batch = _shingle_sets_with_pkey(batch, "text", "doc_id", cfg,
                                   N_PARTS).persist()
nb = _band_rows_with_pkey(batch, "text", "doc_id", cfg, N_PARTS,
                          shingle_sets=sh_batch).persist()
store = spark.read.parquet(root + "/bands")
within = lsh_candidate_pairs(batch, "text", "doc_id", cfg, band_rows=nb)
sh_new = sh_batch.select("doc_id", "sh")
t1 = T(); print(f"  setup (lazy): {t1-t_start:.3f}s", flush=True)

key_schema = nb.select("band", "band_key").schema
key_rows = (nb.select("band", "band_key", "bkp").distinct()
            .limit(MAX_LOCAL_KEYS + 1).collect())
t2 = T(); print(f"  job1 key collect ({len(key_rows)} keys): {t2-t1:.3f}s",
                flush=True)
hit_bkps = sorted({r["bkp"] for r in key_rows})
batch_keys = spark.createDataFrame(
    [(r["band"], r["band_key"]) for r in key_rows], key_schema)
store_bands = (store.filter(F.col("bkp").isin(hit_bkps))
               .join(F.broadcast(batch_keys),
                     on=["band", "band_key"], how="left_semi"))
sizes = spark.read.parquet(root + "/sizes")
stats = (sizes.filter(F.col("bkp").isin(hit_bkps))
         .join(F.broadcast(batch_keys), on=["band", "band_key"],
               how="left_semi")
         .groupBy("band", "band_key")
         .agg(F.sum("n").alias("_n"), F.min("rep").alias("_rep")))
stat_rows = stats.collect()
t3 = T(); print(f"  job2 stats collect ({len(stat_rows)} buckets): "
                f"{t3-t2:.3f}s", flush=True)
max_bucket_size = cfg.lsh_max_bucket
cold_keys = spark.createDataFrame(
    [(r["band"], r["band_key"]) for r in stat_rows
     if r["_n"] <= max_bucket_size], key_schema)
cold_filter = F.broadcast(cold_keys)
from pyspark.sql.types import StructField, StructType
hot_schema = StructType([StructField("id_old", nb.schema["doc_id"].dataType)]
                        + list(key_schema.fields))
hot_old = spark.createDataFrame(
    [(r["_rep"], r["band"], r["band_key"]) for r in stat_rows
     if r["_n"] > max_bucket_size], hot_schema)
cold_old = (store_bands.join(cold_filter, on=["band", "band_key"],
                             how="left_semi")
            .select(F.col("doc_id").alias("id_old"), "band", "band_key"))
old_side = cold_old.unionByName(hot_old)
new_side = nb.select(F.col("doc_id").alias("id_new"), "band", "band_key")
cross = (new_side.join(old_side, on=["band", "band_key"])
         .filter(F.col("id_new") != F.col("id_old"))
         .select(F.least("id_new", "id_old").alias("id_a"),
                 F.greatest("id_new", "id_old").alias("id_b"))
         .distinct()).persist()
candidates = cross.unionByName(within).distinct()
old_ids = (cross.select(F.col("id_a").alias("cid"))
           .unionByName(cross.select(F.col("id_b").alias("cid")))
           .distinct())
hit_sbps = [r["sbp"] for r in
            old_ids.select(F.pmod("cid", F.lit(N_PARTS)).alias("sbp"))
            .distinct().collect()]
t4 = T(); print(f"  job3 cross+sbp collect ({len(hit_sbps)} sbps): "
                f"{t4-t3:.3f}s", flush=True)
sh_old = (spark.read.parquet(root + "/shingles")
          .filter(F.col("sbp").isin(hit_sbps))
          .join(old_ids, F.col("doc_id") == F.col("cid"), "left_semi")
          .dropDuplicates(["doc_id"])
          .select("doc_id", "sh"))
sh = sh_new.unionByName(
    sh_old.join(sh_new.select("doc_id"), on="doc_id", how="left_anti"))
res = verify_jaccard_candidates(candidates, sh, "doc_id", THRESH)
n = res.count()
t5 = T(); print(f"  job4 verify count ({n} pairs): {t5-t4:.3f}s", flush=True)
print(f"  TOTAL instrumented: {t5-t_start:.3f}s", flush=True)
for df in (sh_batch, nb, cross):
    df.unpersist()

# then 3 plain runs for reference
for i in range(3):
    t0 = time.perf_counter()
    out = incremental_neardup_pairs(spark, batch, "text", "doc_id", path,
                                    THRESH, n_parts=N_PARTS)
    out.count()
    dt = time.perf_counter() - t0
    unpersist_cached_deps(out)
    print(f"probe run {i}: {dt:.3f}s", flush=True)
