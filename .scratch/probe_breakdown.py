"""Break down the final probe job: cross vs within vs shingle-read vs verify."""
import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from flink_rag_spark.session import get_spark
from flink_rag_spark.sources.tables import load_table
from flink_rag_spark.config import DEFAULT_CONFIG
from flink_rag_spark.operators.incremental import (
    _band_rows_with_pkey, _shingle_sets_with_pkey, build_dedup_index)
from flink_rag_spark.operators.dedup import lsh_candidate_pairs, verify_jaccard_candidates
SF = "/root/testdata/sf0.1"; N_PARTS = 32; THRESH = 0.3
spark = get_spark(cpus=32); spark.sparkContext.setLogLevel("ERROR")
cfg = DEFAULT_CONFIG
docs = load_table(spark, SF, "documents").select("doc_id", "text")
corpus = docs.filter(F.col("doc_id") % 20 != 0)
batch = docs.filter(F.col("doc_id") % 20 == 0)
path = tempfile.mkdtemp() + "/idx"
build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=N_PARTS)
root = path

def T(label, fn):
    t0 = time.perf_counter(); r = fn(); print(f"  {label}: {time.perf_counter()-t0:.3f}s", flush=True); return r

for it in range(3):
    print(f"iter {it}", flush=True)
    sh_batch = _shingle_sets_with_pkey(batch, "text", "doc_id", cfg, N_PARTS).persist()
    nb = _band_rows_with_pkey(batch, "text", "doc_id", cfg, N_PARTS, shingle_sets=sh_batch).persist()
    T("nb materialize (signature compute)", lambda: nb.count())
    T("sh_batch count (cached?)", lambda: sh_batch.count())
    within = lsh_candidate_pairs(batch, "text", "doc_id", cfg, band_rows=nb)
    T("within count", lambda: within.count())
    store = spark.read.parquet(root + "/bands")
    T("store_bands full count", lambda: store.count())
    keys = nb.select("band","band_key").distinct()
    sb = store.join(F.broadcast(keys), on=["band","band_key"], how="left_semi")
    T("store semi count", lambda: sb.count())
    cross = (F.broadcast(nb.select(F.col("doc_id").alias("id_new"),"band","band_key"))
             .join(sb.select(F.col("doc_id").alias("id_old"),"band","band_key"), on=["band","band_key"])
             .filter(F.col("id_new")!=F.col("id_old"))
             .select(F.least("id_new","id_old").alias("id_a"), F.greatest("id_new","id_old").alias("id_b"))
             .distinct()).persist()
    T("cross materialize", lambda: cross.count())
    old_ids = (cross.select(F.col("id_a").alias("cid")).unionByName(cross.select(F.col("id_b").alias("cid"))).distinct())
    shingles = spark.read.parquet(root + "/shingles")
    T("shingles full count", lambda: shingles.count())
    sh_old = (shingles.join(F.broadcast(old_ids), F.col("doc_id")==F.col("cid"), "left_semi")
              .dropDuplicates(["doc_id"]).select("doc_id","sh"))
    T("sh_old count", lambda: sh_old.count())
    sh_new = sh_batch.select("doc_id","sh")
    sh = sh_new.unionByName(sh_old.join(sh_new.select("doc_id"), on="doc_id", how="left_anti"))
    cand = cross.unionByName(within).distinct()
    res = verify_jaccard_candidates(cand, sh, "doc_id", THRESH)
    T("verify count", lambda: res.count())
    for d in (sh_batch, nb, cross): d.unpersist()
