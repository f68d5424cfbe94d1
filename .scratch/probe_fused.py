"""Prototype: fused probe — 2 driver jobs instead of 4."""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql.types import StructField, StructType  # noqa: E402

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
build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=N_PARTS)


def fused_probe(new_docs, id_col="doc_id", text_col="text",
                threshold=THRESH, n_parts=N_PARTS,
                max_bucket_size=cfg.lsh_max_bucket, explain=False):
    root = path.rstrip("/")
    sh_batch = _shingle_sets_with_pkey(new_docs, text_col, id_col, cfg,
                                       n_parts).persist()
    nb = _band_rows_with_pkey(new_docs, text_col, id_col, cfg, n_parts,
                              shingle_sets=sh_batch).persist()
    store = spark.read.parquet(root + "/bands")
    sizes = spark.read.parquet(root + "/sizes")
    within = lsh_candidate_pairs(new_docs, text_col, id_col, cfg,
                                 band_rows=nb)
    sh_new = sh_batch.select(id_col, "sh")

    # ---- fused job 1: batch keys AND matched-bucket stats in ONE collect
    nb_keys = nb.select("band", "band_key", "bkp").distinct()
    key_part = (nb_keys
                .withColumn("_n", F.lit(None).cast("bigint"))
                .withColumn("_rep", F.lit(None).cast("bigint"))
                .limit(MAX_LOCAL_KEYS + 1))
    stats_part = (sizes.join(F.broadcast(nb_keys),
                             on=["band", "band_key", "bkp"])
                  .groupBy("band", "band_key", "bkp")
                  .agg(F.sum("n").alias("_n"), F.min("rep").alias("_rep")))
    both = key_part.unionByName(stats_part)
    if explain:
        both.explain("formatted")
    t0 = time.perf_counter()
    rows = both.collect()
    t1 = time.perf_counter()
    key_rows = [r for r in rows if r["_n"] is None]
    stat_rows = [r for r in rows if r["_n"] is not None]
    print(f"  fused job1: {t1-t0:.3f}s ({len(key_rows)} keys, "
          f"{len(stat_rows)} stats)", flush=True)
    assert len(key_rows) <= MAX_LOCAL_KEYS

    hit_bkps = sorted({r["bkp"] for r in key_rows})
    key_schema = nb.select("band", "band_key").schema
    batch_keys = spark.createDataFrame(
        [(r["band"], r["band_key"]) for r in key_rows], key_schema)
    store_bands = (store.filter(F.col("bkp").isin(hit_bkps))
                   .join(F.broadcast(batch_keys),
                         on=["band", "band_key"], how="left_semi"))
    cold_keys = spark.createDataFrame(
        [(r["band"], r["band_key"]) for r in stat_rows
         if r["_n"] <= max_bucket_size], key_schema)
    hot_schema = StructType(
        [StructField("id_old", nb.schema[id_col].dataType)]
        + list(key_schema.fields))
    hot_old = spark.createDataFrame(
        [(r["_rep"], r["band"], r["band_key"]) for r in stat_rows
         if r["_n"] > max_bucket_size], hot_schema)
    cold_old = (store_bands
                .join(F.broadcast(cold_keys),
                      on=["band", "band_key"], how="left_semi")
                .select(F.col(id_col).alias("id_old"), "band", "band_key"))
    old_side = cold_old.unionByName(hot_old)
    new_side = nb.select(F.col(id_col).alias("id_new"), "band", "band_key")
    cross = (F.broadcast(new_side).join(old_side, on=["band", "band_key"])
             .filter(F.col("id_new") != F.col("id_old"))
             .select(F.least("id_new", "id_old").alias("id_a"),
                     F.greatest("id_new", "id_old").alias("id_b"))
             .distinct()).persist()
    candidates = cross.unionByName(within).distinct()

    old_ids = (cross.select(F.col("id_a").alias("cid"))
               .unionByName(cross.select(F.col("id_b").alias("cid")))
               .distinct()
               .withColumn("csbp", F.pmod("cid", F.lit(n_parts))))
    shingles = spark.read.parquet(root + "/shingles")
    sh_old = (shingles
              .join(F.broadcast(old_ids),
                    (F.col(id_col) == F.col("cid"))
                    & (F.col("sbp") == F.col("csbp")), "left_semi")
              .dropDuplicates([id_col])
              .select(id_col, "sh"))
    sh = sh_new.unionByName(
        sh_old.join(sh_new.select(id_col), on=id_col, how="left_anti"))
    res = verify_jaccard_candidates(candidates, sh, id_col, threshold)
    if explain:
        res.explain("formatted")
    t2 = time.perf_counter()
    n = res.count()
    t3 = time.perf_counter()
    print(f"  fused job2 (verify, {n} pairs): {t3-t2:.3f}s", flush=True)
    print(f"  TOTAL: {t3 - tstart:.3f}s", flush=True)
    for d in (sh_batch, nb, cross):
        d.unpersist()
    return n


# warm-up with current implementation
out = incremental_neardup_pairs(spark, batch, "text", "doc_id", path,
                                THRESH, n_parts=N_PARTS)
base_n = out.count()
unpersist_cached_deps(out)
print(f"current impl pairs: {base_n}", flush=True)

tstart = time.perf_counter()
n = fused_probe(batch, explain=True)
assert n == base_n, (n, base_n)
for i in range(3):
    tstart = time.perf_counter()
    n = fused_probe(batch)
    assert n == base_n
for i in range(3):
    t0 = time.perf_counter()
    out = incremental_neardup_pairs(spark, batch, "text", "doc_id", path,
                                    THRESH, n_parts=N_PARTS)
    out.count()
    print(f"current impl run {i}: {time.perf_counter()-t0:.3f}s", flush=True)
    unpersist_cached_deps(out)
