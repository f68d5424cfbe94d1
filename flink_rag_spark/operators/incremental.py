"""Incremental near-duplicate detection against a persisted dedup index.

The at-scale problem the batch path can't solve: a 100 TB corpus ingests a
few million new documents a day. Re-running LSH over the whole corpus per
batch is O(corpus) compute; the right shape is O(batch + matched buckets).
(The reference has no dedup at all — this extends the north-star dedup
family in ``operators/dedup.py`` the same way ``operators/index.py``
makes ANN retrieval incremental.)

The index persisted at ``<path>/`` holds two partition-pruned tables:

- ``bands/``  — (doc_id, band, band_key) partitioned by
  ``bkp = pmod(hash(band, band_key), n_parts)``. A new batch's band rows
  land in a bounded set of bkp values; filtering the store scan to that
  set is PARTITION pruning — the untouched corpus partitions are never
  read.
- ``shingles/`` — (doc_id, sh: array<bigint>) partitioned by
  ``sbp = pmod(doc_id, n_parts)``, so the Jaccard verify stage reads only
  the partitions holding candidate old docs, not every corpus shingle set.

Everything derives from the same seeded minhash/shingle machinery as the
batch path, so for corpora without hot buckets the incremental result is
EXACTLY the batch result restricted to batch-involving pairs (asserted in
tests/test_incremental.py). The store-side join carries the SAME hot-bucket
guard as the batch path (dedup.py lsh_candidate_pairs): stored buckets
larger than ``lsh_max_bucket`` contribute only their min-id representative
as a join partner, so a new doc hitting a boilerplate bucket with 10⁶
stored members emits ONE candidate pair, not 10⁶. Bucket sizes are
computed at probe time with a window over the PRUNED store scan — the same
rows the join reads anyway, and append-proof (a build-time size column
would go stale on every append). Divergence semantics mirror the batch
guard exactly: connectivity through the representative is preserved, but a
verify stage can lose a member↔member edge when jaccard(rep, new) < t —
see the batch guard's docstring for when that matters.

At 1000-executor scale: n_parts should be O(cluster parallelism × a few);
the two collects below are bounded by n_parts (pruning keys), never by
data size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.operators.dedup import (
    lsh_band_rows,
    lsh_candidate_pairs,
    shingle_hashes_expr,
    verify_jaccard_candidates,
)
from flink_rag_spark.operators.util import track_cached_deps, widen_if_narrow

DEFAULT_PARTS = 64


def _band_rows_with_pkey(df: DataFrame, text_col: str, id_col: str,
                         cfg: EngineConfig, n_parts: int) -> DataFrame:
    return (lsh_band_rows(df, text_col, id_col, cfg)
            .withColumn("bkp", F.pmod(F.hash("band", "band_key"),
                                      F.lit(n_parts))))


def _shingle_sets_with_pkey(df: DataFrame, text_col: str, id_col: str,
                            cfg: EngineConfig, n_parts: int) -> DataFrame:
    return (widen_if_narrow(df).select(
        F.col(id_col),
        F.array_distinct(
            F.expr(shingle_hashes_expr(text_col, cfg.shingle_size)))
        .alias("sh"))
        .withColumn("sbp", F.pmod(F.col(id_col), F.lit(n_parts))))


def build_dedup_index(spark: SparkSession, docs: DataFrame, text_col: str,
                      id_col: str, path: str,
                      cfg: EngineConfig = DEFAULT_CONFIG,
                      n_parts: int = DEFAULT_PARTS) -> None:
    """Full index build (the once-per-corpus cost). Writes are repartitioned
    on the partition column first so each output partition is one task's
    file, not a small-file explosion of tasks × partitions."""
    bands = _band_rows_with_pkey(docs, text_col, id_col, cfg, n_parts)
    (bands.repartition("bkp").write.mode("overwrite")
     .partitionBy("bkp").parquet(path.rstrip("/") + "/bands"))
    sh = _shingle_sets_with_pkey(docs, text_col, id_col, cfg, n_parts)
    (sh.repartition("sbp").write.mode("overwrite")
     .partitionBy("sbp").parquet(path.rstrip("/") + "/shingles"))


def append_to_dedup_index(spark: SparkSession, new_docs: DataFrame,
                          text_col: str, id_col: str, path: str,
                          cfg: EngineConfig = DEFAULT_CONFIG,
                          n_parts: int = DEFAULT_PARTS) -> None:
    """O(batch) index maintenance: the new docs' band rows and shingle sets
    append into their partitions (same layout, so future incremental runs
    see them). ``compact_dedup_index`` restores one-file-per-partition on
    the store-compaction cadence."""
    bands = _band_rows_with_pkey(new_docs, text_col, id_col, cfg, n_parts)
    (bands.repartition("bkp").write.mode("append")
     .partitionBy("bkp").parquet(path.rstrip("/") + "/bands"))
    sh = _shingle_sets_with_pkey(new_docs, text_col, id_col, cfg, n_parts)
    (sh.repartition("sbp").write.mode("append")
     .partitionBy("sbp").parquet(path.rstrip("/") + "/shingles"))


def compact_dedup_index(spark: SparkSession, path: str,
                        files_per_part: int = 1) -> dict[str, int]:
    """Rewrite ``bands/`` and ``shingles/`` to ``files_per_part`` files per
    partition after a run of appends (each append adds ≤ one file per
    touched partition, so file counts grow O(appends × touched parts)).
    Write-then-swap per table, mirroring ``index.compact_ivf_index`` —
    readers never see a half layout (local/POSIX-mounted filesystem
    assumed). Probe results are bit-identical before/after (asserted in
    tests/test_incremental.py). Returns the data-file count per table."""
    import os
    import shutil

    counts: dict[str, int] = {}
    for sub, pcol in (("bands", "bkp"), ("shingles", "sbp")):
        t_path = os.path.join(path, sub)
        df = spark.read.parquet(t_path)
        n_parts = df.agg(F.countDistinct(pcol)).collect()[0][0] or 1
        cols = [c for c in df.columns if c != pcol]
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]),
                      F.lit(files_per_part))
        tmp, old = t_path + ".compact.tmp", t_path + ".compact.old"
        (df.repartition(n_parts * files_per_part, F.col(pcol), salt)
         .write.mode("overwrite").partitionBy(pcol).parquet(tmp))
        os.rename(t_path, old)
        os.rename(tmp, t_path)
        shutil.rmtree(old)
        counts[sub] = sum(1 for _, _, files in os.walk(t_path)
                          for f in files if f.endswith(".parquet"))
    return counts


def incremental_neardup_pairs(spark: SparkSession, new_docs: DataFrame,
                              text_col: str, id_col: str, path: str,
                              threshold: float,
                              cfg: EngineConfig = DEFAULT_CONFIG,
                              n_parts: int = DEFAULT_PARTS,
                              max_bucket_size: int | None = None) -> DataFrame:
    """Near-dup pairs (id_a, id_b, jaccard ≥ threshold) between a NEW batch
    and the indexed corpus, plus within the batch itself — without reading
    corpus text or recomputing corpus signatures.

    Work: O(batch) signature compute + a partition-pruned equi-join on
    (band, band_key) + O(candidates) verify. Both collects are pruning-key
    sets bounded by n_parts, independent of corpus and batch size. Stored
    buckets larger than ``max_bucket_size`` (default ``cfg.lsh_max_bucket``)
    star-reduce to their min-id representative before the join — the same
    guard, same default, same divergence semantics as the batch path's
    ``lsh_candidate_pairs``.

    The returned frame's lineage holds two persisted batch-bounded
    intermediates; looping callers (streaming ingest) must release them via
    ``operators.util.unpersist_cached_deps(result)`` after materializing.
    """
    from pyspark.errors import AnalysisException

    if max_bucket_size is None:
        max_bucket_size = cfg.lsh_max_bucket
    root = path.rstrip("/")
    # batch-side frames are persisted: they are batch-bounded (never
    # corpus-sized) and each feeds 2+ downstream jobs (the pruning-key
    # collects plus the joins) — without caching the whole signature
    # pipeline re-runs per job
    nb = _band_rows_with_pkey(new_docs, text_col, id_col, cfg,
                              n_parts).persist()

    try:
        store = spark.read.parquet(root + "/bands")
    except AnalysisException:
        store = None  # first batch — no index yet (streaming cold start)

    within = lsh_candidate_pairs(new_docs, text_col, id_col, cfg)
    sh_new = (_shingle_sets_with_pkey(new_docs, text_col, id_col,
                                      cfg, n_parts)
              .select(id_col, "sh"))
    if store is None:
        return track_cached_deps(
            verify_jaccard_candidates(within, sh_new, id_col, threshold),
            [nb])

    # partition pruning: only store partitions hosting a new band key;
    # then a broadcast semi join (the batch's distinct band keys — batch-
    # bounded by construction) cuts the pruned partitions down to exactly
    # the buckets this batch collides with, BEFORE the sizing window and
    # the equi-join ever see them
    hit_bkps = [r["bkp"] for r in nb.select("bkp").distinct().collect()]
    batch_keys = nb.select("band", "band_key").distinct()
    store_bands = (store.filter(F.col("bkp").isin(hit_bkps))
                   .join(F.broadcast(batch_keys),
                         on=["band", "band_key"], how="left_semi"))

    # hot-bucket guard on the STORE side: size every matched bucket with a
    # window over the rows the join reads anyway (append-proof, unlike a
    # build-time size column; a bucket is matched whole, so the size is
    # the full bucket size), keep cold-bucket members as join partners,
    # and collapse each hot bucket to its min-id representative — a new doc
    # landing in a degenerate boilerplate bucket yields ONE candidate pair
    from pyspark.sql import Window
    wb = Window.partitionBy("band", "band_key")
    tagged = (store_bands
              .withColumn("_n", F.count(F.lit(1)).over(wb))
              .withColumn("_rep", F.min(F.col(id_col)).over(wb)))
    cold_old = (tagged.filter(F.col("_n") <= max_bucket_size)
                .select(F.col(id_col).alias("id_old"), "band", "band_key"))
    hot_old = (tagged.filter(F.col("_n") > max_bucket_size)
               .select(F.col("_rep").alias("id_old"), "band", "band_key")
               .distinct())
    old_side = cold_old.unionByName(hot_old)

    new_side = nb.select(F.col(id_col).alias("id_new"), "band", "band_key")
    cross = (new_side.join(old_side, on=["band", "band_key"])
             .filter(F.col("id_new") != F.col("id_old"))
             .select(F.least("id_new", "id_old").alias("id_a"),
                     F.greatest("id_new", "id_old").alias("id_b"))
             .distinct()).persist()
    candidates = cross.unionByName(within).distinct()

    # corpus shingle sets read pruned; dropDuplicates makes an at-least-once
    # appended index (streaming replay re-appends rows) read effectively-once
    old_ids = (cross.select(F.col("id_a").alias("cid"))
               .unionByName(cross.select(F.col("id_b").alias("cid")))
               .distinct())
    hit_sbps = [r["sbp"] for r in
                old_ids.select(F.pmod("cid", F.lit(n_parts)).alias("sbp"))
                .distinct().collect()]
    sh_old = (spark.read.parquet(root + "/shingles")
              .filter(F.col("sbp").isin(hit_sbps))
              .join(old_ids, F.col(id_col) == F.col("cid"), "left_semi")
              .dropDuplicates([id_col])
              .select(id_col, "sh"))
    # batch docs win on id collision (re-ingest of an updated doc)
    sh = sh_new.unionByName(
        sh_old.join(sh_new.select(id_col), on=id_col, how="left_anti"))
    return track_cached_deps(
        verify_jaccard_candidates(candidates, sh, id_col, threshold),
        [nb, cross])
