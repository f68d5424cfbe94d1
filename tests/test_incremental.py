"""Incremental dedup-index tests: batch-equivalence, partition pruning,
append maintenance, and re-ingest semantics."""

import pytest

import pyspark.sql.functions as F

from flink_rag_spark.operators.dedup import jaccard_pairs, lsh_candidate_pairs
from flink_rag_spark.operators.incremental import (
    append_to_dedup_index,
    build_dedup_index,
    incremental_neardup_pairs,
)
from flink_rag_spark.sources.tables import load_table

THRESHOLD = 0.3


def _pairs_set(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_equals_batch_restricted(spark, sf_smoke, tmp_path):
    """The contract: for corpora without hot buckets, incremental pairs ==
    the full-corpus batch pipeline restricted to batch-involving pairs."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "idx")
    build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=16)

    inc = incremental_neardup_pairs(
        spark, batch, "text", "doc_id", path, THRESHOLD, n_parts=16)

    full = jaccard_pairs(
        docs, "text", "doc_id", THRESHOLD,
        candidates=lsh_candidate_pairs(docs, "text", "doc_id"))
    restricted = full.filter(
        (F.col("id_a") % 5 == 0) | (F.col("id_b") % 5 == 0))

    assert _pairs_set(inc) == _pairs_set(restricted)
    assert len(_pairs_set(inc)) > 0  # the fixture corpus has near-dups


def test_store_scan_is_partition_pruned(spark, tmp_path):
    """The band-store scan must carry partition filters on bkp — proof the
    corpus partitions a batch can't collide with are never read."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i}")
         for i in range(100)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs, "text", "doc_id", path, n_parts=16)
    batch = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta doc 7")],
        "doc_id long, text string")
    out = incremental_neardup_pairs(
        spark, batch, "text", "doc_id", path, THRESHOLD, n_parts=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bkp" in plan.replace("#", " #").replace(
        "bkp#", "bkp #") or "bkp" in plan.split("PartitionFilters")[1][:200]


def test_append_makes_earlier_batch_visible(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs0 = spark.createDataFrame(
        [(i, f"completely unrelated corpus text number {i} with filler words")
         for i in range(20)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs0, "text", "doc_id", path, n_parts=8)

    batch1 = spark.createDataFrame(
        [(100, base)], "doc_id long, text string")
    out1 = incremental_neardup_pairs(
        spark, batch1, "text", "doc_id", path, THRESHOLD, n_parts=8)
    assert out1.count() == 0  # nothing similar in the corpus yet

    append_to_dedup_index(spark, batch1, "text", "doc_id", path, n_parts=8)
    batch2 = spark.createDataFrame(
        [(200, base + " extra")], "doc_id long, text string")
    out2 = incremental_neardup_pairs(
        spark, batch2, "text", "doc_id", path, THRESHOLD, n_parts=8)
    pairs = {(r["id_a"], r["id_b"]) for r in out2.collect()}
    assert (100, 200) in pairs  # batch-1 doc visible after append


def test_reingested_doc_uses_new_text(spark, tmp_path):
    """On id collision (re-ingest of an updated doc) the batch's shingles
    win over the stored ones in verification."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs0 = spark.createDataFrame(
        [(1, a), (2, "totally different words about other things entirely")],
        "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs0, "text", "doc_id", path, n_parts=8)

    # re-ingest doc 1 with text now matching doc 2's stored text
    batch = spark.createDataFrame(
        [(1, "totally different words about other things entirely plus")],
        "doc_id long, text string")
    out = incremental_neardup_pairs(
        spark, batch, "text", "doc_id", path, THRESHOLD, n_parts=8)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs
    # and the OLD text of doc 1 must not produce a self-ish match with id 2
    for r in out.collect():
        assert r["jaccard"] >= THRESHOLD
