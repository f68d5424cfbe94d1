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


# ------------------------------------------------------- streaming ingest


def _await(query, timeout=120):
    assert query.awaitTermination(timeout), "stream did not drain in time"


def test_streaming_neardup_suppression(spark, tmp_path):
    """run_ingest(neardup_index=...): near-dups of already-ingested facts
    are suppressed at ingest time; the index makes batch N visible to
    batch N+1 without any full-corpus recompute."""
    from flink_rag_spark.sources.streams import file_string_source
    from flink_rag_spark.streaming.ingest import run_ingest

    idx = str(tmp_path / "dedup_idx")
    store = str(tmp_path / "store")
    fact = ("The quick brown fox jumps over the lazy dog while the "
            "sun sets slowly behind the distant purple mountains")

    src1 = tmp_path / "k1"
    src1.mkdir()
    (src1 / "a.txt").write_text(
        fact + "\nCompletely unrelated statement about train schedules "
               "and morning commutes in large cities\n")
    q = run_ingest(spark, file_string_source(spark, str(src1)), store,
                   str(tmp_path / "c1"), available_now=True,
                   neardup_index=idx)
    _await(q)
    assert spark.read.parquet(store).count() == 2

    # batch 2: one near-dup of the first fact (few words changed), one new
    src2 = tmp_path / "k2"
    src2.mkdir()
    (src2 / "b.txt").write_text(
        fact.replace("lazy dog", "sleepy dog")
        + "\nA genuinely novel fact about deep sea creatures and "
          "bioluminescent displays in total darkness\n")
    q = run_ingest(spark, file_string_source(spark, str(src2)), store,
                   str(tmp_path / "c2"), available_now=True,
                   neardup_index=idx)
    _await(q)
    texts = [r["text"] for r in spark.read.parquet(store).collect()]
    assert len(texts) == 3  # near-dup suppressed, novel fact kept
    assert not any("sleepy dog" in t for t in texts)
    assert any("bioluminescent" in t for t in texts)


def test_streaming_neardup_within_batch(spark, tmp_path):
    """Within one micro-batch the min-id survivor of a near-dup pair is
    kept and its mate dropped (greedy pair-wise semantics)."""
    from flink_rag_spark.sources.streams import file_string_source
    from flink_rag_spark.streaming.ingest import run_ingest

    fact = ("Eleven players take the field for each side at the start "
            "of every regulation association football match worldwide")
    src = tmp_path / "k"
    src.mkdir()
    (src / "a.txt").write_text(
        fact + "\n" + fact.replace("Eleven", "11") + "\n")
    store = str(tmp_path / "store")
    q = run_ingest(spark, file_string_source(spark, str(src)), store,
                   str(tmp_path / "c"), available_now=True,
                   neardup_index=str(tmp_path / "idx"))
    _await(q)
    assert spark.read.parquet(store).count() == 1


# ------------------------------------------------- store-side hot buckets


def test_store_hot_bucket_star_reduces(spark, tmp_path):
    """The adversarial web-scale shape, on the STORE side: a boilerplate
    bucket with many indexed members must contribute only its min-id
    representative to the join — a new doc hitting it emits ONE pair, not
    one per stored member (the round-4 carve-out, now closed)."""
    boiler = ("the exact same boilerplate header text repeated on "
              "every single page of the site")
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(500)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=8)

    batch = spark.createDataFrame(
        [(10_000, boiler)], "doc_id long, text string")
    out = incremental_neardup_pairs(
        spark, batch, "text", "doc_id", path, threshold=0.9,
        n_parts=8, max_bucket_size=50)
    rows = out.collect()
    # star reduction: exactly one pair, to the bucket representative
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(0, 10_000)]
    assert rows[0]["jaccard"] == 1.0


def test_store_cold_buckets_unaffected_by_guard(spark, tmp_path):
    """Below the threshold the guarded store join is identical to the
    unguarded one (the guard is a strategy switch, not a truncation)."""
    docs = spark.createDataFrame(
        [(i, f"shared prefix words for everyone plus unique tail {i % 7}")
         for i in range(30)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs, "text", "doc_id", path, n_parts=8)
    batch = spark.createDataFrame(
        [(999, "shared prefix words for everyone plus unique tail 3")],
        "doc_id long, text string")
    guarded = incremental_neardup_pairs(
        spark, batch, "text", "doc_id", path, THRESHOLD,
        n_parts=8, max_bucket_size=4096)
    huge_cap = incremental_neardup_pairs(
        spark, batch, "text", "doc_id", path, THRESHOLD,
        n_parts=8, max_bucket_size=10**9)
    assert _pairs_set(guarded) == _pairs_set(huge_cap)
    assert len(_pairs_set(guarded)) > 0


def test_sizes_summary_matches_window_fallback(spark, tmp_path):
    """The persisted per-bucket size log and the legacy window-over-scan
    sizing are the same guard: identical pairs with identical hot-bucket
    behavior, across a build plus appends."""
    import shutil

    boiler = "identical boilerplate navigation footer text on every page"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(40)]
        + [(100 + i, f"unique article body number {100 + i} words {i % 5}")
           for i in range(20)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs, "text", "doc_id", path, n_parts=8)
    extra = spark.createDataFrame(
        [(200, boiler), (201, "unique article body number 103 words 3")],
        "doc_id long, text string")
    append_to_dedup_index(spark, extra, "text", "doc_id", path, n_parts=8)

    batch = spark.createDataFrame(
        [(999, boiler), (998, "unique article body number 101 words 1")],
        "doc_id long, text string")

    def probe():
        return _pairs_set(incremental_neardup_pairs(
            spark, batch, "text", "doc_id", path, threshold=0.5,
            n_parts=8, max_bucket_size=10))

    with_sizes = probe()
    shutil.rmtree(f"{path}/sizes")  # legacy-index shape
    with_window = probe()
    assert with_sizes == with_window and with_sizes
    # the hot boilerplate bucket (41 stored members > cap 10) star-reduced:
    # doc 999 pairs only with the bucket representative, doc 0
    assert {(a, b) for (a, b, _) in with_sizes
            if b == 999} == {(0, 999)}


def test_probe_with_sizes_drops_store_window(spark, tmp_path):
    """With the summary table present, the probe plan must not window the
    STORE scan — the sizing shuffle+sort over store rows is exactly what
    the summary removes. (The batch-side guard inside lsh_candidate_pairs
    legitimately keeps ITS window — batch-bounded input — so the assertion
    compares operator counts against the legacy fallback, which pays one
    extra Window.)"""
    import shutil

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i % 4}")
         for i in range(30)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs, "text", "doc_id", path, n_parts=8)
    batch = spark.createDataFrame(
        [(500, "alpha beta gamma delta epsilon doc 2")],
        "doc_id long, text string")

    def n_windows():
        out = incremental_neardup_pairs(
            spark, batch, "text", "doc_id", path, THRESHOLD, n_parts=8)
        return out._jdf.queryExecution().executedPlan() \
            .toString().count("Window [")

    with_sizes = n_windows()
    shutil.rmtree(f"{path}/sizes")
    legacy = n_windows()
    # strict inequality, not an exact count: the plan's toString repeats
    # shared subtrees, so the store window shows up many times in legacy
    assert with_sizes < legacy


def test_append_to_legacy_index_backfills_sizes(spark, tmp_path):
    """Appending to a legacy index (no sizes/) must backfill the FULL
    summary first, not write a delta-only sizes/ table. A partial sizes/
    would make the probe silently drop every pre-append bucket from the
    candidate join (the store's members match neither the cold semi join
    nor the hot representative set) — near-dups against the old corpus
    would be missed."""
    import shutil

    base = "alpha beta gamma delta epsilon zeta eta theta common phrase"
    corpus = spark.createDataFrame(
        [(1, base)] + [(10 + i, f"unrelated filler text number {i} entirely")
                       for i in range(10)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, corpus, "text", "doc_id", path, n_parts=8)
    shutil.rmtree(f"{path}/sizes")  # legacy-index shape

    # append a batch UNRELATED to doc 1 — its deltas touch none of doc 1's
    # buckets, so a delta-only sizes/ would orphan them
    extra = spark.createDataFrame(
        [(50, "some new appended document about other topics")],
        "doc_id long, text string")
    append_to_dedup_index(spark, extra, "text", "doc_id", path, n_parts=8)

    probe = spark.createDataFrame(
        [(999, base + " tail")], "doc_id long, text string")
    pairs = {(a, b) for (a, b, _) in _pairs_set(incremental_neardup_pairs(
        spark, probe, "text", "doc_id", path, THRESHOLD, n_parts=8))}
    assert (1, 999) in pairs  # pre-append corpus doc still found

    # and the backfilled summary must equal a from-scratch rebuild's totals
    sizes = (spark.read.parquet(f"{path}/sizes")
             .groupBy("band", "band_key")
             .agg(F.sum("n").alias("n"), F.min("rep").alias("rep")))
    bands = spark.read.parquet(f"{path}/bands")
    expect = (bands.groupBy("band", "band_key")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.min("doc_id").alias("rep")))
    assert {tuple(r) for r in sizes.collect()} == \
           {tuple(r) for r in expect.collect()}


def test_compact_rebuilds_sizes_for_legacy_index(spark, tmp_path):
    """Compaction doubles as the migration path: a legacy index without
    sizes/ gets one rebuilt from bands, and probes agree before/after."""
    import os
    import shutil

    from flink_rag_spark.operators.incremental import compact_dedup_index

    docs = spark.createDataFrame(
        [(i, f"legacy corpus doc {i} alpha beta gamma {i % 3}")
         for i in range(25)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs, "text", "doc_id", path, n_parts=8)
    shutil.rmtree(f"{path}/sizes")
    probe = spark.createDataFrame(
        [(999, "legacy corpus doc 7 alpha beta gamma 1")],
        "doc_id long, text string")
    before = _pairs_set(incremental_neardup_pairs(
        spark, probe, "text", "doc_id", path, THRESHOLD, n_parts=8))
    counts = compact_dedup_index(spark, path)
    assert os.path.exists(f"{path}/sizes") and counts["sizes"] > 0
    after = _pairs_set(incremental_neardup_pairs(
        spark, probe, "text", "doc_id", path, THRESHOLD, n_parts=8))
    assert before == after and len(after) > 0


def test_incremental_cached_deps_release(spark, tmp_path):
    """Looping callers must be able to return the session to its baseline
    cached-RDD count via unpersist_cached_deps — no net growth across N
    repeated probes (round-4 verdict hygiene item)."""
    from flink_rag_spark.operators.util import unpersist_cached_deps

    docs = spark.createDataFrame(
        [(i, f"corpus document number {i} with some shared words")
         for i in range(40)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs, "text", "doc_id", path, n_parts=8)
    batch = spark.createDataFrame(
        [(900, "corpus document number 900 with some shared words")],
        "doc_id long, text string")

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    baseline = n_cached()
    for _ in range(3):
        out = incremental_neardup_pairs(
            spark, batch, "text", "doc_id", path, THRESHOLD, n_parts=8)
        out.collect()
        unpersist_cached_deps(out)
    assert n_cached() == baseline


def test_compact_dedup_index_restores_one_file_and_results(spark, tmp_path):
    """N appends grow the index's file counts; compaction restores one
    file per partition and probe results are bit-identical."""
    import glob

    from flink_rag_spark.operators.incremental import compact_dedup_index

    docs = spark.createDataFrame(
        [(i, f"base corpus doc {i} alpha beta gamma delta {i % 3}")
         for i in range(30)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_dedup_index(spark, docs, "text", "doc_id", path, n_parts=8)
    for b in range(3):
        batch = spark.createDataFrame(
            [(100 + 10 * b + j,
              f"base corpus doc {100 + 10 * b + j} alpha beta gamma "
              f"delta {j % 3}") for j in range(5)],
            "doc_id long, text string")
        append_to_dedup_index(spark, batch, "text", "doc_id", path,
                              n_parts=8)

    probe = spark.createDataFrame(
        [(999, "base corpus doc 101 alpha beta gamma delta 1")],
        "doc_id long, text string")
    before = _pairs_set(incremental_neardup_pairs(
        spark, probe, "text", "doc_id", path, THRESHOLD, n_parts=8))

    def files(sub):
        return glob.glob(f"{path}/{sub}/*/*.parquet")

    n_bands_before = len(files("bands"))
    counts = compact_dedup_index(spark, path)
    assert len(files("bands")) == counts["bands"] < n_bands_before
    # one file per live partition directory
    for sub, pcol in (("bands", "bkp"), ("shingles", "sbp")):
        parts = glob.glob(f"{path}/{sub}/{pcol}=*")
        assert counts[sub] == len(parts)
        for p in parts:
            assert len(glob.glob(f"{p}/*.parquet")) == 1

    after = _pairs_set(incremental_neardup_pairs(
        spark, probe, "text", "doc_id", path, THRESHOLD, n_parts=8))
    assert before == after and len(after) > 0


def test_streaming_compaction_cadence(spark, tmp_path):
    """run_ingest(neardup_compact_every=1): after the drain the index sits
    at one file per live partition and keeps filtering correctly."""
    import glob

    from flink_rag_spark.sources.streams import file_string_source
    from flink_rag_spark.streaming.ingest import run_ingest

    idx = str(tmp_path / "idx")
    src = tmp_path / "s"
    src.mkdir()
    (src / "a.txt").write_text(
        "a wholly distinctive sentence about glaciers and morning light\n"
        "another wholly distinctive sentence about deserts at dusk\n")
    q = run_ingest(spark, file_string_source(spark, str(src)),
                   str(tmp_path / "store"), str(tmp_path / "c"),
                   available_now=True, neardup_index=idx,
                   neardup_compact_every=1)
    assert q.awaitTermination(120)
    for sub, pcol in (("bands", "bkp"), ("shingles", "sbp")):
        parts = glob.glob(f"{idx}/{sub}/{pcol}=*")
        assert parts
        for p in parts:
            assert len(glob.glob(f"{p}/*.parquet")) == 1
