"""Round-8 operator contracts: retrieval evaluation metrics.

`test_oracle_parity.py` already value-hashes every catalog entry against
DuckDB; these tests pin the METRIC DEFINITIONS themselves on hand-built
inputs where recall/MRR/nDCG are computable by hand, so an
implementation-and-oracle that drifted together would still fail.
"""

import math

import pyspark.sql.functions as F

from flink_rag_spark.operators.evaluation import eval_ranking


def _metrics_by_query(df):
    return {r["query_id"]: r.asDict() for r in df.collect()}


def test_eval_ranking_hand_computed(spark):
    # q1: 3 relevant, run hits 2 of them at ranks 1 and 3
    # q2: 2 relevant, run hits none in top-k
    # q3: 1 relevant, hit at rank 4
    run = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3),
         ("q2", "x", 1), ("q2", "y", 2),
         ("q3", "x", 1), ("q3", "y", 2), ("q3", "z", 3), ("q3", "c", 4)],
        "query_id string, doc_id string, rank int")
    qrels = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"),
         ("q2", "a"), ("q2", "b"),
         ("q3", "c")],
        "query_id string, doc_id string")
    out = _metrics_by_query(eval_ranking(run, qrels, k=10))
    assert set(out) == {"q1", "q2", "q3"}

    q1 = out["q1"]
    assert q1["n_rel"] == 3 and q1["n_hits"] == 2
    assert q1["recall_at_k"] == round(2 / 3, 6)
    assert q1["mrr_at_k"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert q1["ndcg_at_k"] == round(dcg / idcg, 6)

    q2 = out["q2"]
    assert (q2["n_hits"], q2["recall_at_k"], q2["mrr_at_k"],
            q2["ndcg_at_k"]) == (0, 0.0, 0.0, 0.0)

    q3 = out["q3"]
    assert q3["mrr_at_k"] == 0.25
    assert q3["recall_at_k"] == 1.0
    # single relevant doc: IDCG = 1/log2(2) = 1, DCG = 1/log2(5)
    assert q3["ndcg_at_k"] == round(1 / math.log2(5), 6)


def test_eval_ranking_cutoff_and_query_loss(spark):
    # a hit at rank 11 does not count at k=10; a query whose run is
    # entirely missing still appears with zero metrics (keyed by qrels)
    run = spark.createDataFrame(
        [("q1", "a", 11)], "query_id string, doc_id string, rank int")
    qrels = spark.createDataFrame(
        [("q1", "a"), ("q2", "b")], "query_id string, doc_id string")
    out = _metrics_by_query(eval_ranking(run, qrels, k=10))
    assert set(out) == {"q1", "q2"}
    assert out["q1"]["n_hits"] == 0 and out["q1"]["ndcg_at_k"] == 0.0
    assert out["q2"]["n_hits"] == 0 and out["q2"]["mrr_at_k"] == 0.0


def test_eval_ranking_perfect_run_is_all_ones(spark):
    # identical run and qrels at any k -> recall = mrr = ndcg = 1
    rows = [("q", f"d{i}", i) for i in range(1, 6)]
    run = spark.createDataFrame(
        rows, "query_id string, doc_id string, rank int")
    qrels = run.select("query_id", "doc_id")
    out = _metrics_by_query(eval_ranking(run, qrels, k=5))["q"]
    assert (out["recall_at_k"], out["mrr_at_k"], out["ndcg_at_k"]) == \
        (1.0, 1.0, 1.0)


def test_retrieval_eval_metrics_shape(spark, sf_oracle):
    from flink_rag_spark.plans.llm import (
        EVAL_QUERY_MOD,
        retrieval_eval_metrics,
    )
    out = retrieval_eval_metrics(spark, sf_oracle).collect()
    # one row per query vector, metrics in [0, 1]
    n_q = len([r for r in out])
    assert n_q > 0 and all(r["n_rel"] == 10 for r in out)
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in out)
    assert all(0.0 <= r["ndcg_at_k"] <= 1.0 for r in out)
    assert all(r["query_id"] % EVAL_QUERY_MOD == 0 for r in out)
    # the 16-dim projection preserves SOME signal: macro recall well
    # above chance (10 random picks of 500 would give ~0.02; measured
    # 0.135 at sf0.01)
    macro = sum(r["recall_at_k"] for r in out) / n_q
    assert macro > 0.05


def test_snapshot_diff_statuses_and_null_safety(spark):
    from flink_rag_spark.operators.diffing import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id bigint, s string, v int")
    new = spark.createDataFrame(
        [(1, "a", 10),          # unchanged -> dropped
         (2, "B", 20),          # s changed
         (3, "c", 30),          # v NULL -> 30: changed (null-safe)
         (5, "e", 50)],         # added; 4 removed
        "id bigint, s string, v int")
    out = {r["id"]: (r["status"], r["changed_csv"])
           for r in snapshot_diff(old, new, ["id"], ["s", "v"]).collect()}
    assert out == {2: ("changed", "s"), 3: ("changed", "v"),
                   4: ("removed", ""), 5: ("added", "")}


def test_snapshot_diff_multi_column_change_order(spark):
    from flink_rag_spark.operators.diffing import snapshot_diff
    old = spark.createDataFrame([(1, "a", 1)], "id bigint, s string, v int")
    new = spark.createDataFrame([(1, "b", 2)], "id bigint, s string, v int")
    [r] = snapshot_diff(old, new, ["id"], ["s", "v"]).collect()
    # changed columns listed in compare_cols order
    assert (r["status"], r["changed_csv"]) == ("changed", "s,v")
    # identical snapshots diff to empty
    assert snapshot_diff(old, old, ["id"], ["s", "v"]).count() == 0


def _manifest_rows(df):
    return {r["bucket"]: (r["n_rows"], r["content_xor"], r["min_key"],
                          r["max_key"], r["total_len"])
            for r in df.collect()}


def test_dataset_manifest_layout_independent(spark, sf_smoke):
    from flink_rag_spark.operators.integrity import dataset_manifest
    from flink_rag_spark.sources.tables import load_table
    d = load_table(spark, sf_smoke, "documents")
    base = _manifest_rows(dataset_manifest(d, "doc_id", "text", buckets=8))
    # a re-partitioned, re-sorted copy manifests identically
    shuffled = d.repartition(13).sortWithinPartitions("n_chars")
    again = _manifest_rows(
        dataset_manifest(shuffled, "doc_id", "text", buckets=8))
    assert base == again


def test_dataset_manifest_localizes_divergence(spark, sf_smoke):
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.integrity import dataset_manifest
    from flink_rag_spark.sources.tables import load_table
    d = load_table(spark, sf_smoke, "documents")
    corrupt = d.withColumn(
        "text", F.when(F.col("doc_id") == 3,
                       F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")))
    a = _manifest_rows(dataset_manifest(d, "doc_id", "text", buckets=8))
    b = _manifest_rows(dataset_manifest(corrupt, "doc_id", "text",
                                        buckets=8))
    diff = [k for k in a if a[k] != b[k]]
    assert len(diff) == 1  # exactly one bucket flags the corrupt row


def test_normalize_text_core(spark):
    from flink_rag_spark.operators.normalization import normalize_text
    df = spark.createDataFrame(
        [("  Foo\t\tBAR  baz\x01qux  ",), ("already clean",), (None,)],
        "t string")
    out = [r["n"] for r in
           df.select(normalize_text("t").alias("n")).collect()]
    assert out == ["foo bar baz qux", "already clean", None]


def test_normalize_text_matches_duck(spark):
    import duckdb

    from flink_rag_spark.operators.normalization import (
        normalize_text,
        normalize_text_duck,
    )
    samples = ["  A\tB ", "x\x07y", "MiXeD   CaSe", "", "\x1f\x00lead"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r["n"] for r in
           df.select(normalize_text("t").alias("n")).collect()]
    con = duckdb.connect()
    want = [con.execute(
        f"SELECT {normalize_text_duck('?')}", [s]).fetchone()[0]
        for s in samples]
    assert got == want


def test_nfc_normalize_matches_duck(spark):
    import duckdb

    from flink_rag_spark.operators.normalization import nfc_normalize_col
    # e + combining acute vs precomposed e-acute; A + ring; ASCII noop
    samples = ["éclair", "café", "Å", "plain"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    nfc = nfc_normalize_col()
    got = [r["n"] for r in df.select(nfc("t").alias("n")).collect()]
    con = duckdb.connect()
    want = [con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
            for s in samples]
    assert got == want
    assert got[0] == "éclair"  # actually composed


def test_key_skew_profile_uniform_and_skewed(spark):
    from flink_rag_spark.operators.profiling import key_skew_profile
    # uniform: 4 keys x 3 rows -> gini 0, every skew_ratio 1
    uni = spark.createDataFrame(
        [(k,) for k in [1, 2, 3, 4] for _ in range(3)], "k bigint")
    rows = key_skew_profile(uni, "k", top_n=10).collect()
    assert all(r["gini"] == 0.0 and r["skew_ratio"] == 1.0 for r in rows)
    assert rows[0]["n_keys"] == 4 and rows[0]["avg_cnt"] == 3.0

    # skewed: key 1 has 9 rows, keys 2..4 have 1 -> top key flagged
    sk = spark.createDataFrame(
        [(1,)] * 9 + [(2,), (3,), (4,)], "k bigint")
    top = key_skew_profile(sk, "k", top_n=2).collect()
    assert top[0]["key"] == 1 and top[0]["rank"] == 1
    assert top[0]["cnt"] == 9 and top[0]["share"] == 0.75
    assert top[0]["skew_ratio"] == 3.0  # 9 / (12/4)
    # hand-computed gini: counts asc [1,1,1,9], i*c = 1+2+3+36 = 42
    # 2*42/(4*12) - 5/4 = 1.75 - 1.25 = 0.5
    assert top[0]["gini"] == 0.5
    assert len(top) == 2  # top_n respected


def test_winsorized_stats_hand_computed(spark):
    from flink_rag_spark.operators.profiling import winsorized_stats
    # one group, values 1..9 plus outlier 1000; p10/p90 clip
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, v double")
    [r] = winsorized_stats(df, "v", "grp", p_lo=0.1, p_hi=0.9).collect()
    # interpolated percentiles over 10 pts: p10 = 1 + 0.9*(2-1) = 1.9,
    # p90 = 9 + 0.1*(1000-9) = 108.1
    assert r["p_lo_value"] == 1.9
    assert r["p_hi_value"] == 108.1
    assert r["n_rows"] == 10
    # both tails clip: 1.0 < 1.9 and 1000 > 108.1
    assert r["n_clipped"] == 2
    assert r["mean_wins"] < r["mean_raw"]
    assert r["std_wins"] <= r["std_raw"]


def test_winsorized_stats_clip_both_tails(spark):
    from flink_rag_spark.operators.profiling import winsorized_stats
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(0, 101)], "grp string, v double")
    [r] = winsorized_stats(df, "v", "grp", p_lo=0.05, p_hi=0.95).collect()
    assert r["p_lo_value"] == 5.0 and r["p_hi_value"] == 95.0
    assert r["n_clipped"] == 10  # 0..4 and 96..100
    assert r["mean_raw"] == 50.0 and r["mean_wins"] == 50.0  # symmetric


def test_curriculum_order_band_direction_and_determinism(spark):
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.curation import curriculum_order
    # scores 1..40: band 1 must hold the HIGHEST scores
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 41)], "id bigint, s double")
    out = curriculum_order(df, "s", "id", n_bands=4, seed=7, buckets=4)
    rows = out.collect()
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], []).append(r["s"])
    assert set(by_band) == {1, 2, 3, 4}
    assert min(by_band[1]) > max(by_band[2]) > 0
    assert min(by_band[3]) > max(by_band[4])
    # equal-frequency bands
    assert all(len(v) == 10 for v in by_band.values())
    # deterministic: identical on a re-run and layout-independent
    again = curriculum_order(df.repartition(7), "s", "id",
                             n_bands=4, seed=7, buckets=4).collect()
    key = lambda r: (r["id"], r["band"], r["shuffle_bucket"],
                     r["shuffle_pos"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))
    # within a band the shuffle order decorrelates from score order:
    # the top band's first few positions aren't simply descending scores
    b1 = sorted((r["shuffle_bucket"], r["shuffle_pos"], r["s"])
                for r in rows if r["band"] == 1)
    assert [t[2] for t in b1] != sorted((t[2] for t in b1), reverse=True)


def test_decontamination_report_hand_built(spark):
    from flink_rag_spark.operators.curation import decontamination_report
    # 6-token docs, 3-gram rule. train doc 1 copies benchA's passage;
    # train doc 2 is clean; benchB shares nothing with train.
    bench = spark.createDataFrame(
        [("A", 100, "w1 w2 w3 w4 w5 w6"),
         ("B", 200, "x1 x2 x3 x4 x5 x6")],
        "bench_id string, doc_id bigint, text string")
    train = spark.createDataFrame(
        [(1, "zz w2 w3 w4 yy qq"),   # shares gram (w2 w3 w4) with A
         (2, "a b c d e f")],
        "doc_id bigint, text string")
    out = {r["bench_id"]: r.asDict()
           for r in decontamination_report(train, bench, "text",
                                           "doc_id", n=3).collect()}
    a, b = out["A"], out["B"]
    assert a["n_bench_docs"] == 1 and a["n_bench_grams"] == 4
    assert a["n_contaminated"] == 1 and a["n_hit_grams"] == 1
    assert a["n_train"] == 2 and a["contamination_rate"] == 0.5
    assert b["n_contaminated"] == 0 and b["n_hit_grams"] == 0
    assert b["contamination_rate"] == 0.0


def test_decontamination_report_consistent_with_filter(spark, sf_oracle):
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.curation import (
        decontamination_report,
        ngram_decontaminate,
    )
    from flink_rag_spark.sources.tables import load_table
    d = load_table(spark, sf_oracle, "documents")
    bench = (d.filter(F.col("doc_id") % 10 == 0)
             .select(F.lit("A").alias("bench_id"), "doc_id", "text"))
    train = d.filter(F.col("doc_id") % 10 != 0)
    [rep] = decontamination_report(train, bench, "text",
                                   "doc_id").collect()
    kept = ngram_decontaminate(train, bench.drop("bench_id"), "text",
                               "doc_id").count()
    # report's contaminated count == docs the filter removes
    assert rep["n_train"] - rep["n_contaminated"] == kept


def test_ngram_novelty_hand_built(spark):
    from flink_rag_spark.operators.quality import ngram_novelty
    # 3-grams over 5-token docs: doc 1 and 2 share one passage
    # (w2 w3 w4); doc 3 is fully novel.
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"),
         (2, "x1 w2 w3 w4 x5"),
         (3, "a b c d e")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict()
           for r in ngram_novelty(docs, "text", "doc_id", n=3).collect()}
    # each doc has 3 distinct 3-grams; docs 1/2 share exactly one
    assert out[1]["n_grams"] == 3 and out[1]["n_dup_grams"] == 1
    assert out[1]["max_gram_df"] == 2
    assert out[1]["dup_fraction"] == round(1 / 3, 6)
    assert out[2]["n_dup_grams"] == 1
    assert out[3]["n_dup_grams"] == 0 and out[3]["max_gram_df"] == 1
    assert out[3]["dup_fraction"] == 0.0


def test_ngram_novelty_duplicate_doc_saturates(spark):
    from flink_rag_spark.operators.quality import ngram_novelty
    docs = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "p q r s t u")],
        "doc_id bigint, text string")
    out = ngram_novelty(docs, "text", "doc_id", n=3).collect()
    # verbatim copies: every gram duplicated in both docs
    assert all(r["dup_fraction"] == 1.0 and r["max_gram_df"] == 2
               for r in out)


def test_kmeans_minibatch_equals_lloyd_iteration_when_cold(spark):
    from flink_rag_spark.operators.clustering import (
        kmeans_minibatch,
        kmeans_refine,
    )
    data = [(i, [float(i % 5), float((i * 3) % 7), float(i % 2)])
            for i in range(60)]
    df = spark.createDataFrame(data, "vec_id bigint, embedding array<float>")
    seeds = [[0.0, 0.0, 0.0], [4.0, 6.0, 1.0]]
    # cold (counts=0) mini-batch over the FULL table == one Lloyd's step
    mb, counts = kmeans_minibatch(df, seeds)
    ll = kmeans_refine(df, seeds, iters=1)
    assert sum(counts) == 60
    for a, b in zip(mb, ll):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))


def test_kmeans_minibatch_running_mean_weighting(spark):
    from flink_rag_spark.operators.clustering import kmeans_minibatch
    # all points land in cell 0; two sequential batches must yield the
    # running mean of everything absorbed, whatever the split
    b1 = spark.createDataFrame([(1, [1.0, 1.0]), (2, [3.0, 3.0])],
                               "vec_id bigint, embedding array<float>")
    b2 = spark.createDataFrame([(3, [11.0, 11.0])],
                               "vec_id bigint, embedding array<float>")
    seeds = [[0.0, 0.0], [100.0, 100.0]]
    c1, n1 = kmeans_minibatch(b1, seeds)
    assert n1 == [2, 0] and c1[0] == [2.0, 2.0]
    assert c1[1] == seeds[1]  # empty cell untouched
    c2, n2 = kmeans_minibatch(b2, c1, n1)
    # (2*2 + 11) / 3 = 5.0 — the mean of all three points
    assert n2 == [3, 0] and c2[0] == [5.0, 5.0]


def _tiny_emb(spark):
    data = [(i, [float(i % 4), float((i * 7) % 5), float(i % 3)])
            for i in range(40)]
    return spark.createDataFrame(data,
                                 "vec_id bigint, embedding array<float>")


def test_maintain_codebook_absorbs_and_guards(spark, tmp_path):
    import json
    import os

    from flink_rag_spark.operators.clustering import kmeans_minibatch
    from flink_rag_spark.operators.index import (
        build_ivf_index,
        codebook_drift,
        maintain_codebook,
    )
    emb = _tiny_emb(spark)
    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(spark, emb, idx, n_centroids=2)

    b0 = emb.filter("vec_id < 20")
    b1 = emb.filter("vec_id >= 20")
    d0 = maintain_codebook(spark, b0, idx, batch_id=0, stream_id="s")
    assert d0 is not None and d0 >= 0.0
    assert codebook_drift(idx) == d0
    st = json.load(open(os.path.join(idx, "next_codebook.json")))
    assert sum(st["counts"]) == 20

    # replayed batch: no-op, state unchanged
    assert maintain_codebook(spark, b0, idx, batch_id=0,
                             stream_id="s") == d0
    st2 = json.load(open(os.path.join(idx, "next_codebook.json")))
    assert st2 == st

    # next batch accumulates; staged centroids equal the direct
    # sequential mini-batch composition
    maintain_codebook(spark, b1, idx, batch_id=1, stream_id="s")
    st3 = json.load(open(os.path.join(idx, "next_codebook.json")))
    assert sum(st3["counts"]) == 40
    c_direct, n_direct = kmeans_minibatch(b0, cents)
    c_direct, n_direct = kmeans_minibatch(b1, c_direct, n_direct)
    assert n_direct == st3["counts"]
    for a, b in zip(c_direct, st3["centroids"]):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))
    # the LIVE codebook was never touched
    assert json.load(open(os.path.join(idx, "centroids.json"))) == cents


def test_promote_next_codebook_warm_rebuild(spark, tmp_path):
    import json
    import os

    from flink_rag_spark.operators.index import (
        build_ivf_index,
        load_ivf_index,
        maintain_codebook,
        promote_next_codebook,
    )
    from flink_rag_spark.operators.similarity import with_ivf_cells
    emb = _tiny_emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx, n_centroids=2)
    maintain_codebook(spark, emb, idx, batch_id=0, stream_id="s")
    staged = json.load(
        open(os.path.join(idx, "next_codebook.json")))["centroids"]

    promoted = promote_next_codebook(spark, emb, idx)
    assert promoted == staged
    assert not os.path.exists(os.path.join(idx, "next_codebook.json"))
    cents, cells = load_ivf_index(spark, idx)
    assert cents == staged
    # cells were reassigned under the NEW geometry, nothing lost
    want = {(r["vec_id"], r["cell"])
            for r in with_ivf_cells(emb, staged).collect()}
    got = {(r["vec_id"], r["cell"])
           for r in cells.select("vec_id", "cell").collect()}
    assert got == want and len(got) == 40


def test_build_ivf_index_drops_stale_staged_codebook(spark, tmp_path):
    import os

    from flink_rag_spark.operators.index import (
        build_ivf_index,
        codebook_drift,
        maintain_codebook,
    )
    emb = _tiny_emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx, n_centroids=2)
    maintain_codebook(spark, emb, idx, batch_id=0, stream_id="s")
    assert os.path.exists(os.path.join(idx, "next_codebook.json"))
    # a full retrain (possibly different k) invalidates the staging
    build_ivf_index(spark, emb, idx, n_centroids=3)
    assert not os.path.exists(os.path.join(idx, "next_codebook.json"))
    assert codebook_drift(idx) is None
    # and a fresh absorb reseeds cleanly against the NEW k
    d = maintain_codebook(spark, emb, idx, batch_id=0, stream_id="s2")
    assert d is not None


def test_promote_crash_recovery_from_intent(spark, tmp_path):
    import json
    import os
    import shutil

    from flink_rag_spark.operators.index import (
        build_ivf_index,
        load_ivf_index,
        maintain_codebook,
        promote_next_codebook,
    )
    emb = _tiny_emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx, n_centroids=2)
    maintain_codebook(spark, emb, idx, batch_id=0, stream_id="s")
    staged = json.load(
        open(os.path.join(idx, "next_codebook.json")))["centroids"]
    # run a full promote to materialize the rebuilt cells, then rewind
    # to the exact crash window: intent written, swap not yet done
    promote_next_codebook(spark, emb, idx)
    cells = os.path.join(idx, "cells")
    shutil.copytree(cells, os.path.join(idx, "cells.rebuilding"))
    with open(os.path.join(idx, "promote.intent.json"), "w") as f:
        json.dump({"centroids": staged}, f)
    with open(os.path.join(idx, "centroids.json"), "w") as f:
        json.dump([[9e9] * len(staged[0])] * len(staged), f)  # "old" junk
    # any reader finishes the promote: centroids match the intent again
    cents, cells_df = load_ivf_index(spark, idx)
    assert cents == staged
    assert not os.path.exists(os.path.join(idx, "promote.intent.json"))
    assert not os.path.exists(os.path.join(idx, "cells.rebuilding"))
    assert cells_df.count() == 40


def test_kmeans_minibatch_null_element_uses_row_counts(spark):
    from flink_rag_spark.operators.clustering import kmeans_minibatch
    # one vector carries a NULL element: the running-mean denominator
    # must still be the ROW count (2), with the null dim summed as-is
    df = spark.createDataFrame(
        [(1, [2.0, 4.0]), (2, [None, 8.0])],
        "vec_id bigint, embedding array<double>")
    seeds = [[0.0, 0.0], [100.0, 100.0]]
    cents, counts = kmeans_minibatch(df, seeds)
    assert counts == [2, 0]
    # dim 0: sum=2.0 over 2 rows -> 1.0 ; dim 1: (4+8)/2 = 6.0
    assert cents[0] == [1.0, 6.0]


def test_run_ingest_rejects_codebook_without_index(spark, tmp_path):
    import pytest as _pytest

    from flink_rag_spark.sources.streams import file_string_source
    from flink_rag_spark.streaming.ingest import run_ingest
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("hello\n")
    with _pytest.raises(ValueError, match="ivf_codebook"):
        run_ingest(spark, file_string_source(spark, str(src)),
                   str(tmp_path / "store"), str(tmp_path / "c"),
                   available_now=True, ivf_codebook=True)


def test_released_corpus_manifest_consistency(spark, sf_oracle):
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.curation import split_assignments
    from flink_rag_spark.operators.normalization import normalize_text
    from flink_rag_spark.operators.quality import ngram_novelty
    from flink_rag_spark.plans.llm import (
        NOVELTY_NGRAM,
        RELEASE_DUP_MAX,
        released_corpus_manifest,
    )
    from flink_rag_spark.sources.tables import load_table
    man = released_corpus_manifest(spark, sf_oracle).collect()
    total = sum(r["n_rows"] for r in man)
    # recompute the released row count stage by stage
    d = load_table(spark, sf_oracle, "documents")
    norm = d.select("doc_id", normalize_text("text").alias("text"))
    nov = ngram_novelty(norm, "text", "doc_id", n=NOVELTY_NGRAM)
    kept = norm.join(
        nov.filter(F.col("dup_fraction") <= RELEASE_DUP_MAX)
        .select("doc_id"), on="doc_id")
    n_train = (split_assignments(kept, "text",
                                 {"train": 0.8, "val": 0.1, "test": 0.1})
               .filter(F.col("split") == "train").count())
    assert total == n_train and 0 < total < 500
    # the filter actually dropped boilerplate (9.4% > 0.5 at sf0.01)
    assert kept.count() < 500


def test_cluster_diversified_topk_spans_cells(spark):
    from flink_rag_spark.operators.diversity import cluster_diversified_topk
    # two tight clusters on orthogonal axes; relevance favors cluster A
    cands = []
    for q in [100]:
        for i, (x, y, s) in enumerate(
                [(1.0, 0.01, 0.99), (1.0, 0.02, 0.98), (1.0, 0.03, 0.97),
                 (0.01, 1.0, 0.50), (0.02, 1.0, 0.49)]):
            cands.append((q, i, [x, y], s))
    df = spark.createDataFrame(
        cands, "query_id bigint, vec_id bigint, embedding array<double>, "
               "score double")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = cluster_diversified_topk(df, cents, k=3).orderBy("rank").collect()
    # rank 1 and 2 must come from DIFFERENT cells (best of each cell
    # precedes any second-best), rank 3 returns to the better cell
    assert out[0]["cell"] != out[1]["cell"]
    assert {out[0]["vec_id"], out[1]["vec_id"]} == {0, 3}
    assert out[2]["vec_id"] == 1
    # plain top-3 by score would have been {0,1,2} — single cluster
    assert {r["cell"] for r in out} == {0, 1}


def _mmr_python_model(vecs, scores, ids, k, lam):
    import numpy as np
    unit = np.asarray(vecs, dtype=float)
    unit = unit / np.linalg.norm(unit, axis=1)[:, None]
    order = np.lexsort((ids, -np.asarray(scores, dtype=float)))
    unit = unit[order]
    scores = np.asarray(scores, dtype=float)[order]
    ids = [ids[i] for i in order]
    sel, out = [], []
    max_sim = [None] * len(ids)
    for _ in range(min(k, len(ids))):
        best, best_obj = None, None
        for i in range(len(ids)):
            if i in sel:
                continue
            pen = max_sim[i] or 0.0
            obj = lam * scores[i] - (1 - lam) * pen
            if best_obj is None or obj > best_obj:
                best, best_obj = i, obj
        sel.append(best)
        out.append((ids[best], round(best_obj, 6)))
        for i in range(len(ids)):
            s = float(unit[i] @ unit[best])
            max_sim[i] = s if max_sim[i] is None else max(max_sim[i], s)
    return out


def test_mmr_rerank_matches_python_model(spark):
    import random

    from flink_rag_spark.operators.diversity import mmr_rerank
    rng = random.Random(42)
    rows, expect = [], {}
    for q in [1, 2]:
        vecs = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(12)]
        scores = [round(rng.uniform(0, 1), 6) for _ in range(12)]
        ids = list(range(12))
        rows += [(q, i, vecs[i], scores[i]) for i in ids]
        expect[q] = _mmr_python_model(vecs, scores, ids, k=5, lam=0.5)
    df = spark.createDataFrame(
        rows, "query_id bigint, vec_id bigint, embedding array<double>, "
              "score double")
    out = mmr_rerank(df, k=5, lam=0.5).orderBy("query_id", "rank").collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["mmr_score"]))
    assert got == expect


def test_mmr_rerank_diversifies_duplicates(spark):
    from flink_rag_spark.operators.diversity import mmr_rerank
    # three identical top vectors + one orthogonal lower-scored one:
    # MMR must pick the orthogonal doc second
    rows = [(1, 0, [1.0, 0.0], 0.9), (1, 1, [1.0, 0.0], 0.89),
            (1, 2, [1.0, 0.0], 0.88), (1, 3, [0.0, 1.0], 0.3)]
    df = spark.createDataFrame(
        rows, "query_id bigint, vec_id bigint, embedding array<double>, "
              "score double")
    out = [r["vec_id"] for r in
           mmr_rerank(df, k=2, lam=0.5).orderBy("rank").collect()]
    assert out == [0, 3]


def test_merge_manifests_add_and_remove_identities(spark, sf_smoke):
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.integrity import (
        dataset_manifest,
        merge_manifests,
    )
    from flink_rag_spark.sources.tables import load_table
    d = load_table(spark, sf_smoke, "documents")
    m = lambda df: dataset_manifest(df, "doc_id", "text", buckets=8)  # noqa: E731
    exact = ["bucket", "n_rows", "content_xor", "total_len"]

    # add identity: merge of two disjoint halves == full rebuild,
    # INCLUDING key bounds (min-of-mins is exact under adds)
    merged = merge_manifests(m(d.filter(F.col("doc_id") % 2 == 0)),
                             m(d.filter(F.col("doc_id") % 2 == 1)))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, m(d).collect()))

    # remove identity on the exact columns
    removed = d.filter(F.col("doc_id") % 3 == 0)
    after = merge_manifests(m(d), m(removed), remove=True)
    want = m(d.filter(F.col("doc_id") % 3 != 0))
    assert sorted(map(tuple, after.select(*exact).collect())) == \
        sorted(map(tuple, want.select(*exact).collect()))

    # removing EVERYTHING in a bucket drops the bucket row
    all_gone = merge_manifests(m(d), m(d), remove=True)
    assert all_gone.count() == 0

    # a double-fold (replay without the caller's batch-id guard) leaves
    # NEGATIVE counts visible instead of silently vanishing
    twice = merge_manifests(all_gone, m(d), remove=True)
    assert twice.count() > 0
    assert all(r["n_rows"] < 0 for r in twice.collect())


def test_retrain_supersedes_crashed_promote(spark, tmp_path):
    import json
    import os
    import shutil

    from flink_rag_spark.operators.index import (
        build_ivf_index,
        load_ivf_index,
        maintain_codebook,
        promote_next_codebook,
    )
    emb = _tiny_emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx, n_centroids=2)
    maintain_codebook(spark, emb, idx, batch_id=0, stream_id="s")
    staged = json.load(
        open(os.path.join(idx, "next_codebook.json")))["centroids"]
    promote_next_codebook(spark, emb, idx)
    # recreate the crash window: intent + rebuilt cells on disk
    shutil.copytree(os.path.join(idx, "cells"),
                    os.path.join(idx, "cells.rebuilding"))
    with open(os.path.join(idx, "promote.intent.json"), "w") as f:
        json.dump({"centroids": staged}, f)
    # a FULL retrain with different k supersedes the crashed promote:
    # nothing stale may resurrect afterwards
    cents3 = build_ivf_index(spark, emb, idx, n_centroids=3)
    assert len(cents3) == 3
    got, cells = load_ivf_index(spark, idx)
    assert got == cents3 and len(got) == 3
    assert cells.count() == 40
    assert not os.path.exists(os.path.join(idx, "promote.intent.json"))
    assert not os.path.exists(os.path.join(idx, "cells.rebuilding"))
    # a promote with nothing staged is a no-op, not a crash
    assert promote_next_codebook(spark, emb, idx) == cents3


def test_rm3_expansion_elects_feedback_terms(spark):
    from flink_rag_spark.operators.ranking import (
        rm3_expanded_topk,
        rm3_expansion_terms,
    )
    # docs 1-2 match "alpha" and carry "beta" heavily; doc 3 has beta
    # only; the filler docs keep beta's idf high enough that the
    # fbw×idf weight elects it (in a 4-doc corpus idf correctly
    # suppresses beta as too common — verified by hand).
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta beta delta"),
         (3, "beta epsilon zeta"), (4, "omega psi chi"),
         (5, "rho sigma tau"), (6, "mu nu xi"), (7, "eta theta iota")],
        "doc_id bigint, text string")
    exp = rm3_expansion_terms(docs, ["alpha"], n_fb=2, n_terms=1)
    [t] = exp.collect()
    assert t["term"] == "beta" and t["erank"] == 1

    out = rm3_expanded_topk(docs, ["alpha"], k=4, n_fb=2, n_terms=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 3 (no query term at all) is retrieved via the expansion arm
    assert 3 in rows and rows[3]["score"] > 0
    # unrelated doc 4 matches neither arm
    assert 4 not in rows
    # original-arm docs still lead: beta-only doc ranks below alpha docs
    assert rows[3]["rank"] > max(rows[1]["rank"], rows[2]["rank"])


def test_rm3_query_terms_never_self_expand(spark):
    from flink_rag_spark.operators.ranking import rm3_expansion_terms
    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha beta"), (2, "alpha gamma")],
        "doc_id bigint, text string")
    terms = [r["term"] for r in
             rm3_expansion_terms(docs, ["alpha"], n_fb=2,
                                 n_terms=5).collect()]
    assert "alpha" not in terms and len(terms) > 0


def test_merge_manifests_net_zero_double_fold_stays_visible(spark):
    """A remove-delta folded twice can net a bucket's count to exactly
    zero while the XOR re-adds the removed hashes — that residual must
    stay visible (n_rows=0, content_xor≠0), not be dropped with the
    legitimately-emptied buckets."""
    from flink_rag_spark.operators.integrity import (
        dataset_manifest,
        merge_manifests,
    )
    d = spark.createDataFrame([(1, "aaa"), (2, "bbb")],
                              "doc_id bigint, text string")
    m = lambda df: dataset_manifest(df, "doc_id", "text", buckets=1)  # noqa: E731
    delta = m(d.filter(F.col("doc_id") == 1))
    once = merge_manifests(m(d), delta, remove=True)
    assert once.count() == 1
    twice = merge_manifests(once, delta, remove=True)
    [r] = twice.collect()
    assert r["n_rows"] == 0 and r["content_xor"] != 0
    # whereas removing the true complement empties the bucket cleanly
    clean = merge_manifests(once, m(d.filter(F.col("doc_id") == 2)),
                            remove=True)
    assert clean.count() == 0


def test_retrain_crash_windows_leave_consistent_geometry(spark, tmp_path):
    """build_ivf_index commits through the intent/swap protocol: a crash
    BEFORE the intent leaves the old index (and any codebook staged
    against it) fully intact; a promote can never pair a staged codebook
    with a mismatched live geometry."""
    import json
    import os
    import shutil

    from flink_rag_spark.operators.index import (
        build_ivf_index,
        load_ivf_index,
        maintain_codebook,
        promote_next_codebook,
    )
    emb = _tiny_emb(spark)
    idx = str(tmp_path / "ivf")
    cents2 = build_ivf_index(spark, emb, idx, n_centroids=2)
    maintain_codebook(spark, emb, idx, batch_id=0, stream_id="s")

    # pre-intent retrain crash: rebuilt cells on disk, no intent marker
    shutil.copytree(os.path.join(idx, "cells"),
                    os.path.join(idx, "cells.rebuilding"))
    got, cells = load_ivf_index(spark, idx)
    assert got == cents2 and cells.count() == 40  # old index intact
    # ...and the staged codebook is still valid against it: promote works
    promoted = promote_next_codebook(spark, emb, idx)
    assert len(promoted) == 2
    assert not os.path.exists(os.path.join(idx, "cells.rebuilding"))

    # geometry guard: a stale staged file with the wrong k (legacy tree /
    # manual edit) is discarded by promote, never clobbers the live index
    live = json.load(open(os.path.join(idx, "centroids.json")))
    with open(os.path.join(idx, "next_codebook.json"), "w") as f:
        json.dump({"centroids": [[0.0, 0.0, 0.0]] * 5,
                   "counts": [1] * 5, "drift": 9.9}, f)
    kept = promote_next_codebook(spark, emb, idx)
    assert kept == live
    assert not os.path.exists(os.path.join(idx, "next_codebook.json"))
    got2, cells2 = load_ivf_index(spark, idx)
    assert got2 == live and cells2.count() == 40


def test_rm3_empty_query_terms_edge(spark):
    """Empty/blank query terms: the Spark chain returns an empty frame
    (no crash) and the DuckDB oracle SQL still parses and runs."""
    import duckdb

    from flink_rag_spark.operators.ranking import (
        rm3_expanded_topk,
        rm3_expanded_topk_duck,
    )
    docs = spark.createDataFrame([(1, "alpha beta"), (2, "gamma")],
                                 "doc_id bigint, text string")
    out = rm3_expanded_topk(docs, ["  "], k=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "score", "rank"]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                "(1, 'alpha beta'), (2, 'gamma')) t(doc_id, text)")
    assert con.execute(rm3_expanded_topk_duck(["  "], k=5)).fetchall() == []


def test_rm3_topk_plan_is_take_ordered(spark):
    """The final RM3 ranking must be a parallel TakeOrdered over the
    combined scores, not an all-to-one-partition global window sort."""
    from flink_rag_spark.operators.ranking import rm3_expanded_topk
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} w{i % 3}") for i in range(30)],
        "doc_id bigint, text string")
    plan = rm3_expanded_topk(docs, ["alpha"], k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
