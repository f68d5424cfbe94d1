"""Round-8c operator contracts: phrase mining, tokenizer coverage, PSI
drift, hard-negative mining, fuzzy decontamination.

`test_oracle_parity.py` value-hashes the catalog entries against DuckDB;
these tests pin the DEFINITIONS on hand-built inputs where the expected
values are computable by hand, so an implementation-and-oracle that
drifted together would still fail.
"""

import math

import pyspark.sql.functions as F


def test_pmi_collocations_hand_computed(spark):
    from flink_rag_spark.operators.phrases import pmi_collocations
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")],
        "doc_id bigint, text string")
    out = pmi_collocations(docs, "text", min_count=2, top_n=5).collect()
    # unigrams: a=3 b=2 c=1 (T=6); pairs: "a b"=2 "a c"=1 (TB=3);
    # min_count=2 keeps only "a b": pmi = ln((2/3)/((3/6)(2/6))) = ln 4
    assert len(out) == 1
    [r] = out
    assert (r["w1"], r["w2"], r["n_pair"], r["rank"]) == ("a", "b", 2, 1)
    assert r["pmi"] == round(math.log(4.0), 6)


def test_pmi_min_count_and_tiebreak(spark):
    from flink_rag_spark.operators.phrases import pmi_collocations
    # two pairs with IDENTICAL pmi -> tie-break on (w1, w2) ascending
    docs = spark.createDataFrame(
        [(1, "p q"), (2, "p q"), (3, "x y"), (4, "x y")],
        "doc_id bigint, text string")
    out = pmi_collocations(docs, "text", min_count=2, top_n=5).collect()
    assert [(r["w1"], r["w2"], r["rank"]) for r in out] == \
        [("p", "q", 1), ("x", "y", 2)]


def test_vocab_coverage_hand_computed(spark):
    from flink_rag_spark.operators.encoding import (
        build_vocab,
        vocab_coverage,
    )
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "z")], "doc_id bigint, text string")
    vocab = build_vocab(docs, "text", vocab_size=1)  # keeps only "x"
    rows = {r["doc_id"]: r for r in
            vocab_coverage(docs, "text", "doc_id", vocab).collect()}
    assert rows[1]["n_tokens"] == 3 and rows[1]["n_oov"] == 1
    assert rows[1]["oov_rate"] == round(1 / 3, 6)
    assert rows[2]["n_tokens"] == 1 and rows[2]["n_oov"] == 1
    assert rows[2]["oov_rate"] == 1.0


def test_psi_drift_identical_and_shifted(spark):
    from flink_rag_spark.operators.drift import psi_drift
    vals = [(float(i),) for i in range(1, 101)]
    ref = spark.createDataFrame(vals, "value double")
    same = psi_drift(ref, ref, "value", n_bins=5).collect()
    assert len(same) == 5
    assert all(r["psi_term"] == 0.0 for r in same)
    assert all(r["psi_total"] == 0.0 for r in same)
    # total shift: every current row lands in the top reference bin
    cur = spark.createDataFrame([(200.0,)] * 50, "value double")
    shifted = psi_drift(ref, cur, "value", n_bins=5).collect()
    assert all(r["psi_total"] > 0.25 for r in shifted)  # "shifted" band
    top = max(shifted, key=lambda r: r["bin"])
    assert top["n_cur"] == 50 and top["p_cur"] == 1.0
    # reference-side probabilities floor at eps, never 0/ln(0)
    assert all(math.isfinite(r["psi_term"]) for r in shifted)


def test_hard_negative_mine_excludes_same_label_and_self(spark):
    from flink_rag_spark.operators.contrastive import hard_negative_mine
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0),     # anchor
         (2, [1.0, 0.0], 0),     # same label, identical vector -> excluded
         (3, [0.9, 0.1], 1),     # hard negative (most similar, other label)
         (4, [0.0, 1.0], 1),     # easy negative
         (5, [0.5, 0.5], 2)],
        "vec_id bigint, embedding array<float>, label int")
    anchors = emb.filter(F.col("vec_id") == 1)
    out = hard_negative_mine(anchors, emb, k=2).collect()
    assert [(r["anchor_id"], r["vec_id"], r["rank"]) for r in out] == \
        [(1, 3, 1), (1, 5, 2)]
    assert all(r["label"] != 0 and r["vec_id"] != 1 for r in out)
    # scores descend and the same-label twin never appears
    assert out[0]["score"] > out[1]["score"]


def test_fuzzy_decontaminate_drops_near_dupes_only(spark):
    from flink_rag_spark.operators.curation import fuzzy_decontaminate
    leak = ("the quick brown fox jumps over the lazy dog "
            "while the cat watches from the fence nearby today")
    near = leak.replace("today", "tonight")  # one-token paraphrase
    clean = ("completely unrelated text about spark partitions and "
             "shuffle boundaries in distributed aggregation plans")
    train = spark.createDataFrame(
        [(1, leak), (2, near), (3, clean)], "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(100, leak)], "doc_id bigint, text string")
    kept = sorted(r["doc_id"] for r in
                  fuzzy_decontaminate(train, bench, "text", "doc_id",
                                      threshold=0.4).collect())
    # exact copy AND the paraphrase are dropped; unrelated text survives
    assert kept == [3]
    # at an impossible threshold nothing is dropped
    kept_all = sorted(r["doc_id"] for r in
                      fuzzy_decontaminate(train, bench, "text", "doc_id",
                                          threshold=1.01).collect())
    assert kept_all == [1, 2, 3]


def test_fuzzy_join_blocking_and_threshold(spark):
    from flink_rag_spark.operators.linkage import (
        block_stats,
        fuzzy_join_pairs,
        fuzzy_self_pairs,
    )
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "zenith ltd")], "id bigint, name string")
    right = spark.createDataFrame(
        [(10, "acme corp."), (11, "acme inc"), (12, "apex corp")],
        "id bigint, name string")
    out = fuzzy_join_pairs(left, right, "id", "name", "id", "name",
                           max_distance=2).collect()
    # "acme corp." (d=1) matches; "acme inc" (d=5) and "apex corp" (d=2
    # but in block "ap" != "ac") do not
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in out] == \
        [(1, 10, 1)]

    # self-pairs over distinct values, ordered, no self-match
    df = spark.createDataFrame(
        [("color",), ("color",), ("colour",), ("colder",), ("zzz",)],
        "v string")
    pairs = fuzzy_self_pairs(df, "v", max_distance=1).collect()
    assert [(r["str_a"], r["str_b"], r["distance"]) for r in pairs] == \
        [("color", "colour", 1)]

    # block observability: "co" holds 3 distinct-value rows, "zz" 1
    stats = {r["block"]: r["n"] for r in
             block_stats(df.distinct(), "v").collect()}
    assert stats == {"co": 3, "zz": 1}


def test_fuzzy_join_threshold_equals_untresholded_filter(spark):
    """The early-abandon threshold form must keep exactly the pairs a
    plain levenshtein <= d filter keeps (the oracle's formulation)."""
    import pyspark.sql.functions as FF
    from flink_rag_spark.operators.linkage import fuzzy_join_pairs
    vals = [(i, w) for i, w in enumerate(
        ["spark", "spork", "sparse", "spade", "spray", "sprat"])]
    df = spark.createDataFrame(vals, "id bigint, v string")
    got = {(r["id_a"], r["id_b"]) for r in
           fuzzy_join_pairs(df, df, "id", "v", "id", "v",
                            max_distance=2).collect()
           if r["id_a"] < r["id_b"]}
    ref = df.select(FF.col("id").alias("ia"), FF.col("v").alias("va")) \
        .crossJoin(df.select(FF.col("id").alias("ib"),
                             FF.col("v").alias("vb"))) \
        .filter((FF.col("ia") < FF.col("ib"))
                & (FF.levenshtein("va", "vb") <= 2)).collect()
    assert got == {(r["ia"], r["ib"]) for r in ref}


# ------------------------------------------- streaming drift monitor


def test_drift_reference_and_batch_psi_agree_with_batch_operator(
        spark, tmp_path):
    """batch_psi against the stored profile must agree with the batch
    operator psi_drift on the same two frames (same bins, floors,
    formula) — the streaming tier is the batch operator's fold, not a
    reimplementation that can drift."""
    from flink_rag_spark.operators.drift import psi_drift
    from flink_rag_spark.streaming.drift_monitor import (
        batch_psi,
        build_drift_reference,
        load_drift_reference,
    )
    ref_df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                                   "value double")
    cur_df = spark.createDataFrame([(float(i),) for i in range(40, 80)],
                                   "value double")
    path = str(tmp_path / "ref")
    built = build_drift_reference(ref_df, "value", path, n_bins=5)
    assert load_drift_reference(path) == built
    assert len(built["boundaries"]) == 4 and len(built["p_ref"]) == 5

    psi_same, n_same = batch_psi(ref_df, built)
    assert n_same == 100 and psi_same == 0.0
    psi_cur, n_cur = batch_psi(cur_df, built)
    batch_op = psi_drift(ref_df, cur_df, "value", n_bins=5).collect()
    assert abs(psi_cur - batch_op[0]["psi_total"]) < 1e-5
    assert psi_cur > 0.25  # concentrated sample = shifted
    # empty frame: no distribution to score
    assert batch_psi(cur_df.filter("value > 999"), built) == (None, 0)


def test_streaming_drift_monitor_routes_and_is_idempotent(
        spark, tmp_path):
    from flink_rag_spark.streaming.drift_monitor import (
        build_drift_reference,
        run_drift_monitor,
    )
    ref_df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                                   "value double")
    ref_path = str(tmp_path / "ref")
    build_drift_reference(ref_df, "value", ref_path, n_bins=5)
    src = tmp_path / "src"
    src.mkdir()
    # batch A: a fresh uniform sample (stable); batch B: total shift
    stable = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                                   "value double")
    shifted = spark.createDataFrame([(999.0,)] * 50, "value double")
    stable.coalesce(1).write.parquet(str(src / "a"))
    shifted.coalesce(1).write.parquet(str(src / "b"))
    mets, ok, quar = (str(tmp_path / p) for p in ("mets", "ok", "quar"))

    def drain(cp):
        stream = (spark.readStream.schema(stable.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src / "*")))
        q = run_drift_monitor(spark, stream, ref_path, mets,
                              cp, threshold=0.25, pass_path=ok,
                              quarantine_path=quar, available_now=True)
        assert q.awaitTermination(120)

    drain(str(tmp_path / "cp1"))
    m = {r["batch_id"]: r for r in spark.read.parquet(mets).collect()}
    assert len(m) == 2
    drifted = {bid: r["drifted"] for bid, r in m.items()}
    assert sorted(drifted.values()) == [False, True]
    assert spark.read.parquet(ok).count() == 100     # the stable batch
    assert spark.read.parquet(quar).count() == 50    # the shifted batch
    psis = sorted(r["psi"] for r in m.values())
    assert psis[0] == 0.0 and psis[1] > 0.25

    # fresh checkpoint: the same files replay under the same batch ids —
    # every sink overwrites its own partitions, counts unchanged
    drain(str(tmp_path / "cp2"))
    assert spark.read.parquet(mets).count() == 2
    assert spark.read.parquet(ok).count() == 100
    assert spark.read.parquet(quar).count() == 50
