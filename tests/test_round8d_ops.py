"""Round-8d operator contracts: CEP-style sequence funnel, event
transition matrix, retention cohorts.

`test_oracle_parity.py` value-hashes the catalog entries against DuckDB;
these tests pin the DEFINITIONS on hand-built event streams where the
expected funnel/transition/retention values are computable by hand, so
an implementation-and-oracle that drifted together would still fail.
"""

from datetime import datetime

EV = "event_id bigint, ts timestamp, user_id bigint, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h, m), u, t)
         for i, (d, h, m, u, t) in enumerate(rows)], EV)


def test_funnel_strict_order_and_skip(spark):
    from flink_rag_spark.operators.sequences import funnel_times
    # u1 completes view->click->purchase in order; u2 clicks BEFORE its
    # view (click must not count); u3 views only.
    e = _ev(spark, [
        (1, 0, 0, 1, "view"), (1, 1, 0, 1, "click"),
        (1, 2, 0, 1, "purchase"),
        (2, 0, 0, 2, "click"), (2, 1, 0, 2, "view"),
        (3, 0, 0, 3, "view"),
    ])
    rows = {r["user_id"]: r for r in
            funnel_times(e, ["view", "click", "purchase"]).collect()}
    assert rows[1]["t3"] == datetime(2024, 1, 1, 2, 0)
    assert rows[2]["t1"] == datetime(2024, 1, 2, 1, 0)
    assert rows[2]["t2"] is None and rows[2]["t3"] is None
    assert rows[3]["t2"] is None


def test_funnel_skip_till_next_match_takes_earliest(spark):
    from flink_rag_spark.operators.sequences import funnel_times
    # view@0, noise click before view ignored, click@2, click@5 ->
    # earliest valid click (2) anchors purchase search
    e = _ev(spark, [
        (1, 0, 0, 7, "view"), (1, 2, 0, 7, "click"),
        (1, 5, 0, 7, "click"), (1, 6, 0, 7, "purchase"),
    ])
    [r] = funnel_times(e, ["view", "click", "purchase"]).collect()
    assert r["t2"] == datetime(2024, 1, 1, 2, 0)
    assert r["t3"] == datetime(2024, 1, 1, 6, 0)


def test_funnel_within_window_bounds_from_first_anchor(spark):
    from flink_rag_spark.operators.sequences import funnel_times
    # click 2 hours after the first view: excluded under within=3600 s,
    # included under within=86400 s — greedy first-anchor clock.
    e = _ev(spark, [
        (1, 0, 0, 5, "view"), (1, 2, 0, 5, "click"),
    ])
    [tight] = funnel_times(e, ["view", "click"],
                           within_seconds=3600).collect()
    assert tight["t2"] is None
    [loose] = funnel_times(e, ["view", "click"],
                           within_seconds=86400).collect()
    assert loose["t2"] == datetime(2024, 1, 1, 2, 0)


def test_funnel_summary_counts_and_rates(spark):
    from flink_rag_spark.operators.sequences import funnel_summary
    # 2 users view, 1 converts to click
    e = _ev(spark, [
        (1, 0, 0, 1, "view"), (1, 1, 0, 1, "click"),
        (2, 0, 0, 2, "view"),
    ])
    rows = {r["step"]: r for r in
            funnel_summary(e, ["view", "click"]).collect()}
    assert rows[1]["n_keys"] == 2 and rows[1]["conv_from_first"] == 1.0
    assert rows[2]["n_keys"] == 1
    assert rows[2]["conv_from_first"] == 0.5
    assert rows[2]["conv_from_prev"] == 0.5


def test_event_transitions_probabilities(spark):
    from flink_rag_spark.operators.sequences import event_transitions
    # u1: a b a b ; u2: a b  -> from a: b x3 (p=1); from b: a x1 (p=1)
    e = _ev(spark, [
        (1, 0, 0, 1, "a"), (1, 1, 0, 1, "b"),
        (1, 2, 0, 1, "a"), (1, 3, 0, 1, "b"),
        (2, 0, 0, 2, "a"), (2, 1, 0, 2, "b"),
    ])
    rows = {(r["prev_type"], r["next_type"]): r
            for r in event_transitions(e).collect()}
    assert rows[("a", "b")]["n_pairs"] == 3
    assert rows[("a", "b")]["p_next"] == 1.0
    assert rows[("b", "a")]["n_pairs"] == 1
    assert ("b", "b") not in rows


def test_event_transitions_tie_breaks_on_seq(spark):
    from flink_rag_spark.operators.sequences import event_transitions
    # two events at the SAME ts: order by event_id -> x then y
    e = _ev(spark, [(1, 0, 0, 9, "x"), (1, 0, 0, 9, "y")])
    rows = [(r["prev_type"], r["next_type"])
            for r in event_transitions(e).collect()]
    assert rows == [("x", "y")]


def test_cohort_retention_offsets_and_ratio(spark):
    from flink_rag_spark.operators.sequences import cohort_retention
    # Mon 2024-01-01 week: u1 signs up day 1, active day 9 (offset 1);
    # u2 signs up day 2, never returns. Week-0 size = 2.
    e = _ev(spark, [
        (1, 0, 0, 1, "signup"), (9, 0, 0, 1, "view"),
        (2, 0, 0, 2, "signup"),
    ])
    rows = {r["week_offset"]: r for r in cohort_retention(e).collect()}
    assert rows[0]["n_active"] == 2 and rows[0]["retention"] == 1.0
    assert rows[1]["n_active"] == 1 and rows[1]["retention"] == 0.5
    # all in the same Monday-start cohort week
    assert rows[0]["cohort_week"] == datetime(2024, 1, 1)


def test_cohort_retention_pre_signup_activity_excluded(spark):
    from flink_rag_spark.operators.sequences import cohort_retention
    # activity BEFORE the signup anchor must not count anywhere
    e = _ev(spark, [
        (1, 0, 0, 4, "view"), (3, 0, 0, 4, "signup"),
    ])
    rows = {r["week_offset"]: r for r in cohort_retention(e).collect()}
    assert set(rows) == {0} and rows[0]["n_active"] == 1


def test_funnel_single_exchange_plan(spark):
    """The k-step funnel must cost ONE shuffle: all window layers and the
    final per-key aggregate share the key partitioning."""
    from flink_rag_spark.operators.sequences import funnel_times
    e = _ev(spark, [(1, 0, 0, 1, "view"), (1, 1, 0, 1, "click"),
                    (1, 2, 0, 1, "purchase")])
    ft = funnel_times(e, ["view", "click", "purchase"])
    plan = ft._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window ") == 3


# ---- DSIR importance selection (operators/importance.py) ----

def _poly(tok):
    h = 0
    for c in tok:
        h = (h * 31 + ord(c)) % 1_000_000_007
    return h


def _dsir_feats(text, B):
    toks = text.lower().split()
    uni = [_poly(t) for t in toks]
    big = []
    n = max(len(uni) - 1, 1)
    for i in range(n):
        h = 0
        for j in (i, i + 1):
            th = uni[j] if j < len(uni) else 0
            h = (h * 1_000_003 + th) % 1_000_000_007
        big.append(h)
    return [h % B for h in uni + big]


def _dsir_expected(raw, tgt, B, alpha=1.0):
    import math
    from collections import Counter
    cr = Counter(b for _, t in raw for b in _dsir_feats(t, B))
    ct = Counter(b for _, t in tgt for b in _dsir_feats(t, B))
    nr, nt = sum(cr.values()), sum(ct.values())
    lam = {b: math.log((ct.get(b, 0) + alpha) / (nt + alpha * B))
           - math.log((cr.get(b, 0) + alpha) / (nr + alpha * B))
           for b in set(cr) | set(ct)}
    out = {}
    for i, t in raw:
        fs = _dsir_feats(t, B)
        out[i] = round(sum(lam[b] for b in fs), 6)
    return out


def test_dsir_log_weights_match_pure_python_replica(spark):
    from flink_rag_spark.operators.importance import dsir_log_weights
    raw = [(1, "aa aa bb"), (2, "bb cc"), (3, "aa cc aa")]
    tgt = [(1, "aa aa bb"), (3, "aa cc aa")]
    B = 64
    rdf = spark.createDataFrame(raw, "doc_id bigint, text string")
    tdf = spark.createDataFrame(tgt, "doc_id bigint, text string")
    got = {r["doc_id"]: r["log_weight"] for r in
           dsir_log_weights(rdf, tdf, "text", "doc_id",
                            n_buckets=B).collect()}
    assert got == _dsir_expected(raw, tgt, B)


def test_dsir_select_prefers_target_like_docs(spark):
    from flink_rag_spark.operators.importance import dsir_select
    # target speaks "aa"; raw doc 1 is pure "aa", doc 2 pure "zz"
    raw = [(1, "aa aa aa"), (2, "zz zz zz")]
    tgt = [(9, "aa aa")]
    rdf = spark.createDataFrame(raw, "doc_id bigint, text string")
    tdf = spark.createDataFrame(tgt, "doc_id bigint, text string")
    out = dsir_select(rdf, tdf, "text", "doc_id", top_n=2,
                      n_buckets=64).orderBy("rank").collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["log_weight"] > out[1]["log_weight"]
    assert [r["rank"] for r in out] == [1, 2]


# ---- streaming CEP funnel (streaming/cep.py) ----

def _write_batch(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, u, t) for i, (ts, u, t) in enumerate(rows)],
        "event_id bigint, ts_s string, user_id bigint, event_type string"
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
                 "user_id", "event_type"
                 ).coalesce(1).write.mode("append").parquet(path)
    # one file per logical batch: maxFilesPerTrigger=1 + mtime ordering
    # make trigger order == write order, so the disorder stays within
    # the watermark instead of racing on part-file pickup order
    import time
    time.sleep(1.1)


def test_streaming_funnel_matches_batch_with_bounded_disorder(spark, tmp_path):
    """Out-of-order arrival ACROSS micro-batches (within the watermark)
    must not change completions: streaming emissions ≡ batch funnel_times
    completions on the same events."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.sequences import funnel_times
    from flink_rag_spark.streaming.cep import funnel_monitor
    src = str(tmp_path / "cep_src")
    steps = ["view", "click", "purchase"]
    # batch 1: u1's click+purchase arrive BEFORE its view (sent in b2);
    # u2 completes in order; u3 never purchases
    _write_batch(spark, src, [
        ("2024-01-01 00:10:00", 1, "click"),
        ("2024-01-01 00:20:00", 1, "purchase"),
        ("2024-01-01 00:05:00", 2, "view"),
        ("2024-01-01 00:06:00", 2, "click"),
        ("2024-01-01 00:07:00", 2, "purchase"),
        ("2024-01-01 00:01:00", 3, "view"),
    ])
    # batch 2: u1's view, EARLIER than its batch-1 events (disorder
    # bounded by the 1h watermark); plus a far-future flush event that
    # pushes the watermark past everything
    _write_batch(spark, src, [
        ("2024-01-01 00:02:00", 1, "view"),
        ("2024-01-10 00:00:00", 99, "view"),
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (funnel_monitor(stream, steps, watermark="1 hour")
         .writeStream.format("memory").queryName("cep_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_cep"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    got = {(r["user_id"], r["t1"], r["t2"], r["t3"])
           for r in spark.sql("select * from cep_t").collect()}
    batch = (funnel_times(
        spark.read.parquet(src), steps)
        .filter(F.col("t3").isNotNull()).collect())
    want = {(r["user_id"], r["t1"], r["t2"], r["t3"]) for r in batch}
    assert got == want and len(got) == 2  # u1 and u2 complete


def test_streaming_funnel_emits_once_per_key(spark, tmp_path):
    """A second completing sequence for an already-done key must not
    re-emit (the done marker outlives the buffers)."""
    from flink_rag_spark.streaming.cep import funnel_monitor
    src = str(tmp_path / "cep_once")
    _write_batch(spark, src, [
        ("2024-01-01 00:01:00", 1, "view"),
        ("2024-01-01 00:02:00", 1, "click"),
    ])
    _write_batch(spark, src, [
        ("2024-01-02 00:01:00", 1, "view"),
        ("2024-01-02 00:02:00", 1, "click"),
        ("2024-01-12 00:00:00", 99, "view"),
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (funnel_monitor(stream, ["view", "click"], watermark="1 hour")
         .writeStream.format("memory").queryName("cep_once_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_cep_once"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    rows = spark.sql("select * from cep_once_t").collect()
    assert len(rows) == 1
    assert rows[0]["t1"].isoformat() == "2024-01-01T00:01:00"


# ---- BPE tokenizer induction (operators/bpe.py) ----

def _bpe_replica(word_counts, n_merges, min_pair_count=2):
    """Pure-python reference BPE (Sennrich alg. 1) with the operator's
    tie-break: (count DESC, l ASC, r ASC)."""
    from collections import Counter
    syms = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < min_pair_count:
            break
        merges.append((rank, l, r, n))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_bpe_matches_pure_python_replica(spark):
    from flink_rag_spark.operators.bpe import train_bpe
    texts = [(1, "low low low lower lowest"),
             (2, "new newer newest low"),
             (3, "wider wide wide")]
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    wc = {}
    for _, t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want_merges, want_syms = _bpe_replica(wc, 8)
    merges, ws = train_bpe(docs, n_merges=8)
    got_syms = {r["word"]: list(r["syms"]) for r in ws.collect()}
    ws.unpersist()
    assert merges == want_merges
    assert got_syms == want_syms


def test_bpe_encode_roundtrip_and_oov_fallback(spark):
    from flink_rag_spark.operators.bpe import bpe_encode, train_bpe
    train = spark.createDataFrame(
        [(1, "ab ab ab cd")], "doc_id bigint, text string")
    merges, ws = train_bpe(train, n_merges=4)
    # encoding a doc with a train word and an UNSEEN word: the unseen
    # word falls back to chars + </w>; concatenating pieces and
    # stripping markers reconstructs the text
    docs = spark.createDataFrame(
        [(7, "ab zz")], "doc_id bigint, text string")
    [r] = bpe_encode(docs, ws, "text", "doc_id").collect()
    ws.unpersist()
    pieces = list(r["pieces"])
    assert "".join(pieces).replace("</w>", " ").strip() == "ab zz"
    # trained word is fused; unseen word is characters
    assert pieces[0] == "ab</w>"
    assert pieces[1:] == ["z", "z", "</w>"]


def test_bpe_stops_below_min_pair_count(spark):
    from flink_rag_spark.operators.bpe import train_bpe
    docs = spark.createDataFrame(
        [(1, "xy")], "doc_id bigint, text string")
    # every pair occurs once -> no merge reaches min_pair_count=2
    merges, ws = train_bpe(docs, n_merges=5)
    ws.unpersist()
    assert merges == []


# ---- product quantization (operators/pq.py) ----

def _clustered_vecs(n_per, dim=16, centers=((0.0, 5.0), (5.0, 0.0))):
    rows = []
    vid = 0
    for cx, cy in centers:
        for i in range(n_per):
            # deterministic jitter, alternating dims around the center
            v = [(cx if d % 2 == 0 else cy) + ((vid * 31 + d * 7) % 10) / 50.0
                 for d in range(dim)]
            rows.append((vid, v))
            vid += 1
    return rows


def test_pq_codes_shape_and_determinism(spark):
    from flink_rag_spark.operators.pq import pq_encode, train_pq
    emb = spark.createDataFrame(_clustered_vecs(12, dim=16),
                                "vec_id bigint, embedding array<double>")
    cb1 = train_pq(emb, m=4, k=4, iters=3)
    cb2 = train_pq(emb, m=4, k=4, iters=3)
    assert cb1 == cb2  # deterministic init + tie-breaks
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(emb, cb1).collect()}
    assert all(len(c) == 4 and all(0 <= x < 4 for x in c)
               for c in codes.values())


def test_pq_topk_recall_contract(spark):
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.pq import ann_pq_topk
    from flink_rag_spark.operators.similarity import cosine_topk
    emb = spark.createDataFrame(_clustered_vecs(20, dim=16),
                                "vec_id bigint, embedding array<double>")
    qv = [r["embedding"] for r in
          emb.filter(F.col("vec_id") == 3).collect()][0]
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
    got = [r["vec_id"] for r in
           ann_pq_topk(emb, qv, k=10, m=4, kc=4, iters=3).collect()]
    assert len(got) == 10
    assert len(set(got) & exact) / 10.0 >= 0.5  # the graded floor


# ---- streaming DSIR importance gate (streaming/importance_gate.py) ----

def _gate_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_importance_gate_scoring_equals_batch_operator(spark, tmp_path):
    """score_batch under a saved sidecar ≡ dsir_log_weights on the same
    frames — same features, λ, rounding."""
    from flink_rag_spark.operators.importance import dsir_log_weights
    from flink_rag_spark.streaming.importance_gate import (
        save_estimator,
        score_batch,
    )
    raw = _gate_docs(spark, [(1, "aa aa bb"), (2, "bb cc"),
                             (3, "aa cc aa"), (4, "dd dd")])
    tgt = _gate_docs(spark, [(1, "aa aa bb"), (3, "aa cc aa")])
    est = save_estimator(raw, tgt, "text", str(tmp_path / "est"),
                         n_buckets=64)
    want = {(r["doc_id"], r["n_feats"], r["log_weight"]) for r in
            dsir_log_weights(raw, tgt, "text", "doc_id",
                             n_buckets=64).collect()}
    got = {(r["doc_id"], r["n_feats"], r["log_weight"]) for r in
           score_batch(raw, est, "text", "doc_id").collect()}
    assert got == want
    # a doc unseen at fit time scores each feature through the sidecar's
    # λ map with lam_default for absent buckets — replayed exactly by
    # the pure-python feature replica (buckets MAY collide with fitted
    # ones at B=64; the lookup, not bucket freshness, is the contract)
    unseen = _gate_docs(spark, [(9, "zz qq")])
    [r] = score_batch(unseen, est, "text", "doc_id").collect()
    want_lw = round(sum(est["lam"].get(str(b), est["lam_default"])
                        for b in _dsir_feats("zz qq", 64)), 6)
    assert r["log_weight"] == want_lw and r["n_feats"] == 3


def test_importance_gate_routes_and_replays_idempotently(spark, tmp_path):
    from flink_rag_spark.streaming.importance_gate import (
        run_importance_gate,
        save_estimator,
    )
    from flink_rag_spark.streaming.importance_gate import (
        load_estimator,
        score_batch,
    )
    # doc 5 has NULL text: unscorable -> must land in reject with
    # NULL provenance, never silently vanish
    raw = _gate_docs(spark, [(1, "aa aa"), (2, "zz zz"),
                             (3, "aa bb"), (4, "zz qq"), (5, None)])
    tgt = _gate_docs(spark, [(1, "aa aa")])
    est_path = str(tmp_path / "est")
    save_estimator(raw, tgt, "text", est_path, n_buckets=64)
    # pick the threshold from the actual scores so BOTH sides are
    # provably non-empty: midway between doc 1 (most target-like) and
    # doc 2 (pure off-domain)
    sc = {r["doc_id"]: r["log_weight"] for r in
          score_batch(raw, load_estimator(est_path),
                      "text", "doc_id").collect()}
    assert sc[1] > sc[2]
    thr = (sc[1] + sc[2]) / 2.0
    src = tmp_path / "src"
    src.mkdir()
    raw.coalesce(1).write.parquet(str(src / "b1"))
    pas, rej = str(tmp_path / "pass"), str(tmp_path / "rej")

    def drain(cp):
        stream = spark.readStream.schema(
            "doc_id bigint, text string").parquet(str(src / "*"))
        q = run_importance_gate(spark, stream, est_path,
                                str(tmp_path / cp), threshold=thr,
                                pass_path=pas, reject_path=rej,
                                available_now=True)
        assert q.awaitTermination(120)

    drain("cp1")
    passed = {r["doc_id"] for r in spark.read.parquet(pas).collect()}
    rej_rows = {r["doc_id"]: r for r in spark.read.parquet(rej).collect()}
    rejected = set(rej_rows)
    assert passed | rejected == {1, 2, 3, 4, 5}
    assert passed & rejected == set()
    assert 1 in passed and 2 in rejected  # target-speak in, off-domain out
    assert 5 in rejected and rej_rows[5]["log_weight"] is None
    # rows carry provenance
    cols = set(spark.read.parquet(pas).columns)
    assert {"n_feats", "log_weight", "batch_id"} <= cols
    # fresh checkpoint: the same file replays as batch 0 — identical rows
    drain("cp2")
    assert spark.read.parquet(pas).count() == len(passed)
    assert spark.read.parquet(rej).count() == len(rejected)


# ---- ROC-AUC (operators/evaluation.py roc_auc) ----

def test_roc_auc_hand_computed_with_ties(spark):
    from flink_rag_spark.operators.evaluation import roc_auc
    # scores: pos {3, 2}, neg {2, 1} — pairs: (3>2)=1, (3>1)=1,
    # (2=2)=0.5, (2>1)=1 -> U=3.5 of 4 -> AUC 0.875
    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)], "s double, y int")
    [r] = roc_auc(df, "s", "y").collect()
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 0.875)


def test_roc_auc_perfect_random_and_empty_class(spark):
    from flink_rag_spark.operators.evaluation import roc_auc
    perfect = spark.createDataFrame(
        [(2.0, 1), (3.0, 1), (0.5, 0), (1.0, 0)], "s double, y int")
    [p] = roc_auc(perfect, "s", "y").collect()
    assert p["auc"] == 1.0
    # every score tied -> AUC exactly 0.5
    tied = spark.createDataFrame(
        [(1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0)], "s double, y int")
    [t] = roc_auc(tied, "s", "y").collect()
    assert t["auc"] == 0.5
    onesided = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
    [o] = roc_auc(onesided, "s", "y").collect()
    assert o["auc"] is None and o["n_neg"] == 0


def test_funnel_predicate_steps(spark):
    """Steps can be arbitrary Column predicates (MATCH_RECOGNIZE shape),
    not just event types: a view followed by a HIGH-VALUE purchase."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.sequences import funnel_times
    rows = [(0, datetime(2024, 1, 1, 0, 0), 1, "view", 1.0),
            (1, datetime(2024, 1, 1, 1, 0), 1, "purchase", 5.0),
            (2, datetime(2024, 1, 1, 2, 0), 1, "purchase", 50.0),
            (3, datetime(2024, 1, 1, 0, 0), 2, "view", 1.0),
            (4, datetime(2024, 1, 1, 1, 0), 2, "purchase", 5.0)]
    e = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    steps = ["view",
             (F.col("event_type") == "purchase") & (F.col("value") > 30)]
    got = {r["user_id"]: r for r in funnel_times(e, steps).collect()}
    # u1's cheap purchase is skipped; the 50.0 one completes step 2
    assert got[1]["t2"] == datetime(2024, 1, 1, 2, 0)
    assert got[2]["t2"] is None


def test_ivfpq_index_recall_and_pruning(spark, tmp_path):
    """IVF-PQ: cells bound which vectors a probe touches (partition
    pruning asserted in-plan), residual-PQ codes bound the bytes; the
    exact re-rank keeps recall above the graded ANN floor."""
    import re

    import pyspark.sql.functions as F
    from flink_rag_spark.operators.pq import build_ivfpq_index, ivfpq_topk
    from flink_rag_spark.operators.similarity import cosine_topk
    emb = spark.createDataFrame(_clustered_vecs(24, dim=16),
                                "vec_id bigint, embedding array<double>")
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, emb, path, n_centroids=4, m=4, kc=4, iters=3)
    qv = [r["embedding"] for r in
          emb.filter(F.col("vec_id") == 5).collect()][0]
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
    res = ivfpq_topk(spark, path, qv, emb, k=10, n_probe=2)
    ids = [r["vec_id"] for r in res.collect()]
    assert len(ids) == 10
    assert len(set(ids) & exact) / 10.0 >= 0.5
    # the probe's code scan is partition-pruned to the probed cells
    codes = (spark.read.parquet(path + "/cells")
             .filter(F.col("cell").isin([0, 1])))
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*cell.* IN \(0,1\)", plan)


# ---- percolation / reverse search (operators/percolate.py) ----

def test_percolate_and_or_and_m_of_n(spark):
    from flink_rag_spark.operators.percolate import match_stored_queries
    docs = spark.createDataFrame(
        [(1, "Fast red table"), (2, "fast boat"), (3, "slow boat"),
         (4, "merge the batch"), (5, "merge value stream")],
        "doc_id bigint, text string")
    q = spark.createDataFrame(
        [(1, ["fast", "table"], None),       # AND
         (2, ["slow", "scan"], 1),           # OR
         (3, ["merge", "batch", "value"], 2)],  # 2-of-3
        "query_id int, terms array<string>, min_match int")
    out = {(r["doc_id"], r["query_id"]): r for r in
           match_stored_queries(docs, q).collect()}
    assert out[(1, 1)]["matched"]            # both terms (case-folded)
    assert not out[(2, 1)]["matched"]        # fast alone fails AND
    assert out[(3, 2)]["matched"]            # OR: one term suffices
    assert out[(4, 3)]["matched"]            # merge+batch = 2 of 3
    assert out[(5, 3)]["matched"]            # merge+value = 2 of 3
    assert (2, 3) not in out or not out[(2, 3)]["matched"]
    # a doc sharing no term with a query yields NO row at all
    assert (3, 1) not in out


def test_percolate_term_frequency_does_not_count(spark):
    """Set semantics: repeating a query term in the doc matches it once."""
    from flink_rag_spark.operators.percolate import match_stored_queries
    docs = spark.createDataFrame(
        [(1, "fast fast fast")], "doc_id bigint, text string")
    q = spark.createDataFrame(
        [(1, ["fast", "table"], None)],
        "query_id int, terms array<string>, min_match int")
    [r] = match_stored_queries(docs, q).collect()
    assert r["n_matched"] == 1 and not r["matched"]


def test_percolate_dedupes_across_rows_and_case_variant_terms(spark):
    """An id spanning multiple rows still counts each term once, and
    case-variant duplicate query terms collapse to one term."""
    from flink_rag_spark.operators.percolate import match_stored_queries
    docs = spark.createDataFrame(
        [(1, "fast cat"), (1, "fast dog")], "doc_id bigint, text string")
    q = spark.createDataFrame(
        [(1, ["Fast", "fast", "table"], 2)],
        "query_id int, terms array<string>, min_match int")
    [r] = match_stored_queries(docs, q).collect()
    # terms dedupe to {fast, table} (n_terms=2); 'fast' matches ONCE
    # despite two doc rows -> 1 < min_match=2
    assert r["n_terms"] == 2 and r["n_matched"] == 1
    assert not r["matched"]


def test_entity_resolution_chain_and_singleton(spark, monkeypatch):
    """Transitive variants (A~B, B~C but A never within distance of C)
    still resolve to ONE entity via the min-id representative;
    untouched names represent themselves."""
    import flink_rag_spark.plans.llm as llm
    from flink_rag_spark.operators.graph import connected_components
    from flink_rag_spark.operators.linkage import fuzzy_self_pairs
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("aaaa cat",), ("aaab cat",), ("aabb cat",), ("zzzz dog",)],
        "p_name string")
    pairs = fuzzy_self_pairs(df, "p_name", max_distance=1,
                             block_expr=llm.FUZZY_MATCH_BLOCK)
    # chain: aaaa~aaab (1), aaab~aabb (1); aaaa~aabb distance 2 -> no edge
    got = {(r["str_a"], r["str_b"]) for r in pairs.collect()}
    assert got == {("aaaa cat", "aaab cat"), ("aaab cat", "aabb cat")}
    cc = {r["node"]: r["group_rep"] for r in
          connected_components(pairs, "str_a", "str_b").collect()}
    assert cc == {"aaaa cat": "aaaa cat", "aaab cat": "aaaa cat",
                  "aabb cat": "aaaa cat"}


def test_streaming_funnel_watermark_boundary_semantics(spark, tmp_path):
    """Pin the stable part of the lateness boundary: an event one
    second ABOVE the watermark is always delivered and completes the
    funnel, and a boundary-EQUAL event either completes with the exact
    boundary timestamp or is engine-dropped (Spark's equality behavior
    is order-sensitive; the operator's >= check makes delivery imply
    correct folding — see cep.py)."""
    from flink_rag_spark.streaming.cep import funnel_monitor
    src = str(tmp_path / "cep_wm")
    # b1: two views + a setter pinning max event time at 11:00
    # -> the watermark stays 10:00 for every later batch until the flush
    _write_batch(spark, src, [
        ("2024-01-01 09:00:00", 1, "view"),
        ("2024-01-01 09:00:00", 2, "view"),
        ("2024-01-01 11:00:00", 9, "view"),
    ])
    # b2: u1 clicks at EXACTLY the watermark (dropped by the engine);
    # u2 clicks one second above it (delivered)
    _write_batch(spark, src, [
        ("2024-01-01 10:00:00", 1, "click"),
        ("2024-01-01 10:00:01", 2, "click"),
    ])
    # b3: far-future flush drains buffers
    _write_batch(spark, src, [
        ("2024-01-10 00:00:00", 9, "view"),
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (funnel_monitor(stream, ["view", "click"], watermark="1 hour")
         .writeStream.format("memory").queryName("cep_wm_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_cep_wm"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    rows = {r["user_id"]: r for r in
            spark.sql("select * from cep_wm_t").collect()}
    assert 2 in rows
    assert rows[2]["t2"].isoformat() == "2024-01-01T10:00:01"
    # boundary-equal click: engine-dropped OR folded at exactly 10:00 —
    # never a wrong value, never a crash
    if 1 in rows:
        assert rows[1]["t2"].isoformat() == "2024-01-01T10:00:00"


# ---- PageRank (operators/graph.py) ----

def test_pagerank_matches_pure_python_replica_with_dangling(spark):
    from flink_rag_spark.operators.graph import pagerank
    # a->b, a->c, b->c ; c dangles
    edges = [("a", "b"), ("a", "c"), ("b", "c")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["pr"] for r in pagerank(e, iters=4).collect()}
    d, n = 0.85, 3
    pr = {k: 1.0 / n for k in "abc"}
    deg = {"a": 2, "b": 1}
    for _ in range(4):
        dm = pr["c"]
        base = (1 - d) / n + d * dm / n
        pr = {"a": base,
              "b": base + d * pr["a"] / deg["a"],
              "c": base + d * (pr["a"] / deg["a"] + pr["b"] / deg["b"])}
    assert got == {k: round(v, 6) for k, v in pr.items()}


def test_pagerank_symmetric_triangle_is_uniform(spark):
    from flink_rag_spark.operators.graph import pagerank
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    out = {r["pr"] for r in pagerank(e, iters=5).collect()}
    assert out == {0.333333}
