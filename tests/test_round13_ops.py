"""Round-13 operator tests: NSW right-to-be-forgotten plus the round's
new operator families."""

import duckdb
import pytest


# ------------------------------------- skipToFirst / skipToLast CEP


def _skip_events(spark):
    """One user, pattern a (b,2) c. All-matches over the expansion
    (a,b,b,c): anchors 1,2,3,6 complete as (1,2,3,4), (2,3,5,7),
    (3,5,6,7), (6,8,9,10)."""
    rows = [("u", 1, "a"), ("u", 2, "b"), ("u", 3, "b"), ("u", 4, "c"),
            ("u", 2, "a"), ("u", 3, "a"), ("u", 5, "b"), ("u", 6, "b"),
            ("u", 7, "c"), ("u", 6, "a"), ("u", 8, "b"), ("u", 9, "b"),
            ("u", 10, "c")]
    import pyspark.sql.functions as F
    return (spark.createDataFrame(rows,
                                  "user_id string, s bigint, "
                                  "event_type string")
            .select("user_id",
                    F.timestamp_seconds(F.col("s")).alias("ts"),
                    "event_type"))


def _t_secs(rows, k):
    out = []
    for r in sorted(rows, key=lambda r: r["match_idx"]):
        out.append(tuple(
            int(r[f"t{j}"].timestamp()) for j in range(1, k + 1))
            + (r["match_idx"],))
    return out


def test_skip_to_first_and_last_hand_values(spark):
    """skipToFirst(b) re-anchors at the matched b-step's FIRST
    repetition (anchors 1,2,3,6 all emit); skipToLast(b) waits for its
    SECOND (anchors 1,3,6) — the enum members genuinely differ on the
    quantified step. Output collapses to one t per ORIGINAL step
    (anchor, b completion, c)."""
    from flink_rag_spark.operators.sequences import skip_to_funnel_matches
    e = _skip_events(spark)
    steps = ["a", ("b", 2), "c"]
    first = skip_to_funnel_matches(e, steps, 2, 6,
                                   position="first").collect()
    assert _t_secs(first, 3) == [(1, 3, 4, 1), (2, 5, 7, 2),
                                 (3, 6, 7, 3), (6, 9, 10, 4)]
    last = skip_to_funnel_matches(e, steps, 2, 6,
                                  position="last").collect()
    assert _t_secs(last, 3) == [(1, 3, 4, 1), (3, 6, 7, 2),
                                (6, 9, 10, 3)]
    # max_matches truncates the rounds
    trunc = skip_to_funnel_matches(e, steps, 2, 2,
                                   position="first").collect()
    assert _t_secs(trunc, 3) == [(1, 3, 4, 1), (2, 5, 7, 2)]
    # skipping to a LATER plain step (c): first ≡ last there
    for pos in ("first", "last"):
        byc = skip_to_funnel_matches(e, steps, 3, 6,
                                     position=pos).collect()
        assert _t_secs(byc, 3) == [(1, 3, 4, 1), (6, 9, 10, 2)]


def test_skip_to_guards_and_duck_parity(spark):
    """The FlinkCEP infinite-loop configuration (skip target = the
    match's own anchor) raises; a quantified FIRST step with
    position='last' is legal; validation; duck mirror replays the
    rounds bit-identically."""
    import pytest as _pytest

    from flink_rag_spark.operators.sequences import (
        skip_to_funnel_matches, skip_to_funnel_matches_duck)
    e = _skip_events(spark)
    steps = ["a", ("b", 2), "c"]
    with _pytest.raises(ValueError, match="anchor"):
        skip_to_funnel_matches(e, steps, 1, 3, position="first")
    with _pytest.raises(ValueError, match="anchor"):
        skip_to_funnel_matches(e, ["a", "b"], 1, 3, position="last")
    # quantified FIRST step: position='last' resolves to layer 2 — legal
    q = skip_to_funnel_matches(e, [("a", 2), "c"], 1, 3,
                               position="last")
    assert q.count() >= 0
    with _pytest.raises(ValueError):
        skip_to_funnel_matches(e, steps, 4, 3)
    with _pytest.raises(ValueError):
        skip_to_funnel_matches(e, steps, 2, 0)
    with _pytest.raises(ValueError):
        skip_to_funnel_matches(e, steps, 2, 3, position="mid")
    con = duckdb.connect()
    vals = ", ".join(
        f"('u', make_timestamp({s * 1_000_000}), '{t}')"
        for _, s, t in [(r[0], r[1], r[2]) for r in [
            ("u", 1, "a"), ("u", 2, "b"), ("u", 3, "b"), ("u", 4, "c"),
            ("u", 2, "a"), ("u", 3, "a"), ("u", 5, "b"), ("u", 6, "b"),
            ("u", 7, "c"), ("u", 6, "a"), ("u", 8, "b"), ("u", 9, "b"),
            ("u", 10, "c")]])
    con.execute("CREATE TABLE events AS SELECT * FROM (VALUES "
                f"{vals}) t(user_id, ts, event_type)")
    for pos in ("first", "last"):
        d = con.execute(skip_to_funnel_matches_duck(
            steps, 2, 6, pos) + " ORDER BY match_idx").fetchdf()
        got = [tuple(int(d[f"t{j}"][i].timestamp()) for j in (1, 2, 3))
               + (int(d["match_idx"][i]),) for i in range(len(d))]
        want = _t_secs(skip_to_funnel_matches(
            e, steps, 2, 6, position=pos).collect(), 3)
        assert got == want, (pos, got, want)


# --------------------- streaming all-matches / consumed monitors


def _write_cep_batch(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, u, t) for i, (ts, u, t) in enumerate(rows)],
        "event_id bigint, ts_s string, user_id bigint, event_type string"
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
                 "user_id", "event_type"
                 ).coalesce(1).write.mode("append").parquet(path)
    import time
    time.sleep(1.1)


def _drain(df, tmp_path, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "stream did not drain in time"
    return df.sparkSession.sql(f"select * from {name}")


def test_streaming_all_matches_matches_batch(spark, tmp_path):
    """noSkip streaming ≡ batch all_funnel_matches under cross-batch
    disorder: every completing anchor emits its own row (two anchors
    per key here — where funnel_monitor emits once), late-but-in-
    watermark events fold correctly, and a second completion in a
    LATER batch still emits (no done marker in the noSkip world)."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.sequences import all_funnel_matches
    from flink_rag_spark.streaming.cep import all_matches_monitor
    src = str(tmp_path / "am_src")
    steps = ["view", "click", "purchase"]
    # u1: two anchors sharing one continuation, click arrives EARLY
    # (batch 1) relative to its first view (batch 2) — bounded disorder
    _write_cep_batch(spark, src, [
        ("2024-01-01 00:10:00", 1, "click"),
        ("2024-01-01 00:20:00", 1, "purchase"),
        ("2024-01-01 00:05:00", 2, "view"),
        ("2024-01-01 00:06:00", 2, "click"),
        ("2024-01-01 00:07:00", 2, "purchase"),
        ("2024-01-01 00:01:00", 3, "view"),
    ])
    _write_cep_batch(spark, src, [
        ("2024-01-01 00:02:00", 1, "view"),
        ("2024-01-01 00:04:00", 1, "view"),
        ("2024-01-02 00:00:00", 99, "view"),
    ])
    # batch 3: u2 completes a SECOND anchor long after its first match
    _write_cep_batch(spark, src, [
        ("2024-01-02 01:00:00", 2, "view"),
        ("2024-01-02 01:01:00", 2, "click"),
        ("2024-01-02 01:02:00", 2, "purchase"),
        ("2024-01-10 00:00:00", 99, "view"),
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    got = {(r["user_id"], r["t1"], r["t2"], r["t3"]) for r in
           _drain(all_matches_monitor(stream, steps, watermark="1 hour"),
                  tmp_path, "am_t").collect()}
    want = {(r["user_id"], r["t1"], r["t2"], r["t3"]) for r in
            all_funnel_matches(spark.read.parquet(src), steps).collect()}
    assert got == want
    # u1 contributes TWO rows (both views), u2 three (01:05 chains via
    # 01:06+01:07; 00:05+00:06 anchor... exact set already pinned above)
    assert len([g for g in got if g[0] == 1]) == 2


def test_streaming_all_matches_within_bound(spark, tmp_path):
    """`within` kills anchors whose minimal completion exceeds the
    bound — streaming ≡ batch with within_seconds on the same events."""
    from flink_rag_spark.operators.sequences import all_funnel_matches
    from flink_rag_spark.streaming.cep import all_matches_monitor
    src = str(tmp_path / "amw_src")
    steps = ["view", "purchase"]
    _write_cep_batch(spark, src, [
        ("2024-01-01 00:00:00", 1, "view"),      # completes at +60s: in
        ("2024-01-01 00:01:00", 1, "purchase"),
        ("2024-01-01 00:10:00", 1, "view"),      # completes at +20m: out
        ("2024-01-01 00:30:00", 1, "purchase"),
        ("2024-01-02 00:00:00", 99, "view"),
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    got = {(r["user_id"], r["t1"], r["t2"]) for r in
           _drain(all_matches_monitor(stream, steps, watermark="1 hour",
                                      within_seconds=120),
                  tmp_path, "amw_t").collect()}
    want = {(r["user_id"], r["t1"], r["t2"]) for r in
            all_funnel_matches(spark.read.parquet(src), steps,
                               within_seconds=120).collect()}
    assert got == want and len(got) == 1


def test_streaming_consumed_matches_batch(spark, tmp_path):
    """skipPastLastEvent streaming ≡ batch consumed_funnel_matches
    (rows AND match_idx) under cross-batch disorder; an anchor whose
    events overlap a consumed match never emits; max_matches caps the
    key and later completions stay silent (done marker)."""
    from flink_rag_spark.operators.sequences import consumed_funnel_matches
    from flink_rag_spark.streaming.cep import consumed_matches_monitor
    src = str(tmp_path / "cm_src")
    steps = ["view", "click", "purchase"]
    # u1: anchors at 00:01 and 00:03 overlap (share the 00:04 chain
    # tail region): match 1 = (01,02,04); the 00:03 anchor's chain
    # (03,05,06) starts before 00:04 → consumed, never emits; next
    # match anchors at 00:05+ — none completes until batch 2
    _write_cep_batch(spark, src, [
        ("2024-01-01 00:01:00", 1, "view"),
        ("2024-01-01 00:02:00", 1, "click"),
        ("2024-01-01 00:03:00", 1, "view"),
        ("2024-01-01 00:04:00", 1, "purchase"),
        ("2024-01-01 00:05:00", 1, "click"),
        ("2024-01-01 00:06:00", 1, "purchase"),
    ])
    # batch 2: a second full match for u1, delivered with internal
    # disorder (purchase before its view in arrival order)
    _write_cep_batch(spark, src, [
        ("2024-01-01 00:40:00", 1, "purchase"),
        ("2024-01-01 00:20:00", 1, "view"),
        ("2024-01-01 00:30:00", 1, "click"),
        ("2024-01-10 00:00:00", 99, "view"),
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    got = {(r["user_id"], r["t1"], r["t2"], r["t3"], r["match_idx"])
           for r in _drain(consumed_matches_monitor(
               stream, steps, max_matches=5, watermark="1 hour"),
               tmp_path, "cm_t").collect()}
    want = {(r["user_id"], r["t1"], r["t2"], r["t3"], r["match_idx"])
            for r in consumed_funnel_matches(
                spark.read.parquet(src), steps, 5).collect()}
    assert got == want and len(got) == 2
    assert {g[4] for g in got} == {1, 2}
    # max_matches=1: only the first match emits even though a second
    # completes later
    got1 = {(r["user_id"], r["match_idx"]) for r in
            _drain(consumed_matches_monitor(
                stream, steps, max_matches=1, watermark="1 hour"),
                tmp_path, "cm1_t").collect()}
    assert got1 == {(1, 1)}


def test_streaming_cep_emission_modes_fuzzed(spark, tmp_path):
    """Randomized per-key event soups split across three disordered
    micro-batches (disorder within the watermark): both new monitors
    reproduce their batch twins exactly."""
    import random

    from flink_rag_spark.operators.sequences import (
        all_funnel_matches, consumed_funnel_matches)
    from flink_rag_spark.streaming.cep import (all_matches_monitor,
                                               consumed_matches_monitor)
    rng = random.Random(13)
    steps = ["a", "b", "c"]
    rows = []
    for u in range(1, 9):
        n = rng.randint(4, 14)
        ts = sorted(rng.sample(range(1, 3000), n))
        for t in ts:
            rows.append((f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}",
                         u, rng.choice(steps)))
    rng.shuffle(rows)
    # three batches; arrival order random but the 1h watermark swallows
    # every disorder on this 50-minute spread
    src = str(tmp_path / "fz_src")
    third = len(rows) // 3
    _write_cep_batch(spark, src, rows[:third])
    _write_cep_batch(spark, src, rows[third:2 * third])
    _write_cep_batch(spark, src, rows[2 * third:]
                     + [("2024-01-10 00:00:00", 99, "a")])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    ev = spark.read.parquet(src)
    got_am = sorted(
        ((r["user_id"], r["t1"], r["t2"], r["t3"]) for r in
         _drain(all_matches_monitor(stream, steps, watermark="1 hour"),
                tmp_path, "fz_am").collect()))
    want_am = sorted(
        ((r["user_id"], r["t1"], r["t2"], r["t3"]) for r in
         all_funnel_matches(ev, steps).collect()))
    assert got_am == want_am
    got_cm = sorted(
        ((r["user_id"], r["t1"], r["t2"], r["t3"], r["match_idx"])
         for r in _drain(consumed_matches_monitor(
             stream, steps, max_matches=4, watermark="1 hour"),
             tmp_path, "fz_cm").collect()))
    want_cm = sorted(
        ((r["user_id"], r["t1"], r["t2"], r["t3"], r["match_idx"])
         for r in consumed_funnel_matches(ev, steps, 4).collect()))
    assert got_cm == want_cm


# ------------------------------------------------------ NSW RTBF


def test_nsw_forget_documents(spark, sf_smoke, tmp_path):
    """After ``forget_in_nsw_index`` a probe can NEVER return a
    forgotten id (its vector row — the scoring surface — is gone), the
    index still fills to k and meets the recall floor against the exact
    tier ON THE SURVIVING CORPUS, forgotten entry points leave
    meta.json, and the pass is reentrant (second call removes 0)."""
    import json
    import os

    import pyspark.sql.functions as F

    from flink_rag_spark.operators.maintenance import forget_in_nsw_index
    from flink_rag_spark.operators.nsw import (build_nsw_index,
                                               nsw_knn_join, nsw_topk)
    from flink_rag_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    path = str(tmp_path / "nsw_forget")
    meta = build_nsw_index(spark, emb, path)
    qid = 7
    qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
    before = [r["vec_id"] for r in nsw_topk(spark, path, qv, k=10)
              .collect()]
    # forget the query's own top hits (the hardest case: they are the
    # ids the walk is navigating TOWARD) plus one entry point, so the
    # entry-pruning path executes too
    forgotten = set(before[:3]) | {meta["entry_ids"][0]}
    removed = forget_in_nsw_index(spark, path, sorted(forgotten))
    assert removed > 0
    with open(os.path.join(path, "meta.json")) as f:
        meta2 = json.load(f)
    assert not (set(meta2["entry_ids"]) & forgotten)
    assert meta2["entry_ids"], "index must stay probeable"
    # edges out of the forgotten ids' buckets are gone
    edges = spark.read.parquet(os.path.join(path, "edges"))
    assert edges.filter(F.col("src_id").isin(sorted(forgotten))) \
        .count() == 0
    surviving = emb.filter(~F.col("vec_id").isin(sorted(forgotten)))
    after = [r["vec_id"] for r in nsw_topk(spark, path, qv, k=10)
             .collect()]
    assert len(after) == 10
    assert not (set(after) & forgotten)
    exact = {r["vec_id"] for r in cosine_topk(surviving, qv,
                                              k=10).collect()}
    assert len(set(after) & exact) / 10.0 >= 0.5
    # the batch tier serves the same post-forget surface
    import numpy as np
    batch = nsw_knn_join(spark, path, ([qid], np.asarray([qv])), k=10)
    bids = {r["vec_id"] for r in batch.collect()}
    assert len(bids) == 10 and not (bids & forgotten)
    # reentrant: nothing left to remove
    assert forget_in_nsw_index(spark, path, sorted(forgotten)) == 0
    # empty id list is a no-op
    assert forget_in_nsw_index(spark, path, []) == 0


def test_nsw_forget_all_entries_promotes_survivors(spark, tmp_path):
    """Forgetting EVERY entry point promotes the smallest surviving ids
    so the graph stays probeable — the degraded-entry fallback."""
    import json
    import os

    from flink_rag_spark.operators.maintenance import forget_in_nsw_index
    from flink_rag_spark.operators.nsw import build_nsw_index, nsw_topk

    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0])
            for i in range(1, 41)]
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<double>")
    path = str(tmp_path / "nsw_entries")
    meta = build_nsw_index(spark, emb, path, n_centroids=4)
    forget_in_nsw_index(spark, path, meta["entry_ids"])
    with open(os.path.join(path, "meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["entry_ids"]
    assert not (set(meta2["entry_ids"]) & set(meta["entry_ids"]))
    out = nsw_topk(spark, path, [1.0, 1.0, 1.0], k=5).collect()
    assert 0 < len(out) <= 5
    assert not ({r["vec_id"] for r in out} & set(meta["entry_ids"]))


# ------------------------------------------ round-13 stats operators


def test_anova_f_hand_values(spark):
    """Two clean groups: SSB = 13.5, SSW = 4 → F = 13.5 exactly; NULL
    rows excluded; zero within-variance and single-group inputs yield
    NULL F with a False verdict; duck mirror bit-identical."""
    from flink_rag_spark.operators.hypothesis import anova_f, anova_f_duck
    rows = ([("a", x) for x in (1.0, 2.0, 3.0)]
            + [("b", x) for x in (4.0, 5.0, 6.0)]
            + [(None, 9.0), ("a", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = anova_f(df, "g", "v", 7.71).collect()[0]
    assert (out["n"], out["n_groups"]) == (6, 2)
    assert out["ss_between"] == 13.5 and out["ss_within"] == 4.0
    assert out["f"] == 13.5 and out["significant"]
    con = duckdb.connect()
    vals = ", ".join(
        f"({'NULL' if g is None else repr(g)}, "
        f"{'NULL' if v is None else v})" for g, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) x(g,v)")
    d = con.execute(anova_f_duck("SELECT g, v FROM t", "g", "v",
                                 7.71)).fetchdf()
    assert d["f"][0] == out["f"] and bool(d["significant"][0])
    assert d["ss_between"][0] == 13.5 and d["ss_within"][0] == 4.0
    flat = spark.createDataFrame([("a", 1.0), ("b", 1.0), ("a", 1.0)],
                                 "g string, v double")
    z = anova_f(flat, "g", "v", 7.71).collect()[0]
    assert z["f"] is None and not z["significant"]
    one = anova_f(spark.createDataFrame([("a", 1.0), ("a", 2.0)],
                                        "g string, v double"),
                  "g", "v", 7.71).collect()[0]
    assert one["f"] is None and not one["significant"]


def test_welch_t_hand_values(spark):
    """a = 1..4 vs constant b: se² = var_a/4, t = 0.5/√(5/12),
    Satterthwaite dof = 3; a zero-variance PAIR yields NULL t; NULLs
    excluded; duck parity."""
    from flink_rag_spark.operators.hypothesis import welch_t, welch_t_duck
    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,), (None,)],
                              "v double")
    b = spark.createDataFrame([(2.0,), (2.0,), (2.0,), (2.0,)],
                              "v double")
    out = welch_t(a, b, "v", 1.96).collect()[0]
    assert (out["n_a"], out["n_b"]) == (4, 4)
    assert out["mean_a"] == 2.5 and out["mean_b"] == 2.0
    assert out["t"] == round(0.5 / (5.0 / 12.0) ** 0.5, 6)
    assert out["dof"] == 3.0 and not out["significant"]
    con = duckdb.connect()
    con.execute("CREATE TABLE a AS SELECT * FROM (VALUES (1.0),(2.0),"
                "(3.0),(4.0),(NULL)) t(v)")
    con.execute("CREATE TABLE b AS SELECT * FROM (VALUES (2.0),(2.0),"
                "(2.0),(2.0)) t(v)")
    d = con.execute(welch_t_duck("SELECT v FROM a", "SELECT v FROM b",
                                 "v", 1.96)).fetchdf()
    assert d["t"][0] == out["t"] and d["dof"][0] == 3.0
    both = welch_t(b, b, "v", 1.96).collect()[0]
    assert both["t"] is None and not both["significant"]


def test_nelson_aalen_hand_values(spark):
    """Risk sets 5 → 2: H = 2/5, then 2/5 + 1/2; censoring-only times
    emit no row but shrink later risk sets; survival_fh = exp(−H);
    duck parity."""
    from flink_rag_spark.operators.survival import (nelson_aalen,
                                                    nelson_aalen_duck)
    rows = [(1.0, 1), (1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0)]
    df = spark.createDataFrame(rows, "dur double, ev int")
    out = {r["t"]: r for r in
           nelson_aalen(df, "dur", "ev").collect()}
    assert set(out) == {1.0, 3.0}
    assert (out[1.0]["n_risk"], out[1.0]["n_events"]) == (5, 2)
    assert out[1.0]["cum_hazard"] == 0.4
    assert (out[3.0]["n_risk"], out[3.0]["n_events"]) == (2, 1)
    assert out[3.0]["cum_hazard"] == 0.9
    assert out[3.0]["survival_fh"] == round(2.718281828459045 ** -0.9, 6)
    con = duckdb.connect()
    vals = ", ".join(f"({d}, {e})" for d, e in rows)
    con.execute(f"CREATE TABLE s AS SELECT * FROM (VALUES {vals}) "
                "x(dur, ev)")
    d = con.execute(nelson_aalen_duck("SELECT dur, ev FROM s", "dur",
                                      "ev") + " ORDER BY t").fetchdf()
    assert list(d["cum_hazard"]) == [0.4, 0.9]
    assert list(d["survival_fh"]) == [out[1.0]["survival_fh"],
                                      out[3.0]["survival_fh"]]


def test_ewma_control_hand_values(spark):
    """λ = 0.5 on [10, 12, 8, 14]: z = [10, 11, 9.5, 11.75] exactly;
    the t = 1 limit factor is exactly 0.5 (√(⅓·¾)); a singleton key
    emits NULL limits and never breaches; λ guards; duck parity."""
    from flink_rag_spark.operators.anomaly import (ewma_control,
                                                   ewma_control_duck)
    rows = [("u", i, i, x) for i, x in enumerate([10.0, 12.0, 8.0, 14.0])]
    rows.append(("solo", 1, 1, 5.0))
    df = spark.createDataFrame(rows,
                               "k string, t bigint, sq bigint, v double")
    out = sorted([r.asDict() for r in
                  ewma_control(df, ["k"], "t", "v", "sq", lam=0.5)
                  .filter("k = 'u'").collect()], key=lambda r: r["t"])
    assert [r["ewma"] for r in out] == [10.0, 11.0, 9.5, 11.75]
    mu = 11.0
    sig = (20.0 / 3.0) ** 0.5
    assert out[0]["center"] == 11.0
    assert out[0]["ucl"] == round(mu + 3.0 * sig * 0.5, 6)
    assert not any(r["breach"] for r in out)
    solo = ewma_control(df, ["k"], "t", "v", "sq", lam=0.5) \
        .filter("k = 'solo'").collect()[0]
    assert solo["ucl"] is None and not solo["breach"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ewma_control(df, ["k"], "t", "v", "sq", lam=0.0)
    with _pytest.raises(ValueError):
        ewma_control(df, ["k"], "t", "v", "sq", lam=0.01)  # > max lags
    with _pytest.raises(ValueError):
        ewma_control(df, ["k"], "t", "v", "sq", n_sigma=0.0)
    con = duckdb.connect()
    vals = ", ".join(f"('{k}',{t},{s},{v})" for k, t, s, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                "x(k, t, sq, v)")
    d = con.execute(ewma_control_duck("SELECT k, t, sq, v FROM t",
                                      ["k"], "t", "v", "sq", lam=0.5)
                    + " ORDER BY k DESC, t").fetchdf()
    for i, r in enumerate(out):
        for c in ("ewma", "center", "ucl", "lcl"):
            assert d[c][i] == r[c], (i, c)
        assert bool(d["breach"][i]) == r["breach"]


def test_t_closeness_hand_values(spark):
    """Ordered EMD per QI group against the global distribution:
    g1 ([1,1,2] vs global [.5,.25,.25]) scores 5/24, g2 (all mass on
    3) scores 0.625 — only g2 breaches t = 0.3; the categorical
    variant scores g1 at total-variation 0.25; single-valued table ⇒
    EMD 0; NULL sensitive rows excluded; duck parity."""
    from flink_rag_spark.operators.privacy import (t_closeness_audit,
                                                   t_closeness_audit_duck)
    rows = [("g1", 1), ("g1", 1), ("g1", 2), ("g2", 3), ("g1", None)]
    df = spark.createDataFrame(rows, "q string, v int")
    out = {r["q"]: r for r in
           t_closeness_audit(df, ["q"], "v", 0.3).collect()}
    assert out["g1"]["group_size"] == 3
    assert out["g1"]["emd"] == round((1.0 / 6 + 1.0 / 4) / 2, 6)
    assert not out["g1"]["at_risk"]
    assert out["g2"]["emd"] == 0.625 and out["g2"]["at_risk"]
    cat = {r["q"]: r for r in
           t_closeness_audit(df, ["q"], "v", 0.3,
                             ordered=False).collect()}
    assert cat["g1"]["emd"] == 0.25
    con = duckdb.connect()
    vals = ", ".join(
        f"('{q}', {'NULL' if v is None else v})" for q, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) x(q,v)")
    for ordered, ref in ((True, out), (False, cat)):
        d = con.execute(t_closeness_audit_duck(
            "SELECT q, v FROM t", ["q"], "v", 0.3, ordered=ordered)
            + " ORDER BY q").fetchdf()
        for i, q in enumerate(("g1", "g2")):
            assert d["emd"][i] == ref[q]["emd"], (ordered, q)
            assert bool(d["at_risk"][i]) == ref[q]["at_risk"]
    single = t_closeness_audit(
        spark.createDataFrame([("a", 1), ("b", 1)], "q string, v int"),
        ["q"], "v", 0.1).collect()
    assert all(r["emd"] == 0.0 and not r["at_risk"] for r in single)


def test_column_entropy_hand_values(spark):
    """Uniform two-category column: entropy ln 2, normalized 1, Gini
    impurity 0.5; a constant column: entropy 0, NULL normalization,
    impurity 0; NULL values excluded; NULL group keys survive the
    fold; duck parity."""
    import math

    from flink_rag_spark.operators.profiling import (column_entropy,
                                                     column_entropy_duck)
    rows = [("g", "a"), ("g", "a"), ("g", "b"), ("g", "b"), ("g", None),
            ("c", "x"), ("c", "x"), (None, "y"), (None, "z")]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r["k"]: r for r in
           column_entropy(df, "v", ["k"]).collect()}
    assert out["g"]["n"] == 4 and out["g"]["n_distinct"] == 2
    assert out["g"]["entropy"] == round(math.log(2), 6)
    assert out["g"]["entropy_norm"] == 1.0
    assert out["g"]["gini_impurity"] == 0.5
    assert out["c"]["entropy"] == 0.0
    assert out["c"]["entropy_norm"] is None
    assert out["c"]["gini_impurity"] == 0.0
    assert out[None]["n"] == 2 and out[None]["entropy_norm"] == 1.0
    # ungrouped: whole-column fold
    whole = column_entropy(df, "v").collect()[0]
    assert whole["n"] == 8 and whole["n_distinct"] == 5
    con = duckdb.connect()
    vals = ", ".join(
        f"({'NULL' if k is None else repr(k)}, "
        f"{'NULL' if v is None else repr(v)})" for k, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) x(k,v)")
    d = con.execute(column_entropy_duck("SELECT k, v FROM t", "v", ["k"])
                    + " ORDER BY k NULLS LAST").fetchdf()
    for i, k in enumerate(("c", "g", None)):
        r = out[k]
        assert d["entropy"][i] == r["entropy"], k
        gi = d["gini_impurity"][i]
        assert gi == r["gini_impurity"], k
    dw = con.execute(column_entropy_duck(
        "SELECT k, v FROM t", "v")).fetchdf()
    assert dw["entropy"][0] == whole["entropy"]
    assert dw["gini_impurity"][0] == whole["gini_impurity"]


def test_hits_hand_values_and_duck_parity(spark):
    """One-iteration hand case on 1→3, 2→3, 3→4: authorities (⅔, ⅓)
    on {3, 4}, hubs (0.4, 0.4, 0.2) on {1, 2, 3}; deeper runs pin
    against the unrolled duck mirror; validation."""
    from flink_rag_spark.operators.graph import hits, hits_duck
    edges = spark.createDataFrame([(1, 3), (2, 3), (3, 4)],
                                  "src bigint, dst bigint")
    one = {r["node"]: r for r in hits(edges, iters=1).collect()}
    assert one[3]["authority"] == round(2.0 / 3, 6)
    assert one[4]["authority"] == round(1.0 / 3, 6)
    assert one[1]["hub"] == 0.4 and one[2]["hub"] == 0.4
    assert one[3]["hub"] == 0.2 and one[4]["hub"] == 0.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hits(edges, iters=0)
    con = duckdb.connect()
    con.execute("CREATE TABLE edges_t AS SELECT * FROM (VALUES "
                "(1,3),(2,3),(3,4)) t(src, dst)")
    for iters in (1, 4):
        got = {r["node"]: (r["hub"], r["authority"]) for r in
               hits(edges, iters=iters).collect()}
        d = con.execute(hits_duck("SELECT src, dst FROM edges_t",
                                  iters=iters)).fetchdf()
        want = {int(d["node"][i]): (d["hub"][i], d["authority"][i])
                for i in range(len(d))}
        assert got == want, iters


def test_mann_kendall_hand_values(spark):
    """Strictly increasing series: S = C(5,2) = 10, z = 9/√(50/3),
    Sen slope exactly the line's slope; a tied-y case hits the tie
    correction and the interpolated slope median; duplicate x ⇒ NULL
    stats with False verdict (the loud-degrade contract); all-tied y ⇒
    NULL; duck parity."""
    from flink_rag_spark.operators.regression import (
        mann_kendall_trend, mann_kendall_trend_duck)
    rows = ([("up", i, 2.0 * i) for i in range(1, 6)]
            + [("tie", 1, 1.0), ("tie", 2, 1.0), ("tie", 3, 2.0)]
            + [("dup", 1, 1.0), ("dup", 1, 2.0), ("dup", 2, 3.0)]
            + [("flat", 1, 7.0), ("flat", 2, 7.0), ("flat", 3, 7.0)]
            + [("up", None, 1.0), ("up", 9, None)])
    df = spark.createDataFrame(rows, "k string, x bigint, v double")
    out = {r["k"]: r for r in
           mann_kendall_trend(df, ["k"], "x", "v").collect()}
    up = out["up"]
    assert (up["n_points"], up["s_stat"]) == (5, 10)
    assert up["z"] == round(9.0 / (50.0 / 3.0) ** 0.5, 6)
    assert up["significant"] and up["sen_slope"] == 2.0
    tie = out["tie"]
    assert tie["s_stat"] == 2
    assert tie["z"] == round(1.0 / (48.0 / 18.0) ** 0.5, 6)
    assert tie["sen_slope"] == 0.5 and not tie["significant"]
    dup = out["dup"]
    assert dup["s_stat"] is None and dup["z"] is None
    assert dup["sen_slope"] is None and not dup["significant"]
    flat = out["flat"]
    assert flat["z"] is None and not flat["significant"]
    con = duckdb.connect()
    vals = ", ".join(
        f"('{k}', {'NULL' if x is None else x}, "
        f"{'NULL' if v is None else v})" for k, x, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                "x(k, x, v)")
    d = con.execute(mann_kendall_trend_duck(
        "SELECT k, x, v FROM t", ["k"], "x", "v")
        + " ORDER BY k").fetchdf()
    for i in range(len(d)):
        k = d["k"][i]
        r = out[k]
        for c in ("z", "sen_slope"):
            a = r[c]
            b = d[c][i]
            assert (a is None and b != b) or a == b, (k, c, a, b)
        assert bool(d["significant"][i]) == r["significant"], k


def test_streaming_skip_to_matches_batch(spark, tmp_path):
    """skipToFirst/skipToLast streaming ≡ batch skip_to_funnel_matches
    (rows AND match_idx) on the quantified a (b,2) c pattern under
    cross-batch disorder — including the same-completion-instant
    double selection (two candidates at one fold event, selected in
    anchor order with the non-strict survivor rule) and the
    retained-candidate drain on a later watermark advance."""
    from flink_rag_spark.operators.sequences import skip_to_funnel_matches
    from flink_rag_spark.streaming.cep import skip_to_matches_monitor
    steps = ["a", ("b", 2), "c"]
    # the hand-test scenario: anchors 1,2,3,6 complete as (1,2,3,4),
    # (2,3,5,7), (3,5,6,7), (6,8,9,10) — b@3 arrives LATE (batch 2)
    base = "2024-01-01 00:00:0"
    ev = [(1, "a"), (2, "b"), (4, "c"), (2, "a"), (3, "a"),
          (5, "b"), (6, "b"), (7, "c"), (6, "a"), (8, "b"),
          (9, "b")]
    late = [(3, "b")]
    tail = [(10, "c")]
    def rows(pairs):
        return [(f"2024-01-01 00:00:{s:02d}", 7, t) for s, t in pairs]
    src = str(tmp_path / "sk_src")
    _write_cep_batch(spark, src, rows(ev))
    _write_cep_batch(spark, src, rows(late))
    _write_cep_batch(spark, src, rows(tail)
                     + [("2024-01-10 00:00:00", 99, "a")])
    for pos, qn in (("first", "sk_f"), ("last", "sk_l")):
        stream = (spark.readStream
                  .schema("event_id bigint, ts timestamp, "
                          "user_id bigint, event_type string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        got = sorted(
            (r["user_id"], r["t1"], r["t2"], r["t3"], r["match_idx"])
            for r in _drain(skip_to_matches_monitor(
                stream, steps, 2, 6, position=pos, watermark="1 hour"),
                tmp_path, qn).collect())
        want = sorted(
            (r["user_id"], r["t1"], r["t2"], r["t3"], r["match_idx"])
            for r in skip_to_funnel_matches(
                spark.read.parquet(src), steps, 2, 6,
                position=pos).collect())
        assert got == want, (pos, got, want)
    assert len({w[4] for w in want}) == 3      # skipToLast: 3 matches
    import pytest as _pytest
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    with _pytest.raises(ValueError, match="anchor"):
        skip_to_matches_monitor(stream, ["a", "b"], 1, 3)


def test_jarque_bera_hand_values(spark):
    """Symmetric two-point mass: skew 0, excess kurtosis −2, JB = n/6
    exactly; n < 4 and constant groups emit NULL with False verdicts;
    NULLs excluded; duck parity (grouped AND whole-column)."""
    from flink_rag_spark.operators.hypothesis import (jarque_bera,
                                                      jarque_bera_duck)
    rows = ([("g", x) for x in (0.0, 0.0, 2.0, 2.0)]
            + [("tiny", 1.0), ("tiny", 2.0), ("tiny", 3.0)]
            + [("const", 5.0)] * 4 + [("g", None)])
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["k"]: r for r in
           jarque_bera(df, "v", ["k"]).collect()}
    g = out["g"]
    assert g["n"] == 4 and g["skewness"] == 0.0
    assert g["kurtosis_excess"] == -2.0
    assert g["jb"] == round(4.0 / 6.0, 6) and not g["significant"]
    assert out["tiny"]["jb"] is None and not out["tiny"]["significant"]
    assert out["const"]["jb"] is None
    whole = jarque_bera(df, "v").collect()[0]
    assert whole["n"] == 11
    con = duckdb.connect()
    vals = ", ".join(
        f"('{k}', {'NULL' if v is None else v})" for k, v in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) x(k,v)")
    d = con.execute(jarque_bera_duck("SELECT k, v FROM t", "v", ["k"])
                    + " ORDER BY k").fetchdf()
    for i, k in enumerate(("const", "g", "tiny")):
        r = out[k]
        for c in ("skewness", "kurtosis_excess", "jb"):
            a, b = r[c], d[c][i]
            assert (a is None and b != b) or a == b, (k, c, a, b)
    dw = con.execute(jarque_bera_duck(
        "SELECT k, v FROM t", "v")).fetchdf()
    assert dw["jb"][0] == whole["jb"]


def test_brown_forsythe_hand_values(spark):
    """Two groups with IDENTICAL deviation profiles around their own
    medians score F = 0 (equal spread); blowing one group's spread up
    makes the verdict significant; duck parity."""
    from flink_rag_spark.operators.hypothesis import (brown_forsythe,
                                                      brown_forsythe_duck)
    eq = ([("a", x) for x in (0.0, 2.0, 7.0)]
          + [("b", x) for x in (10.0, 12.0, 17.0)])
    df = spark.createDataFrame(eq, "g string, v double")
    out = brown_forsythe(df, "g", "v", 7.71).collect()[0]
    assert out["f"] == 0.0 and not out["significant"]
    con = duckdb.connect()
    vals = ", ".join(f"('{g}', {v})" for g, v in eq)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) x(g,v)")
    d = con.execute(brown_forsythe_duck("SELECT g, v FROM t", "g", "v",
                                        7.71)).fetchdf()
    assert d["f"][0] == 0.0 and not bool(d["significant"][0])
    uneq = ([("a", x) for x in (0.0, 1.0, 2.0, 1.0, 0.0, 2.0)]
            + [("b", x) for x in (0.0, 50.0, 100.0, 40.0, 60.0, 110.0)])
    df2 = spark.createDataFrame(uneq, "g string, v double")
    o2 = brown_forsythe(df2, "g", "v", 7.71).collect()[0]
    assert o2["significant"]
    vals2 = ", ".join(f"('{g}', {v})" for g, v in uneq)
    con.execute("CREATE TABLE t2 AS SELECT * FROM (VALUES "
                f"{vals2}) x(g,v)")
    d2 = con.execute(brown_forsythe_duck("SELECT g, v FROM t2", "g",
                                         "v", 7.71)).fetchdf()
    assert d2["f"][0] == o2["f"]


def test_cuped_ab_hand_values(spark):
    """θ = cov/var = 2 exactly on the engineered covariate; adjusted
    means 37/3 vs 34/3 (lift 1), Welch-form z = 3/√2 significant where
    the RAW comparison's variance would swamp it; var_reduction =
    12/13; zero covariate variance degrades to θ = 0; NULL units
    excluded; duck parity."""
    from flink_rag_spark.operators.hypothesis import (cuped_ab_test,
                                                      cuped_ab_test_duck)
    rows = [("A", 10.0, 5.0), ("A", 14.0, 7.0), ("A", 13.0, 6.0),
            ("B", 9.0, 5.0), ("B", 13.0, 7.0), ("B", 12.0, 6.0),
            ("A", None, 1.0), ("B", 5.0, None), ("C", 99.0, 99.0)]
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    out = cuped_ab_test(df, "arm", "y", "x", "A", "B").collect()[0]
    assert (out["n_a"], out["n_b"]) == (3, 3)
    assert out["theta"] == 2.0
    assert out["mean_a"] == round(37.0 / 3, 6)
    assert out["mean_b"] == round(34.0 / 3, 6)
    assert out["lift"] == 1.0
    assert out["z"] == round(1.0 / (2.0 / 9.0) ** 0.5, 6)
    assert out["significant"]
    assert out["var_reduction"] == round(12.0 / 13, 6)
    con = duckdb.connect()
    vals = ", ".join(
        f"('{a}', {'NULL' if y is None else y}, "
        f"{'NULL' if x is None else x})" for a, y, x in rows)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) "
                "u(arm, y, x)")
    d = con.execute(cuped_ab_test_duck("SELECT arm, y, x FROM t",
                                       "arm", "y", "x", "A",
                                       "B")).fetchdf()
    for c in ("theta", "var_reduction", "mean_a", "mean_b", "lift", "z"):
        assert d[c][0] == out[c], c
    assert bool(d["significant"][0]) == out["significant"]
    # constant covariate: theta 0, test degrades to the plain compare
    const = spark.createDataFrame(
        [("A", 1.0, 3.0), ("A", 2.0, 3.0), ("B", 4.0, 3.0),
         ("B", 6.0, 3.0)], "arm string, y double, x double")
    o2 = cuped_ab_test(const, "arm", "y", "x", "A", "B").collect()[0]
    assert o2["theta"] == 0.0 and o2["var_reduction"] == 0.0
