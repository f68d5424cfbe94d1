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
