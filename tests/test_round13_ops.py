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
