"""Round-11 operator tests: strict-contiguity CEP (next/notNext) and
metadata-filtered k-NN across the serving tiers."""

import duckdb
import pytest


def _load_emb(spark, sf):
    from flink_rag_spark.sources.tables import load_table
    return load_table(spark, sf, "embeddings")


def test_filtered_exact_knn(spark, sf_oracle):
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.similarity import cosine_topk, knn_join
    emb = _load_emb(spark, sf_oracle)
    qv = list(emb.filter("vec_id = 7").first()["embedding"])
    got = cosine_topk(emb, qv, k=10, where="label < 3").collect()
    ref = cosine_topk(emb.filter("label < 3"), qv, k=10).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == \
           [(r["vec_id"], r["score"]) for r in ref]
    labels = {r["label"] for r in emb.join(
        spark.createDataFrame([(r["vec_id"],) for r in got],
                              "vec_id bigint"), "vec_id").collect()}
    assert labels <= {0, 1, 2}
    # batch path: filtered knn_join ≡ knn_join over the filtered corpus
    q = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    got_b = knn_join(q, emb, k=5, where="label >= 5").collect()
    ref_b = knn_join(q, emb.filter("label >= 5"), k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted([(key(r), r["vec_id"]) for r in got_b]) == \
           sorted([(key(r), r["vec_id"]) for r in ref_b])


def test_filtered_ivf_and_lsh_fill_k(spark, sf_oracle):
    from flink_rag_spark.operators.similarity import (ann_ivf_topk,
                                                      ann_lsh_topk,
                                                      cosine_topk)
    emb = _load_emb(spark, sf_oracle)
    qv = list(emb.filter("vec_id = 7").first()["embedding"])
    exact = {r["vec_id"] for r in cosine_topk(
        emb, qv, k=10, where="label < 3").collect()}
    got = ann_ivf_topk(emb, qv, k=10, where="label < 3").collect()
    # filter-then-score: always k rows (the filtered set is >> k), all
    # satisfying the predicate, recall ≥ the contract floor
    assert len(got) == 10
    ids = [r["vec_id"] for r in got]
    lab = {r["vec_id"]: r["label"]
           for r in emb.select("vec_id", "label").collect()}
    assert all(lab[i] < 3 for i in ids)
    assert len(set(ids) & exact) / 10.0 >= 0.5
    got_l = ann_lsh_topk(emb, qv, k=10, where="label < 3").collect()
    assert all(lab[r["vec_id"]] < 3 for r in got_l)


def test_filtered_ivfpq_no_underfill(spark, sf_oracle, tmp_path):
    import numpy as np

    from flink_rag_spark.operators.pq import (build_ivfpq_index,
                                              ivfpq_knn_join, ivfpq_topk)
    from flink_rag_spark.operators.similarity import cosine_topk
    emb = _load_emb(spark, sf_oracle)
    qv = list(emb.filter("vec_id = 7").first()["embedding"])
    idx = str(tmp_path / "ivfpq_filtered")
    build_ivfpq_index(spark, emb, idx, n_centroids=4, m=4, kc=4, iters=3)
    lab = {r["vec_id"]: r["label"]
           for r in emb.select("vec_id", "label").collect()}
    # a ~10%-selective predicate: the post-filter approach (cut top
    # rerank_factor*k first, filter second) would underfill k here;
    # the semi-join-before-cut contract must return exactly k matches
    pred = "label = 5"
    exact = {r["vec_id"] for r in cosine_topk(
        emb, qv, k=10, where=pred).collect()}
    got = ivfpq_topk(spark, idx, qv, emb, k=10, n_probe=2,
                     where=pred).collect()
    assert len(got) == 10
    assert all(lab[r["vec_id"]] == 5 for r in got)
    assert len({r["vec_id"] for r in got} & exact) / 10.0 >= 0.5
    # batch twin under the same predicate
    got_b = ivfpq_knn_join(spark, idx, ([7], np.asarray([qv])), emb,
                           k=10, n_probe=2, where=pred).collect()
    assert len(got_b) == 10
    assert all(lab[r["vec_id"]] == 5 for r in got_b)
    # and the demonstration that POST-filtering the unfiltered top-k
    # underfills (the failure mode the contract exists to prevent)
    unfiltered = ivfpq_topk(spark, idx, qv, emb, k=10,
                            n_probe=2).collect()
    post = [r for r in unfiltered if lab[r["vec_id"]] == 5]
    assert len(post) < 10


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")


def test_weighted_pagerank_hand_values(spark):
    from flink_rag_spark.operators.graph import pagerank
    # star: 1 -> 2 (w=3), 1 -> 3 (w=1); 2,3 dangling
    e = spark.createDataFrame([(1, 2, 3), (1, 3, 1)],
                              "src bigint, dst bigint, w bigint")
    out = {r["node"]: r["pr"] for r in
           pagerank(e, iters=1, damping=0.85, weight="w").collect()}
    # pr0 = 1/3 each; dangling mass = 2/3 (nodes 2,3)
    base = 0.15 / 3 + 0.85 * (2 / 3) / 3
    assert abs(out[1] - round(base, 6)) < 1e-9
    assert abs(out[2] - round(base + 0.85 * (1 / 3) * (3 / 4), 6)) < 1e-9
    assert abs(out[3] - round(base + 0.85 * (1 / 3) * (1 / 4), 6)) < 1e-9
    # uniform weights ≡ unweighted (the weight path degenerates exactly)
    import pyspark.sql.functions as F
    e2 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src bigint, dst bigint")
    uw = {r["node"]: r["pr"] for r in pagerank(e2, iters=3).collect()}
    ww = {r["node"]: r["pr"] for r in pagerank(
        e2.withColumn("w", F.lit(1)), iters=3, weight="w").collect()}
    assert uw == ww


def test_weighted_shortest_paths_hand_and_mirror(spark):
    from flink_rag_spark.operators.graph import (
        weighted_shortest_paths, weighted_shortest_paths_duck)
    # cheapest path ≠ fewest hops: 1->4 direct costs 10, 1->2->3->4
    # costs 3; node 5 unreachable within rounds; 6 disconnected
    rows = [(1, 4, 10.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0),
            (4, 5, 1.0), (6, 7, 1.0)]
    e = spark.createDataFrame(rows, "u bigint, v bigint, w double")
    out = {r["node"]: r["dist"] for r in
           weighted_shortest_paths(e, [1], 3).collect()}
    assert out[1] == 0.0 and out[2] == 1.0 and out[3] == 2.0
    assert out[4] == 3.0            # relaxed below the direct 10.0
    # node 5 at 3 rounds only via the EXPENSIVE 1->4->5 prefix (the
    # cheap chain needs 4 edges); 6 is disconnected from the seed
    assert out[5] == 11.0 and 6 not in out
    # one more round relaxes node 5 through the cheap chain
    out4 = {r["node"]: r["dist"] for r in
            weighted_shortest_paths(e, [1], 4).collect()}
    assert out4[4] == 3.0 and out4[5] == 4.0
    # mirror parity on a fuzzed graph
    import random
    rng = random.Random(31)
    fuzz = [(rng.randrange(20), rng.randrange(20),
             round(rng.uniform(0.5, 5.0), 3)) for _ in range(80)]
    ef = spark.createDataFrame(fuzz, "u bigint, v bigint, w double")
    sp = {(r["node"], r["dist"]) for r in
          weighted_shortest_paths(ef, [0, 1], 3).collect()}
    con = duckdb.connect()
    con.register("edges", ef.toPandas())
    du = con.execute(weighted_shortest_paths_duck(
        "SELECT u, v, w FROM edges", [0, 1], 3)).fetchdf()
    assert sp == {(int(r.node), float(r.dist))
                  for r in du.itertuples()}
    with pytest.raises(ValueError):
        weighted_shortest_paths(e, [], 3)
    with pytest.raises(ValueError):
        weighted_shortest_paths(e, [1], -1)


def test_lm_dirichlet_indexed_matches_inline_and_prunes(spark, sf_oracle,
                                                        tmp_path):
    """The persisted-index LM-Dirichlet path must return bit-identical
    top-k to the inline operator (same formula, cf from postings, |C|
    from stats), partition-prune the postings scan, and stay identical
    after an append (the mergeable-stats contract)."""
    from flink_rag_spark.operators.ranking import (
        append_to_text_index,
        build_text_index,
        lm_dirichlet_topk,
        lm_dirichlet_topk_indexed,
    )
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    terms = ["spark", "join", "vector", "window"]
    path = str(tmp_path / "lmidx")
    build_text_index(spark, d, path, n_parts=16)
    inline = [(r["doc_id"], r["score"], r["rank"]) for r in
              lm_dirichlet_topk(d, terms, k=15).collect()]
    indexed = [(r["doc_id"], r["score"], r["rank"]) for r in
               lm_dirichlet_topk_indexed(spark, path, terms,
                                         k=15).collect()]
    assert inline == indexed and len(inline) == 15
    plan = lm_dirichlet_topk_indexed(
        spark, path, terms, k=15)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "tp" in plan.split("PartitionFilters")[1][:200]
    # incremental: append half the corpus again under shifted ids; the
    # maintained index must equal a fresh rebuild of the grown corpus
    import pyspark.sql.functions as F
    extra = (d.filter("doc_id % 2 = 0")
             .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    append_to_text_index(spark, extra, path)
    grown = d.unionByName(extra)
    inline2 = [(r["doc_id"], r["score"], r["rank"]) for r in
               lm_dirichlet_topk(grown, terms, k=15).collect()]
    indexed2 = [(r["doc_id"], r["score"], r["rank"]) for r in
                lm_dirichlet_topk_indexed(spark, path, terms,
                                          k=15).collect()]
    assert inline2 == indexed2


def test_strict_funnel_hand_values(spark):
    from datetime import datetime

    from flink_rag_spark.operators.sequences import strict_funnel_times
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: view immediately followed by click, purchase later: match
        (0, t(1), 1, "view"), (1, t(2), 1, "click"),
        (2, t(5), 1, "purchase"),
        # u2: a signup intervenes between view and click: strict gap
        # broken, no match even though the relaxed funnel would match
        (3, t(1), 2, "view"), (4, t(2), 2, "signup"),
        (5, t(3), 2, "click"), (6, t(4), 2, "purchase"),
        # u3: FIRST view not followed by click, SECOND is — the match
        # must come from the later anchor (fixed-anchor layering would
        # miss it; FlinkCEP's NFA tries every anchor)
        (7, t(1), 3, "view"), (8, t(2), 3, "error"),
        (9, t(3), 3, "view"), (10, t(4), 3, "click"),
        (11, t(5), 3, "purchase"),
        # u4: click's immediate successor IS an error (notNext
        # violated) and no later clean anchor exists: no match
        (12, t(1), 4, "view"), (13, t(2), 4, "click"),
        (14, t(3), 4, "error"), (15, t(4), 4, "purchase"),
        # u5: first anchor voided by notNext, later clean view->click
        # matches
        (16, t(1), 5, "view"), (17, t(2), 5, "click"),
        (18, t(3), 5, "error"), (19, t(4), 5, "view"),
        (20, t(5), 5, "click"), (21, t(6), 5, "purchase"),
        # u6: click is the key's LAST event — no next event, notNext
        # passes (bounded-input reading), but then no purchase either
        (22, t(1), 6, "view"), (23, t(2), 6, "click"),
    ]
    out = {r["user_id"]: r for r in strict_funnel_times(
        _ev(spark, rows), ["view", "click", "purchase"],
        ["next", "followedBy"], {2: "error"}).collect()}
    assert out[1]["t3"] == t(5) and out[1]["t1"] == t(1)
    assert out[2]["t1"] is None and out[2]["t3"] is None
    assert out[3]["t1"] == t(3) and out[3]["t2"] == t(4) \
        and out[3]["t3"] == t(5)
    assert out[4]["t1"] is None and out[4]["t3"] is None
    assert out[5]["t1"] == t(4) and out[5]["t3"] == t(6)
    assert out[6]["t1"] == t(1) and out[6]["t2"] == t(2) \
        and out[6]["t3"] is None


def test_strict_funnel_all_strict_and_within(spark):
    from datetime import datetime

    from flink_rag_spark.operators.sequences import strict_funnel_times
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: three consecutive rows in order: all-strict matches
        (0, t(1), 1, "view"), (1, t(2), 1, "click"),
        (2, t(3), 1, "purchase"),
        # u2: purchase not adjacent to click: all-strict fails
        (3, t(1), 2, "view"), (4, t(2), 2, "click"),
        (5, t(3), 2, "error"), (6, t(4), 2, "purchase"),
        # u3: completes but only 30 min after the anchor
        (7, t(1), 3, "view"), (8, t(2), 3, "click"),
        (9, t(31), 3, "purchase"),
    ]
    e = _ev(spark, rows)
    strict = {r["user_id"]: r for r in strict_funnel_times(
        e, ["view", "click", "purchase"], ["next", "next"]).collect()}
    assert strict[1]["t3"] == t(3)
    assert strict[2]["t3"] is None
    bounded = {r["user_id"]: r for r in strict_funnel_times(
        e, ["view", "click", "purchase"], ["next", "followedBy"],
        within_seconds=600).collect()}
    assert bounded[1]["t3"] == t(3)
    assert bounded[3]["t3"] is None      # 30 min > the 10-min window
    assert bounded[3]["t2"] == t(2)      # block 1 itself was in bound


def test_strict_funnel_relaxed_equals_flat_funnel(spark):
    from datetime import datetime
    import random

    from flink_rag_spark.operators.sequences import (funnel_times,
                                                     strict_funnel_times)
    rng = random.Random(11)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = [(i, datetime(2024, 1, 1, rng.randrange(24),
                         rng.randrange(60)),
             rng.randrange(15), rng.choice(types))
            for i in range(400)]
    e = _ev(spark, rows)
    steps = ["view", "click", "purchase"]
    flat = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
            for r in funnel_times(e, steps).collect()}
    strict = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
              for r in strict_funnel_times(
                  e, steps, ["followedBy", "followedBy"]).collect()}
    assert flat == strict


def test_strict_funnel_duck_mirror_parity(spark):
    from datetime import datetime
    import random

    from flink_rag_spark.operators.sequences import (
        strict_funnel_times, strict_funnel_times_duck)
    rng = random.Random(23)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = [(i, datetime(2024, 1, 1, rng.randrange(24),
                         rng.randrange(60)),
             rng.randrange(12), rng.choice(types))
            for i in range(300)]
    e = _ev(spark, rows)
    con = duckdb.connect()
    con.register("events", e.toPandas())
    for cont, nn, wn in [(["next", "followedBy"], {2: "error"}, None),
                         (["next", "next"], None, None),
                         (["followedBy", "next"], {1: "signup"}, None),
                         (["next", "followedBy"], {2: "error"}, 3600),
                         (["followedBy", "followedBy"],
                          {1: "error", 3: "view"}, None)]:
        sp = strict_funnel_times(
            e, ["view", "click", "purchase"], cont, nn,
            within_seconds=wn).toPandas()
        du = con.execute(strict_funnel_times_duck(
            ["view", "click", "purchase"], cont, nn,
            within_seconds=wn)).fetchdf()
        sp = sp.sort_values("user_id").reset_index(drop=True)
        du = du.sort_values("user_id").reset_index(drop=True)
        assert list(sp.columns) == list(du.columns), (cont, nn)
        for c in sp.columns:
            a, b = sp[c].tolist(), du[c].tolist()
            assert [(x if x == x else None) for x in a] == \
                   [(x if x == x else None) for x in b], (cont, nn, c)


def test_strict_funnel_quoted_type_and_validation(spark):
    from datetime import datetime

    from flink_rag_spark.operators.sequences import (
        strict_funnel_times, strict_funnel_times_duck)
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [(0, t(1), 1, "it's a view"), (1, t(2), 1, "click")]
    e = _ev(spark, rows)
    out = strict_funnel_times(e, ["it's a view", "click"],
                              ["next"]).collect()
    assert out[0]["t2"] == t(2)
    sql = strict_funnel_times_duck(["it's a view", "click"], ["next"])
    con = duckdb.connect()
    con.register("events", e.toPandas())
    du = con.execute(sql).fetchdf()
    assert du["t2"][0] is not None
    with pytest.raises(ValueError):
        strict_funnel_times(e, ["view", "click"], ["bogus"])
    with pytest.raises(ValueError):
        strict_funnel_times(e, ["view", "click"], ["next"],
                            {1: "error"})  # notNext inside a strict gap
    with pytest.raises(ValueError):
        strict_funnel_times(e, ["view", "click"], ["next", "next"])


def _write_strict_batch(spark, path, rows):
    """rows: (event_id, ts_str, user_id, type) — explicit ids because
    strict adjacency is positional (ids must be globally unique)."""
    spark.createDataFrame(
        rows, "event_id bigint, ts_s string, user_id bigint, "
              "event_type string"
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
                 "user_id", "event_type"
                 ).coalesce(1).write.mode("append").parquet(path)
    import time
    time.sleep(1.1)


def test_streaming_strict_funnel_matches_batch(spark, tmp_path):
    """Streaming emissions ≡ batch strict_funnel_times completions
    (t_k non-NULL) under bounded disorder, incl. a strict gap broken by
    an out-of-order intervening event and a notNext anchor voided
    cross-batch."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.sequences import strict_funnel_times
    from flink_rag_spark.streaming.cep import strict_funnel_monitor
    src = str(tmp_path / "strictcep_src")
    steps = ["view", "click", "purchase"]
    cont = ["next", "followedBy"]
    nn = {2: "error"}
    _write_strict_batch(spark, src, [
        # u1: clean view->click adjacency, later purchase: emits
        (0, "2024-01-01 00:01:00", 1, "view"),
        (1, "2024-01-01 00:02:00", 1, "click"),
        (2, "2024-01-01 00:05:00", 1, "purchase"),
        # u2: view ... click with a signup BETWEEN them arriving in
        # batch 2 OUT OF ORDER — the strict gap must break
        (3, "2024-01-01 00:01:00", 2, "view"),
        (4, "2024-01-01 00:03:00", 2, "click"),
        (5, "2024-01-01 00:04:00", 2, "purchase"),
        # u3: first anchor's click followed by error (notNext, the
        # error arrives cross-batch), later clean anchor completes
        (6, "2024-01-01 00:01:00", 3, "view"),
        (7, "2024-01-01 00:02:00", 3, "click"),
        (8, "2024-01-01 00:10:00", 3, "view"),
        (9, "2024-01-01 00:11:00", 3, "click"),
        (10, "2024-01-01 00:20:00", 3, "purchase"),
        # u4: all-relaxed would match; strict breaks it (error between)
        (11, "2024-01-01 00:01:00", 4, "view"),
        (12, "2024-01-01 00:01:30", 4, "error"),
        (13, "2024-01-01 00:02:00", 4, "click"),
        (14, "2024-01-01 00:03:00", 4, "purchase"),
    ])
    _write_strict_batch(spark, src, [
        (15, "2024-01-01 00:02:00", 2, "signup"),   # breaks u2's gap
        (16, "2024-01-01 00:02:30", 3, "error"),    # voids u3 anchor 1
        (17, "2024-01-10 00:00:00", 99, "view"),    # watermark flush
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (strict_funnel_monitor(stream, steps, cont, nn,
                               watermark="1 hour")
         .writeStream.format("memory").queryName("strictcep_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_strict"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    got = {(r["user_id"], r["t1"], r["t2"], r["t3"])
           for r in spark.sql("select * from strictcep_t").collect()}
    batch = (strict_funnel_times(spark.read.parquet(src), steps, cont,
                                 nn)
             .filter(F.col("t3").isNotNull()).collect())
    want = {(r["user_id"], r["t1"], r["t2"], r["t3"]) for r in batch}
    assert got == want
    assert {u for u, *_ in got} == {1, 3}   # u2 broken, u4 broken


def test_streaming_strict_funnel_trailing_not_next(spark, tmp_path):
    """A trailing notNext anchor (no successor event ever arrives)
    resolves PASS once the watermark passes it — the bounded-input
    reading of batch's 'no next event passes'."""
    from flink_rag_spark.streaming.cep import strict_funnel_monitor
    src = str(tmp_path / "strictnn_src")
    # pattern: view ->next click (notNext error after click), k=2;
    # u1's click is their LAST event — must still emit after the
    # watermark passes
    _write_strict_batch(spark, src, [
        (0, "2024-01-01 00:01:00", 1, "view"),
        (1, "2024-01-01 00:02:00", 1, "click"),
    ])
    _write_strict_batch(spark, src, [
        (2, "2024-01-10 00:00:00", 99, "view"),    # watermark flush
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (strict_funnel_monitor(stream, ["view", "click"], ["next"],
                               {2: "error"}, watermark="1 hour")
         .writeStream.format("memory").queryName("strictnn_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_strictnn"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    rows = spark.sql("select * from strictnn_t").collect()
    assert [(r["user_id"],) for r in rows] == [(1,)]


def test_streaming_strict_funnel_validates(spark):
    from flink_rag_spark.streaming.cep import strict_funnel_monitor
    df = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "timestamp AS ts", "value AS event_id",
        "'view' AS event_type")
    with pytest.raises(ValueError):
        strict_funnel_monitor(df, [])
    with pytest.raises(ValueError):
        strict_funnel_monitor(df, ["a", "b"], ["bogus"])
    with pytest.raises(ValueError):
        strict_funnel_monitor(df, ["a", "b"], ["next"], {1: "x"})


def test_km_survival_hand_values(spark):
    from flink_rag_spark.operators.survival import (km_survival,
                                                    km_survival_duck)
    rows = [("a", 5, 1), ("a", 5, 0), ("a", 8, 1), ("a", 10, 1),
            ("a", 10, 1), ("a", 12, 0), ("a", 15, 0),
            ("b", 3, 1), ("b", 3, 1), ("b", 3, 1), ("b", 9, 0),
            # group c: the last at-risk subject has the event — the
            # curve must hit exactly 0.0 (the LN(0) branch)
            ("c", 1, 1), ("c", 2, 1),
            # NULL duration: excluded entirely
            ("a", None, 1)]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    out = {(r["g"], r["t"]): (r["n_risk"], r["n_events"],
                              r["n_censored"], r["survival"])
           for r in km_survival(df, "dur", "ev", ["g"]).collect()}
    assert out[("a", 5)] == (7, 1, 1, 0.857143)
    assert out[("a", 8)] == (5, 1, 0, 0.685714)
    assert out[("a", 10)] == (4, 2, 0, 0.342857)
    assert ("a", 12) not in out and ("a", 15) not in out  # censor-only
    assert out[("b", 3)] == (4, 3, 0, 0.25)
    assert out[("c", 1)] == (2, 1, 0, 0.5)
    assert out[("c", 2)] == (1, 1, 0, 0.0)      # zeroed, not ln(0)
    # duck mirror parity (incl. the zero branch)
    con = duckdb.connect()
    con.register("subs_tbl", df.toPandas())
    du = con.execute(km_survival_duck(
        "SELECT g, dur, ev FROM subs_tbl", "dur", "ev",
        ["g"])).fetchdf()
    got = {(r.g, int(r.t)): (int(r.n_risk), int(r.n_events),
                             int(r.n_censored), float(r.survival))
           for r in du.itertuples()}
    assert got == {k: v for k, v in out.items()}
    # ungrouped variant runs too
    one = km_survival(df.filter("g = 'b'"), "dur", "ev").collect()
    assert [(r["t"], r["survival"]) for r in one] == [(3, 0.25)]


def test_weighted_lpa_hand_values(spark):
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.graph import (community_labels,
                                                 community_labels_duck)
    # two triangles bridged by ONE heavy edge: unweighted LPA keeps the
    # triangles separate; a heavy enough bridge pulls node 3 toward the
    # other side's label in round 1
    edges = [(1, 2, 1), (1, 3, 1), (2, 3, 1),
             (4, 5, 1), (4, 6, 1), (5, 6, 1),
             (3, 4, 10)]
    df = spark.createDataFrame(edges, "u bigint, v bigint, w bigint")
    uw = {r["node"]: r["label"] for r in community_labels(
        df, id_a="u", id_b="v", iters=2).collect()}
    ww = {r["node"]: r["label"] for r in community_labels(
        df, id_a="u", id_b="v", iters=2, weight="w").collect()}
    assert uw != ww          # the heavy bridge changes the outcome
    # uniform weights ≡ unweighted
    w1 = {r["node"]: r["label"] for r in community_labels(
        df.withColumn("w", F.lit(1)), id_a="u", id_b="v", iters=2,
        weight="w").collect()}
    assert w1 == uw
    # duck mirror parity for the weighted rounds
    con = duckdb.connect()
    con.register("wedges", df.toPandas())
    du = con.execute(community_labels_duck(
        "SELECT u, v, w FROM wedges", iters=2,
        weighted=True)).fetchdf()
    assert {(int(r.node), int(r.label)) for r in du.itertuples()} == \
           {(n, l) for n, l in ww.items()}


def test_km_survival_null_event_excluded(spark):
    """A NULL event flag is an unknown outcome — excluded on BOTH
    sides, never counted as censored (review finding: the mirror's
    CASE treated NULL as censored, inflating every risk set)."""
    from flink_rag_spark.operators.survival import (km_survival,
                                                    km_survival_duck)
    rows = [(10, 1), (10, 0), (20, 1), (20, None)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = {r["t"]: (r["n_risk"], r["survival"])
           for r in km_survival(df, "dur", "ev").collect()}
    assert out[10] == (3, 0.666667)     # NULL-event subject excluded
    assert out[20] == (1, 0.0)
    con = duckdb.connect()
    con.register("subs_tbl", df.toPandas())
    du = {int(r.t): (int(r.n_risk), float(r.survival))
          for r in con.execute(km_survival_duck(
              "SELECT dur, ev FROM subs_tbl", "dur", "ev")).fetchdf()
          .itertuples()}
    assert du == out


def test_strict_funnel_key_universe_matches_flat(spark):
    """Keys with NO step-type event are omitted (funnel_times' key
    universe), not emitted as all-NULL rows."""
    from datetime import datetime

    from flink_rag_spark.operators.sequences import (
        funnel_times, strict_funnel_times, strict_funnel_times_duck)
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [(0, t(1), 1, "view"), (1, t(2), 1, "click"),
            # user 2 has ONLY non-step events
            (2, t(1), 2, "error"), (3, t(2), 2, "signup")]
    e = _ev(spark, rows)
    strict = strict_funnel_times(e, ["view", "click"], ["next"]).collect()
    assert {r["user_id"] for r in strict} == {1}
    flat = funnel_times(e, ["view", "click"]).collect()
    assert {r["user_id"] for r in flat} == {1}
    con = duckdb.connect()
    con.register("events", e.toPandas())
    du = con.execute(strict_funnel_times_duck(
        ["view", "click"], ["next"])).fetchdf()
    assert set(du["user_id"]) == {1}


def test_streaming_strict_boundary_equal_sibling(spark, tmp_path):
    """An equal-ts sibling delivered across the watermark boundary must
    NOT fold out of (ts, seq) order and fabricate an adjacency (review
    finding: the relaxed funnel's <= finalize rule is unsafe for
    positional adjacency — strict holds events AT the watermark)."""
    from flink_rag_spark.streaming.cep import strict_funnel_monitor
    src = str(tmp_path / "strictbd_src")
    # batch 1: view@T with seq 5; a sentinel exactly one watermark
    # delay later pins the watermark to T itself
    _write_strict_batch(spark, src, [
        (5, "2024-01-01 00:05:00", 1, "view"),
        (6, "2024-01-01 01:05:00", 98, "signup"),
    ])
    # batch 2: click@T with seq 4 — in (ts, seq) order it PRECEDES the
    # view, so view->next->click must NOT match; then flush far ahead
    _write_strict_batch(spark, src, [
        (4, "2024-01-01 00:05:00", 1, "click"),
        (7, "2024-01-10 00:00:00", 99, "signup"),
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (strict_funnel_monitor(stream, ["view", "click"], ["next"],
                               watermark="1 hour")
         .writeStream.format("memory").queryName("strictbd_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_bd"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    rows = spark.sql("select * from strictbd_t").collect()
    assert rows == []     # no fabricated adjacency


def test_ses_forecast_matches_recurrence(spark):
    from flink_rag_spark.operators.timeseries import (ses_forecast,
                                                      ses_forecast_duck)
    from datetime import datetime
    import random
    rng = random.Random(41)
    rows, refs = [], {}
    for k in range(6):
        xs = [round(rng.uniform(5, 20), 3)
              for _ in range(rng.randrange(1, 40))]
        s = xs[0]
        for x in xs[1:]:
            s = 0.3 * x + 0.7 * s
        refs[k] = s
        rows += [(i + 1000 * k, datetime(2024, 1, 1, 0, 0, i), k, x)
                 for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, k bigint, value double")
    out = {r["k"]: (r["forecast"], r["n_obs"]) for r in
           ses_forecast(df, ["k"], "ts", "value", "event_id",
                        value_scale=3).collect()}
    for k, s in refs.items():
        # closed form ≡ recurrence up to the 12dp weight quantization
        assert abs(out[k][0] - s) < 1e-6, (k, out[k][0], s)
    # constant series: forecast is the constant exactly (weights sum 1)
    const = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, 0, i), 1, 7.5) for i in range(10)],
        "event_id bigint, ts timestamp, k bigint, value double")
    [row] = ses_forecast(const, ["k"], "ts", "value",
                         "event_id").collect()
    assert abs(row["forecast"] - 7.5) < 1e-6
    # duck parity
    con = duckdb.connect()
    con.register("obs_tbl", df.toPandas())
    du = {int(r.k): (float(r.forecast), int(r.n_obs))
          for r in con.execute(ses_forecast_duck(
              "SELECT * FROM obs_tbl", ["k"], "ts", "value",
              "event_id", value_scale=3)).fetchdf().itertuples()}
    assert du == out
    with pytest.raises(ValueError):
        ses_forecast(df, ["k"], "ts", "value", "event_id", alpha=0.0)
    with pytest.raises(ValueError):
        ses_forecast(df, ["k"], "ts", "value", "event_id", alpha=1.5)


def test_seasonal_baseline_outliers_hand(spark):
    from datetime import datetime

    from flink_rag_spark.operators.anomaly import (
        seasonal_baseline_outliers, seasonal_baseline_outliers_duck)
    rows = []
    eid = 0
    # hour 3: tight cluster at 10.00 ± 0.02 with one wild 50.00 spike
    # (n must exceed ~z²: a single in-moment outlier's z is capped at
    # (n-1)/sqrt(n) — self-masking); hour 12: wide spread so the SAME
    # 50.00 is NOT flagged there
    for d in range(1, 21):
        rows.append((eid, datetime(2024, 1, d, 3, 0), 1, 10.00
                     + (0.02 if d % 2 else -0.02))); eid += 1
        rows.append((eid, datetime(2024, 1, d, 12, 0), 1,
                     float(10 * d))); eid += 1
    rows.append((eid, datetime(2024, 1, 21, 3, 0), 1, 50.00)); eid += 1
    rows.append((eid, datetime(2024, 1, 21, 12, 0), 1, 50.00)); eid += 1
    # hour 7: a single row (n=1) — never flagged
    rows.append((eid, datetime(2024, 1, 1, 7, 0), 1, 999.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "value double")
    out = seasonal_baseline_outliers(df, "ts", "value",
                                     phase="hour").collect()
    flagged = {(r["event_id"], r["phase"]) for r in out}
    assert (40, 3) in flagged           # the 3am spike
    assert all(ph != 12 for _, ph in flagged)   # wide noon: not flagged
    assert all(ph != 7 for _, ph in flagged)    # n=1 phase: never
    # duck mirror parity (full row set)
    con = duckdb.connect()
    con.register("ev_tbl", df.toPandas())
    du = con.execute(seasonal_baseline_outliers_duck(
        "SELECT * FROM ev_tbl", "ts", "value", phase="hour")).fetchdf()
    sp = {(r["event_id"], r["z"]) for r in out}
    assert {(int(r.event_id), float(r.z)) for r in du.itertuples()} == sp
    import pytest as _pt
    with _pt.raises(ValueError):
        seasonal_baseline_outliers(df, "ts", "value", phase="month")


def test_until_funnel_hand_values(spark):
    from datetime import datetime

    from flink_rag_spark.operators.sequences import until_funnel_times
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    steps = ["view", ("click", 3), "purchase"]
    rows = [
        # u1: clean 3-click loop, purchase: matches
        (0, t(1), 1, "view"), (1, t(2), 1, "click"), (2, t(3), 1, "click"),
        (3, t(4), 1, "click"), (4, t(5), 1, "purchase"),
        # u2: error between clicks 2 and 3 — the loop is voided
        (5, t(1), 2, "view"), (6, t(2), 2, "click"), (7, t(3), 2, "click"),
        (8, t(4), 2, "error"), (9, t(5), 2, "click"),
        (10, t(6), 2, "purchase"),
        # u3: error BEFORE the loop's first click — until not yet
        # active, matches
        (11, t(1), 3, "view"), (12, t(2), 3, "error"),
        (13, t(3), 3, "click"), (14, t(4), 3, "click"),
        (15, t(5), 3, "click"), (16, t(6), 3, "purchase"),
        # u4: error AFTER the loop completed (between loop and
        # purchase — NOT an until gap): matches
        (17, t(1), 4, "view"), (18, t(2), 4, "click"),
        (19, t(3), 4, "click"), (20, t(4), 4, "click"),
        (21, t(5), 4, "error"), (22, t(6), 4, "purchase"),
    ]
    e = _ev(spark, rows)
    out = {r["user_id"]: r for r in until_funnel_times(
        e, steps, {2: "error"}).collect()}
    assert out[1]["t3"] == t(5) and out[1]["c2"] is None
    assert out[2]["t3"] is None and out[2]["c2"] == t(4)
    assert out[3]["t3"] == t(6)         # pre-loop error is irrelevant
    assert out[4]["t3"] == t(6)         # post-loop error is irrelevant
    with pytest.raises(ValueError):
        until_funnel_times(e, ["view", "click"], {2: "error"})  # no loop
    with pytest.raises(ValueError):
        until_funnel_times(e, steps, {})


def test_until_funnel_duck_mirror_parity(spark):
    from datetime import datetime
    import random

    from flink_rag_spark.operators.sequences import (
        until_funnel_times, until_funnel_times_duck)
    rng = random.Random(47)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = [(i, datetime(2024, 1, 1, rng.randrange(24),
                         rng.randrange(60)),
             rng.randrange(12), rng.choice(types))
            for i in range(400)]
    e = _ev(spark, rows)
    steps = ["view", ("click", 3), "purchase"]
    sp = until_funnel_times(e, steps, {2: "error"}).toPandas()
    con = duckdb.connect()
    con.register("events", e.toPandas())
    du = con.execute(until_funnel_times_duck(
        steps, {2: "error"})).fetchdf()
    sp = sp.sort_values("user_id").reset_index(drop=True)
    du = du.sort_values("user_id").reset_index(drop=True)
    assert list(sp.columns) == list(du.columns)
    for c in sp.columns:
        a, b = sp[c].tolist(), du[c].tolist()
        assert [(x if x == x else None) for x in a] == \
               [(x if x == x else None) for x in b], c


def test_streaming_until_funnel_matches_batch(spark, tmp_path):
    """Streaming until emissions ≡ batch until_funnel_times completions
    (t_k non-NULL) — the composition's streaming twin, incl. a
    mid-loop stop arriving cross-batch out of order."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.sequences import until_funnel_times
    from flink_rag_spark.streaming.cep import until_funnel_monitor
    src = str(tmp_path / "untilcep_src")
    steps = ["view", ("click", 3), "purchase"]
    stops = {2: "error"}
    _write_strict_batch(spark, src, [
        # u1: clean 3-click loop + purchase
        (0, "2024-01-01 00:01:00", 1, "view"),
        (1, "2024-01-01 00:02:00", 1, "click"),
        (2, "2024-01-01 00:03:00", 1, "click"),
        (3, "2024-01-01 00:04:00", 1, "click"),
        (4, "2024-01-01 00:05:00", 1, "purchase"),
        # u2: loop voided by an error that arrives IN BATCH 2, out of
        # order, landing between clicks 2 and 3
        (5, "2024-01-01 00:01:00", 2, "view"),
        (6, "2024-01-01 00:02:00", 2, "click"),
        (7, "2024-01-01 00:03:00", 2, "click"),
        (8, "2024-01-01 00:20:00", 2, "click"),
        (9, "2024-01-01 00:21:00", 2, "purchase"),
        # u3: error after the loop completes — irrelevant, matches
        (10, "2024-01-01 00:01:00", 3, "view"),
        (11, "2024-01-01 00:02:00", 3, "click"),
        (12, "2024-01-01 00:03:00", 3, "click"),
        (13, "2024-01-01 00:04:00", 3, "click"),
        (14, "2024-01-01 00:05:00", 3, "error"),
        (15, "2024-01-01 00:06:00", 3, "purchase"),
    ])
    _write_strict_batch(spark, src, [
        (16, "2024-01-01 00:10:00", 2, "error"),   # the voiding instant
        (17, "2024-01-10 00:00:00", 99, "view"),   # watermark flush
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (until_funnel_monitor(stream, steps, stops, watermark="1 hour")
         .writeStream.format("memory").queryName("untilcep_t")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_until"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    got = {(r["user_id"], r["t1"], r["t2"], r["t3"])
           for r in spark.sql("select * from untilcep_t").collect()}
    batch = (until_funnel_times(spark.read.parquet(src), steps, stops)
             .filter(F.col("t3").isNotNull()).collect())
    want = {(r["user_id"], r["t1"], r["t2"], r["t3"]) for r in batch}
    assert got == want
    assert {u for u, *_ in got} == {1, 3}   # u2's loop voided
    from flink_rag_spark.streaming.cep import until_funnel_monitor as m
    with pytest.raises(ValueError):
        m(stream, steps, {})


def test_strict_funnel_column_predicate_steps(spark):
    """Column-predicate steps work through the strict machinery (the
    general MATCH_RECOGNIZE shape): the adjacency and notNext flags are
    materialized per row, so any boolean predicate composes."""
    from datetime import datetime
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.sequences import strict_funnel_times
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [(0, t(1), 1, "view", 5.0), (1, t(2), 1, "click", 50.0),
            (2, t(3), 1, "purchase", 5.0),
            # u2: the click is too cheap for the predicate step
            (3, t(1), 2, "view", 5.0), (4, t(2), 2, "click", 1.0),
            (5, t(3), 2, "purchase", 5.0)]
    e = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    steps = ["view",
             (F.col("event_type") == "click") & (F.col("value") > 10)]
    out = {r["user_id"]: r for r in strict_funnel_times(
        e, steps, ["next"]).collect()}
    assert out[1]["t2"] == t(2)
    assert 2 not in out or out[2]["t2"] is None
