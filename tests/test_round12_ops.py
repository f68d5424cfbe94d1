"""Round-12 operator tests: ADVICE hardening (weight validation,
weighted-LPA parallel-edge semantics, sql_str_lit non-finite floats)
plus the round's new operator families."""

import duckdb
import pytest


# ------------------------------------------------------ ADVICE fixes


def test_weight_validation_rejects_bad_weights(spark):
    """Non-positive or NULL weights would silently corrupt every rank
    (out_deg = 0 is non-NULL, so pr·w/out_deg → Infinity) — the guard
    fails loudly up front instead."""
    from flink_rag_spark.operators.graph import (
        community_labels, pagerank, personalized_pagerank,
        weighted_shortest_paths)
    zero = spark.createDataFrame([(1, 2, 3), (2, 3, 0)],
                                 "src bigint, dst bigint, w bigint")
    neg = spark.createDataFrame([(1, 2, 3), (2, 3, -1)],
                                "src bigint, dst bigint, w bigint")
    nul = spark.createDataFrame([(1, 2, 3), (2, 3, None)],
                                "src bigint, dst bigint, w bigint")
    for bad in (zero, neg, nul):
        with pytest.raises(ValueError):
            pagerank(bad, iters=1, weight="w")
        with pytest.raises(ValueError):
            personalized_pagerank(bad, [1], iters=1, weight="w")
        with pytest.raises(ValueError):
            community_labels(bad, id_a="src", id_b="dst", iters=1,
                             weight="w")
    # min-plus tolerates zero-weight edges but not negative ones
    z = zero.toDF("u", "v", "w")
    out = {r["node"]: r["dist"]
           for r in weighted_shortest_paths(z, [1], 2).collect()}
    assert out[3] == 3.0        # through the zero-weight edge
    with pytest.raises(ValueError):
        weighted_shortest_paths(neg.toDF("u", "v", "w"), [1], 2)
    with pytest.raises(ValueError):
        weighted_shortest_paths(nul.toDF("u", "v", "w"), [1], 2)


def test_weighted_lpa_parallel_edges_combine(spark):
    """Parallel (and reversed-duplicate) weighted edges pre-aggregate
    to ONE undirected edge with the summed weight — a duplicate with a
    differing weight must not double-vote or vote asymmetrically."""
    from flink_rag_spark.operators.graph import (community_labels,
                                                 community_labels_duck)
    # same graph expressed with parallel + reversed-duplicate edges …
    dup = spark.createDataFrame(
        [(1, 2, 3), (1, 2, 5), (2, 1, 2), (2, 3, 4)],
        "u bigint, v bigint, w bigint")
    # … and pre-aggregated (1-2 strength 10, 2-3 strength 4)
    flat = spark.createDataFrame([(1, 2, 10), (2, 3, 4)],
                                 "u bigint, v bigint, w bigint")
    got_dup = {r["node"]: r["label"] for r in community_labels(
        dup, id_a="u", id_b="v", iters=2, weight="w").collect()}
    got_flat = {r["node"]: r["label"] for r in community_labels(
        flat, id_a="u", id_b="v", iters=2, weight="w").collect()}
    assert got_dup == got_flat
    # the duck mirror replays the SAME pre-aggregation
    con = duckdb.connect()
    con.register("dupe", dup.toPandas())
    du = con.execute(community_labels_duck(
        "SELECT u, v, w FROM dupe", iters=2, weighted=True)).fetchdf()
    assert {(int(r.node), int(r.label))
            for r in du.itertuples()} == set(got_dup.items())


def test_sql_str_lit_rejects_non_finite():
    from flink_rag_spark.operators.util import sql_str_lit
    assert sql_str_lit(1.5) == "1.5"
    assert sql_str_lit(True) == "TRUE"
    assert sql_str_lit("o'hara") == "'o''hara'"
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError):
            sql_str_lit(bad)


# ------------------------------------- all-matches CEP (noSkip /
# ------------------------------------- skipPastLastEvent)


def _ev(spark, rows):
    """(event_id, ts_str, user_id, event_type) → events frame."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string")
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_all_funnel_matches_hand_values(spark):
    from flink_rag_spark.operators.sequences import (all_funnel_matches,
                                                     funnel_times)
    rows = [(1, "2024-01-01 00:00:01", 1, "A"),
            (2, "2024-01-01 00:00:02", 1, "A"),
            (3, "2024-01-01 00:00:03", 1, "B"),
            (4, "2024-01-01 00:00:04", 1, "B"),
            (5, "2024-01-01 00:00:05", 1, "C"),
            (6, "2024-01-01 00:00:06", 1, "A")]   # anchor, never done
    e = _ev(spark, rows)
    out = sorted((str(r["t1"]), str(r["t2"]), str(r["t3"])) for r in
                 all_funnel_matches(e, ["A", "B", "C"]).collect())
    # BOTH anchors emit; each continues greedily (first B after the
    # anchor, first C after that B); the trailing A emits nothing
    assert out == [
        ("2024-01-01 00:00:01", "2024-01-01 00:00:03",
         "2024-01-01 00:00:05"),
        ("2024-01-01 00:00:02", "2024-01-01 00:00:03",
         "2024-01-01 00:00:05")]
    # min over anchors == funnel_times' single completion
    ft = funnel_times(e, ["A", "B", "C"]).collect()[0]
    assert (str(ft["t1"]), str(ft["t2"]), str(ft["t3"])) == out[0]
    # within: the greedy chain is t_k-minimal, so the filter is exact
    within = all_funnel_matches(e, ["A", "B", "C"], within_seconds=3)
    got = [str(r["t1"]) for r in within.collect()]
    assert got == ["2024-01-01 00:00:02"]     # 5s-1s > 3s, 5s-2s = 3s
    # k = 1: every step-1 event is a match
    assert all_funnel_matches(e, ["A"]).count() == 3
    with pytest.raises(ValueError):
        all_funnel_matches(e, [])


def test_all_funnel_matches_equal_instants(spark):
    """Two anchors at the same microsecond both emit (per-EVENT match
    identity); equal-instant step events never chain to themselves
    (strict value order)."""
    from flink_rag_spark.operators.sequences import all_funnel_matches
    rows = [(1, "2024-01-01 00:00:01", 1, "A"),
            (2, "2024-01-01 00:00:01", 1, "A"),
            (3, "2024-01-01 00:00:01", 1, "B"),   # NOT after the As
            (4, "2024-01-01 00:00:02", 1, "B"),
            (5, "2024-01-01 00:00:03", 1, "C")]
    out = all_funnel_matches(_ev(spark, rows), ["A", "B", "C"]).collect()
    assert len(out) == 2
    assert {str(r["t2"]) for r in out} == {"2024-01-01 00:00:02"}


def test_consumed_funnel_matches_hand_values(spark):
    from flink_rag_spark.operators.sequences import (
        consumed_funnel_matches)
    rows = [(1, "2024-01-01 00:00:01", 1, "A"),
            (2, "2024-01-01 00:00:02", 1, "A"),
            (3, "2024-01-01 00:00:03", 1, "B"),
            (4, "2024-01-01 00:00:04", 1, "C"),
            (5, "2024-01-01 00:00:05", 1, "A"),
            (6, "2024-01-01 00:00:06", 1, "B"),
            (7, "2024-01-01 00:00:07", 1, "C"),
            # second user: one match only
            (8, "2024-01-01 00:00:01", 2, "A"),
            (9, "2024-01-01 00:00:02", 2, "B"),
            (10, "2024-01-01 00:00:03", 2, "C")]
    e = _ev(spark, rows)
    out = {(r["user_id"], r["match_idx"]):
           (str(r["t1"]), str(r["t2"]), str(r["t3"]))
           for r in consumed_funnel_matches(e, ["A", "B", "C"],
                                            max_matches=4).collect()}
    # user 1: match 1 from the EARLIEST anchor (00:01); the 00:02
    # anchor overlaps it (t1 < consumed 00:04) and is skipped; match 2
    # starts at 00:05
    assert out == {
        (1, 1): ("2024-01-01 00:00:01", "2024-01-01 00:00:03",
                 "2024-01-01 00:00:04"),
        (1, 2): ("2024-01-01 00:00:05", "2024-01-01 00:00:06",
                 "2024-01-01 00:00:07"),
        (2, 1): ("2024-01-01 00:00:01", "2024-01-01 00:00:02",
                 "2024-01-01 00:00:03")}
    # max_matches truncates
    one = consumed_funnel_matches(e, ["A", "B", "C"], max_matches=1)
    assert {r["user_id"] for r in one.collect()} == {1, 2}
    assert one.count() == 2
    with pytest.raises(ValueError):
        consumed_funnel_matches(e, ["A", "B", "C"], max_matches=0)


# ------------------------------------------------- log-rank test


def test_logrank_hand_values(spark):
    """Hand-computed Mantel 1966 table: O_A = 2, E_A = 1.5, V = 0.65
    (the t=20 risk set has n=1 — its variance term is 0 by the guard),
    z = 0.5/sqrt(0.65)."""
    from flink_rag_spark.operators.hypothesis import logrank_test
    rows = [("a", 5, 1), ("a", 10, 1), ("a", 15, 0),
            ("b", 5, 1), ("b", 12, 0), ("b", 20, 1),
            ("a", None, 1), ("a", 7, None)]       # excluded
    df = spark.createDataFrame(rows, "grp string, dur int, ev int")
    [r] = logrank_test(df, "dur", "ev", "grp", "a", "b").collect()
    assert (r["n_a"], r["n_b"], r["o_a"]) == (3, 3, 2)
    assert r["e_a"] == 1.5 and r["v"] == 0.65
    assert abs(r["z"] - 0.5 / 0.65 ** 0.5) < 1e-6
    assert abs(r["chi2"] - r["z"] ** 2) < 1e-5
    assert r["significant"] is False
    # a permissive critical value flips the verdict on the same z
    [r2] = logrank_test(df, "dur", "ev", "grp", "a", "b",
                        z_crit=0.1).collect()
    assert r2["significant"] is True
    # identical curves: z = 0 exactly
    same = spark.createDataFrame(
        [("a", 5, 1), ("a", 9, 1), ("b", 5, 1), ("b", 9, 1)],
        "grp string, dur int, ev int")
    [r3] = logrank_test(same, "dur", "ev", "grp", "a", "b").collect()
    assert r3["z"] == 0.0 and r3["significant"] is False
    # no comparable events → NULL z, False verdict
    empty = spark.createDataFrame([("a", 5, 0), ("b", 6, 0)],
                                  "grp string, dur int, ev int")
    [r4] = logrank_test(empty, "dur", "ev", "grp", "a", "b").collect()
    assert r4["z"] is None and r4["significant"] is False


def test_logrank_fuzz_mirror_parity(spark):
    from flink_rag_spark.operators.hypothesis import (logrank_test,
                                                      logrank_test_duck)
    from tests.oracle_check import canon
    import random
    rng = random.Random(5)
    rows = [(rng.choice(["x", "y"]), rng.randrange(1, 40),
             rng.randrange(2)) for _ in range(300)]
    df = spark.createDataFrame(rows, "grp string, dur int, ev int")
    sp = logrank_test(df, "dur", "ev", "grp", "x", "y").toPandas()
    con = duckdb.connect()
    con.register("subj", df.toPandas())
    du = con.execute(logrank_test_duck(
        "SELECT grp, dur, ev FROM subj", "dur", "ev", "grp",
        "x", "y")).fetchdf()
    assert canon(sp) == canon(du)


# ------------------------------------------------- Holt forecasting


def test_holt_forecast_hand_values(spark):
    """α = β = 0.5 over a perfectly linear series tracks the trend
    exactly (hand-unrolled recurrence: l = x_n, b = slope), and the
    closed-form weight table reproduces the recurrence on an
    arbitrary series."""
    from flink_rag_spark.operators.timeseries import holt_forecast
    rows = [(i, f"2024-01-01 00:00:{i:02d}", 1, float(i))
            for i in range(1, 4)]                 # x = 1, 2, 3
    rows += [(10 + i, f"2024-01-01 00:00:{i:02d}", 2, v)
             for i, v in enumerate([4.0, 1.0, 7.0, 2.0], start=1)]
    rows += [(20, "2024-01-01 00:00:01", 3, 9.0)]  # singleton: omitted
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, value double")
    import pyspark.sql.functions as F
    df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["user_id"]: r for r in holt_forecast(
        df, ["user_id"], "ts", "value", "event_id",
        alpha=0.5, beta=0.5).collect()}
    assert set(out) == {1, 2}                     # singleton dropped
    assert out[1]["level"] == 3.0 and out[1]["trend"] == 1.0
    assert out[1]["forecast"] == 4.0
    # recurrence replay for user 2 (x = 4, 1, 7, 2), α = β = 0.5:
    # l1=4 b1=-3; l2=1 b2=-3; l3=.5*7+.5*(1-3)=2.5 b3=.5*1.5+.5*(-3)
    # =-0.75; l4=.5*2+.5*1.75=1.875 b4=.5*(-.625)+.5*(-.75)=-0.6875
    assert abs(out[2]["level"] - 1.875) < 1e-9
    assert abs(out[2]["trend"] - (-0.6875)) < 1e-9
    assert abs(out[2]["forecast"] - 1.1875) < 1e-9
    # horizon scales the trend term
    h3 = {r["user_id"]: r["forecast"] for r in holt_forecast(
        df, ["user_id"], "ts", "value", "event_id",
        alpha=0.5, beta=0.5, horizon=3).collect()}
    assert h3[1] == 6.0
    import pytest as _pt
    for kw in ({"alpha": 0.0}, {"beta": 1.5}, {"horizon": 0}):
        with _pt.raises(ValueError):
            holt_forecast(df, ["user_id"], "ts", "value", "event_id",
                          **kw)


def test_holt_forecast_matches_float_recurrence_and_mirror(spark):
    """The quantized closed form stays within quantization error of the
    float recurrence on fuzzed series, and replays bit-identically in
    DuckDB (default α, β — complex eigenvalues, oscillating weights)."""
    import random

    from flink_rag_spark.operators.timeseries import (holt_forecast,
                                                      holt_forecast_duck)
    from tests.oracle_check import canon
    rng = random.Random(42)
    rows, eid = [], 0
    series = {}
    for u in range(12):
        n = rng.randrange(2, 60)
        xs = [round(rng.uniform(-50, 150), 2) for _ in range(n)]
        series[u] = xs
        for i, x in enumerate(xs):
            eid += 1
            rows.append((eid, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00",
                         u, x))
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["user_id"]: r for r in holt_forecast(
        df, ["user_id"], "ts", "value", "event_id").collect()}
    a, b = 0.3, 0.1
    for u, xs in series.items():
        le, tr = xs[1], xs[1] - xs[0]
        for x in xs[2:]:
            nl = a * x + (1 - a) * (le + tr)
            tr = b * (nl - le) + (1 - b) * tr
            le = nl
        tol = 5e-7 * max(1.0, len(xs))   # 12-dp weights × |x| ≤ 150
        assert abs(out[u]["level"] - le) < tol, u
        assert abs(out[u]["trend"] - tr) < tol, u
    con = duckdb.connect()
    con.register("events", df.toPandas())
    du = con.execute(holt_forecast_duck(
        "SELECT user_id, ts, event_id, value FROM events",
        ["user_id"], "ts", "value", "event_id")).fetchdf()
    sp = holt_forecast(df, ["user_id"], "ts", "value",
                       "event_id").toPandas()
    assert canon(sp) == canon(du)


def test_consecutive_funnel_hand_values(spark):
    from flink_rag_spark.operators.sequences import (
        consecutive_funnel_times, quantified_funnel_times)
    rows = [  # user 1: clean back-to-back clicks
        (1, "2024-01-01 00:00:01", 1, "A"),
        (2, "2024-01-01 00:00:02", 1, "B"),
        (3, "2024-01-01 00:00:03", 1, "B"),
        (4, "2024-01-01 00:00:04", 1, "C"),
        # user 2: an interloper breaks the first run; the second
        # run (B@4, B@5) completes the loop
        (5, "2024-01-01 00:00:01", 2, "A"),
        (6, "2024-01-01 00:00:02", 2, "B"),
        (7, "2024-01-01 00:00:03", 2, "Z"),
        (8, "2024-01-01 00:00:04", 2, "B"),
        (9, "2024-01-01 00:00:05", 2, "B"),
        (10, "2024-01-01 00:00:06", 2, "C"),
        # user 3: no contiguous run at all
        (11, "2024-01-01 00:00:01", 3, "A"),
        (12, "2024-01-01 00:00:02", 3, "B"),
        (13, "2024-01-01 00:00:03", 3, "Z"),
        (14, "2024-01-01 00:00:04", 3, "B"),
        (15, "2024-01-01 00:00:05", 3, "C")]
    e = _ev(spark, rows)
    out = {r["user_id"]: (str(r["t1"]), str(r["t2"]), str(r["t3"]))
           for r in consecutive_funnel_times(
               e, ["A", ("B", 2), "C"], {2}).collect()}
    assert out[1] == ("2024-01-01 00:00:01", "2024-01-01 00:00:03",
                      "2024-01-01 00:00:04")
    assert out[2] == ("2024-01-01 00:00:01", "2024-01-01 00:00:05",
                      "2024-01-01 00:00:06")
    assert out[3][0] == "2024-01-01 00:00:01"
    assert out[3][1] == "None" and out[3][2] == "None"
    # empty consecutive set degenerates to the relaxed quantified form
    a = consecutive_funnel_times(e, ["A", ("B", 2), "C"], set())
    b = quantified_funnel_times(e, ["A", ("B", 2), "C"])
    assert sorted(map(tuple, a.collect())) == \
           sorted(map(tuple, b.collect()))
    # vacuous consecutive targets are refused (the `until` discipline)
    for bad_steps, cons in ((["A", "B", "C"], {2}),
                            (["A", ("B", 1), "C"], {2})):
        with pytest.raises(ValueError):
            consecutive_funnel_times(e, bad_steps, cons)
    with pytest.raises(ValueError):
        consecutive_funnel_times(e, ["A", ("B", 2)], {5})


def test_consecutive_funnel_fuzz_mirror_parity(spark):
    """Engine parity over 30 fuzzed event streams (the strict family's
    discipline) for the composed consecutive() desugaring."""
    import random

    from flink_rag_spark.operators.sequences import (
        consecutive_funnel_times, consecutive_funnel_times_duck)
    from tests.oracle_check import canon
    rng = random.Random(7)
    rows, eid = [], 0
    for _ in range(30):
        user = rng.randrange(40)
        for _ in range(rng.randrange(1, 16)):
            eid += 1
            rows.append((eid,
                         f"2024-01-01 00:00:{rng.randrange(55):02d}",
                         user, rng.choice(["A", "B", "B", "C", "Z"])))
    e = _ev(spark, rows)
    con = duckdb.connect()
    con.register("events", e.toPandas())
    for steps, cons, within in ((["A", ("B", 2), "C"], {2}, None),
                                (["A", ("B", 3), "C"], {2}, None),
                                ((["A", ("B", 2), "C"], {2}, 30))):
        sp = consecutive_funnel_times(e, steps, cons,
                                      within_seconds=within).toPandas()
        du = con.execute(consecutive_funnel_times_duck(
            steps, cons, within_seconds=within)).fetchdf()
        assert canon(sp) == canon(du), (steps, cons, within)


def test_all_matches_fuzz_mirror_parity(spark, sf_oracle):
    """Both operators replay bit-identically in DuckDB over fuzzed
    event streams (30 random graphs — the strict-CEP discipline) and
    over the real events table."""
    import random

    import pandas as pd

    from flink_rag_spark.operators.sequences import (
        all_funnel_matches, all_funnel_matches_duck,
        consumed_funnel_matches, consumed_funnel_matches_duck)
    from tests.oracle_check import canon
    rng = random.Random(12)
    rows, eid = [], 0
    for _ in range(30):
        user = rng.randrange(40)
        for _ in range(rng.randrange(1, 14)):
            eid += 1
            rows.append((eid,
                         f"2024-01-01 00:00:{rng.randrange(50):02d}",
                         user, rng.choice(["A", "B", "C", "Z"])))
    e = _ev(spark, rows)
    pdf = e.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    for within in (None, 20):
        sp = all_funnel_matches(e, ["A", "B", "C"],
                                within_seconds=within).toPandas()
        du = con.execute(all_funnel_matches_duck(
            ["A", "B", "C"], within_seconds=within)).fetchdf()
        assert canon(sp) == canon(du), f"all-matches within={within}"
    sp = consumed_funnel_matches(e, ["A", "B", "C"], 3).toPandas()
    du = con.execute(
        consumed_funnel_matches_duck(["A", "B", "C"], 3)).fetchdf()
    assert canon(sp) == canon(du)
    # every consumed match IS an all-matches row, and consecutive
    # matches never overlap
    am = {tuple(r) for r in all_funnel_matches(
        e, ["A", "B", "C"]).collect()}
    byu = {}
    for r in sorted(sp.itertuples(index=False),
                    key=lambda r: (r.user_id, r.match_idx)):
        assert (r.user_id, pd.Timestamp(r.t1), pd.Timestamp(r.t2),
                pd.Timestamp(r.t3)) in {
            (u, pd.Timestamp(a), pd.Timestamp(b), pd.Timestamp(c))
            for u, a, b, c in am}
        if r.user_id in byu:
            assert pd.Timestamp(r.t1) > byu[r.user_id]
        byu[r.user_id] = pd.Timestamp(r.t3)


# ------------------------------------------------------ NSW graph ANN


@pytest.fixture(scope="module")
def nsw_index(spark, sf_smoke, tmp_path_factory):
    """One persisted NSW index over the smoke embeddings, shared by the
    graph-ANN tests (build is the expensive half)."""
    from flink_rag_spark.operators.nsw import build_nsw_index
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("nsw_idx"))
    meta = build_nsw_index(spark, emb, path)
    return path, meta, emb


def test_nsw_recall_and_fill(spark, nsw_index):
    """Beam search must meet the contract floor (and in practice lands
    near exact recall on this corpus) and always fill to k."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.nsw import nsw_topk
    from flink_rag_spark.operators.similarity import cosine_topk
    path, _, emb = nsw_index
    for qid in (7, 100, 333):
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        approx = [r["vec_id"] for r in nsw_topk(spark, path, qv, k=10)
                  .collect()]
        exact = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
        assert len(approx) == 10
        assert len(set(approx) & exact) / 10.0 >= 0.5
        # the result frame carries the exact tier's schema and ordering
        rows = nsw_topk(spark, path, qv, k=10).collect()
        assert [r["rank"] for r in rows] == list(range(1, 11))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_nsw_deterministic_rebuild(spark, nsw_index, tmp_path):
    """Seeded centroids + deterministic tie-breaks: a second build of the
    same corpus probes identically."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.nsw import build_nsw_index, nsw_topk
    path, meta, emb = nsw_index
    path2 = str(tmp_path / "nsw2")
    meta2 = build_nsw_index(spark, emb, path2)
    assert meta2["entry_ids"] == meta["entry_ids"]
    qv = list(emb.filter(F.col("vec_id") == 42).first()["embedding"])
    a = [(r["vec_id"], r["score"]) for r in
         nsw_topk(spark, path, qv, k=10).collect()]
    b = [(r["vec_id"], r["score"]) for r in
         nsw_topk(spark, path2, qv, k=10).collect()]
    assert a == b


def test_nsw_graph_shape(spark, nsw_index):
    """Degree cap (≤ 2M out-edges per node), no self-loops, and every
    edge endpoint is a real vector id."""
    import pyspark.sql.functions as F
    path, meta, emb = nsw_index
    edges = spark.read.parquet(f"{path}/edges")
    m = meta["m_neighbors"]
    deg = edges.groupBy("src_id").count()
    assert deg.agg(F.max("count")).first()[0] <= 2 * m
    assert edges.filter(F.col("src_id") == F.col("dst_id")).count() == 0
    ids = emb.select(F.col("vec_id").alias("dst_id"))
    assert edges.join(ids, "dst_id", "left_anti").count() == 0


def test_nsw_hop_scans_prune(spark, nsw_index):
    """The per-hop edge fetch and vector fetch must reach
    PartitionFilters — bounded I/O per hop is the tier's scale story."""
    import io
    from contextlib import redirect_stdout

    import pyspark.sql.functions as F
    path, meta, _ = nsw_index
    nb = meta["n_buckets"]
    edges = spark.read.parquet(f"{path}/edges")
    frontier = meta["entry_ids"][:4]
    bks = sorted({i % nb for i in frontier})
    plan_df = edges.filter(F.col("src_bucket").isin(bks)
                           & F.col("src_id").isin(frontier))
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "src_bucket" in plan.split("PartitionFilters")[1][:300]


def test_nsw_bounded_hops_and_validation(spark, nsw_index):
    """max_hops bounds the walk (0 hops = entry points only) and bad
    arguments fail loudly."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.nsw import build_nsw_index, nsw_topk
    path, meta, emb = nsw_index
    qv = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    zero = [r["vec_id"] for r in
            nsw_topk(spark, path, qv, k=10, max_hops=0).collect()]
    assert set(zero) <= set(meta["entry_ids"])
    with pytest.raises(ValueError):
        nsw_topk(spark, path, qv, k=0)
    with pytest.raises(ValueError):
        build_nsw_index(spark, emb, "/tmp/never", m_neighbors=0)
    with pytest.raises(ValueError):
        build_nsw_index(spark, emb, "/tmp/never", n_probe=0)
