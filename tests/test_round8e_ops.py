"""Round-8e operator contracts: per-group OLS, SCD Type-2 history,
two-sample KS, exponential time decay, categorical association.

`test_oracle_parity.py` value-hashes the catalog entries against DuckDB;
these tests pin the DEFINITIONS on hand-built inputs where the expected
values are computable by hand, so an implementation-and-oracle that
drifted together would still fail.
"""

from datetime import datetime

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------- OLS

def _pts(spark, rows):
    return spark.createDataFrame(rows, "g string, x bigint, y double")


def test_group_ols_exact_line(spark):
    from flink_rag_spark.operators.regression import group_ols
    # y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    df = _pts(spark, [("a", x, 2.0 * x + 1.0) for x in range(5)])
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    assert r["n_points"] == 5
    assert r["slope"] == 2.0 and r["intercept"] == 1.0 and r["r2"] == 1.0


def test_group_ols_known_scatter(spark):
    from flink_rag_spark.operators.regression import group_ols
    # hand-computed: x=[0,1,2], y=[0,1,3] -> slope 1.5, intercept -1/6,
    # r2 = cov²/(varx·vary) = (n·sxy-sx·sy)²/... = (3·7-3·4)²/((3·5-9)(3·10-16))
    df = _pts(spark, [("a", 0, 0.0), ("a", 1, 1.0), ("a", 2, 3.0)])
    r = group_ols(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] == 1.5
    assert r["intercept"] == round(-1.0 / 6.0, 4)
    assert r["r2"] == round(81.0 / (6.0 * 14.0), 6)


def test_group_ols_degenerate_groups(spark):
    from flink_rag_spark.operators.regression import group_ols
    # one point, and a zero-x-variance pair -> NULL stats, n still counted;
    # constant-y group -> slope 0, r2 NULL (no y variance)
    df = _pts(spark, [("single", 3, 9.0),
                      ("novar", 5, 1.0), ("novar", 5, 2.0),
                      ("flat", 0, 7.0), ("flat", 1, 7.0)])
    rows = {r["g"]: r for r in group_ols(df, ["g"], "x", "y").collect()}
    assert rows["single"]["slope"] is None and rows["single"]["n_points"] == 1
    assert rows["novar"]["slope"] is None and rows["novar"]["r2"] is None
    assert rows["flat"]["slope"] == 0.0 and rows["flat"]["intercept"] == 7.0
    assert rows["flat"]["r2"] is None


# --------------------------------------------------------------- SCD2

def _log(spark, rows):
    return spark.createDataFrame(
        [(k, datetime(2024, 1, d), v, seq) for k, d, v, seq in rows],
        "k bigint, ts timestamp, attr string, seq bigint")


def test_scd2_runs_and_intervals(spark):
    from flink_rag_spark.operators.scd import scd2_history
    # k=1: A,A,B,A -> three runs; k=2: single run
    log = _log(spark, [(1, 1, "A", 0), (1, 2, "A", 1), (1, 3, "B", 2),
                       (1, 5, "A", 3), (2, 4, "X", 0)])
    out = scd2_history(log, "k", "ts", "attr", "seq").collect()
    k1 = sorted([r for r in out if r["k"] == 1], key=lambda r: r["version"])
    assert [r["attr"] for r in k1] == ["A", "B", "A"]
    assert [r["n_changes"] for r in k1] == [2, 1, 1]
    # half-open contiguity: each valid_to is the next valid_from
    assert k1[0]["valid_to"] == k1[1]["valid_from"] == datetime(2024, 1, 3)
    assert k1[1]["valid_to"] == k1[2]["valid_from"] == datetime(2024, 1, 5)
    assert k1[2]["valid_to"] is None and k1[2]["is_current"]
    assert sum(r["is_current"] for r in out if r["k"] == 1) == 1
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["is_current"] and k2[0]["version"] == 1


def test_scd2_same_timestamp_tiebreak(spark):
    from flink_rag_spark.operators.scd import scd2_history
    # two same-day flips: the seq column orders them A(0) -> B(1), so the
    # history is A then B, deterministically
    log = _log(spark, [(7, 1, "A", 0), (7, 1, "B", 1)])
    out = sorted(scd2_history(log, "k", "ts", "attr", "seq").collect(),
                 key=lambda r: r["version"])
    assert [r["attr"] for r in out] == ["A", "B"]
    assert out[0]["valid_to"] == out[1]["valid_from"]


# ----------------------------------------------------------------- KS

def _sample(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_ks_identical_and_disjoint(spark):
    from flink_rag_spark.operators.hypothesis import ks_two_sample
    a = _sample(spark, range(50))
    same = ks_two_sample(a, _sample(spark, range(50)), "v").collect()[0]
    assert same["ks_d"] == 0.0 and not same["reject"]
    assert same["n_a"] == same["n_b"] == 50
    apart = ks_two_sample(a, _sample(spark, range(100, 150)), "v").collect()[0]
    assert apart["ks_d"] == 1.0 and apart["reject"]


def test_ks_hand_computed_and_split_equivalence(spark):
    from flink_rag_spark.operators.hypothesis import (
        ks_two_sample, ks_two_sample_split)
    # a=[1,2,3,4], b=[3,4,5,6]: max CDF gap is at v=2 -> |2/4 - 0| = 0.5
    a, b = [1, 2, 3, 4], [3, 4, 5, 6]
    two = ks_two_sample(_sample(spark, a), _sample(spark, b), "v").collect()[0]
    assert two["ks_d"] == 0.5
    tagged = spark.createDataFrame(
        [(float(v), "a") for v in a] + [(float(v), "b") for v in b],
        "v double, s string")
    one = ks_two_sample_split(tagged, "v", F.col("s") == "a",
                              F.col("s") == "b").collect()[0]
    assert one == two


def test_ks_partition_invariance(spark):
    from flink_rag_spark.operators.hypothesis import ks_two_sample
    # the distributed prefix sum must not depend on the range partition
    # count (1 partition == the single-window plan)
    a = _sample(spark, [v * 7 % 101 for v in range(80)])
    b = _sample(spark, [v * 13 % 97 for v in range(60)])
    r1 = ks_two_sample(a, b, "v", n_partitions=1).collect()[0]
    r32 = ks_two_sample(a, b, "v", n_partitions=32).collect()[0]
    assert r1 == r32


# -------------------------------------------------------------- decay

def test_time_decayed_stats_hand_values(spark):
    from flink_rag_spark.operators.timeseries import time_decayed_stats
    rows = [
        (1, datetime(2024, 1, 31), 10.0),   # age 0 -> w=1
        (1, datetime(2024, 1, 24), 10.0),   # age = half-life -> w=0.5
        (1, datetime(2024, 1, 10), 8.0),    # age 21d -> w=0.125
        (2, datetime(2024, 2, 5), 99.0),    # after ref -> excluded
        (2, datetime(2024, 1, 17), 4.0),    # age 14d -> w=0.25
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = {r["user_id"]: r for r in time_decayed_stats(
        df, ["user_id"], "ts", "value",
        ref_ts="2024-01-31 00:00:00", half_life_days=7.0).collect()}
    assert out[1]["n_events"] == 3
    assert out[1]["decayed_sum"] == 10.0 + 5.0 + 1.0
    assert out[1]["decayed_weight"] == 1.0 + 0.5 + 0.125
    assert out[1]["decayed_avg"] == round(16.0 / 1.625, 4)
    assert out[2]["n_events"] == 1 and out[2]["decayed_sum"] == 1.0


# --------------------------------------------------------- association

def test_categorical_association_grid(spark):
    from flink_rag_spark.operators.association import categorical_association
    import math
    # 2x2 with an empty (y,p) cell: x:q=2 x:p=2 y:q=2
    df = spark.createDataFrame(
        [("x", "q"), ("x", "q"), ("x", "p"), ("x", "p"), ("y", "q"),
         ("y", "q"), (None, "q")], "a string, b string")
    out = {(r["a"], r["b"]): r
           for r in categorical_association(df, "a", "b").collect()}
    assert len(out) == 4                       # full grid incl. empty cell
    assert out[("y", "p")]["n_xy"] == 0
    assert out[("y", "p")]["pmi"] is None      # ln 0 cell -> NULL
    assert out[("y", "p")]["expected"] == round(2 * 2 / 6.0, 4)
    assert out[("x", "q")]["n_xy"] == 2 and out[("x", "q")]["n_x"] == 4
    assert out[("x", "q")]["pmi"] == round(math.log(2 * 6 / (4.0 * 4.0)), 6)
    # NULL-keyed row excluded from every count
    assert sum(r["n_xy"] for r in out.values()) == 6
    # chi2 terms: (obs-exp)^2/exp summed = 6·(1/8 + 1/24 + ...) hand value
    chi2 = sum(r["chi2_term"] for r in out.values())
    exp = {("x", "q"): 8 / 3, ("x", "p"): 4 / 3,
           ("y", "q"): 4 / 3, ("y", "p"): 2 / 3}
    want = sum((obs - exp[c]) ** 2 / exp[c] for c, obs in
               [(("x", "q"), 2), (("x", "p"), 2), (("y", "q"), 2),
                (("y", "p"), 0)])
    assert chi2 == pytest.approx(want, abs=2e-6)


# ------------------------------------------------------------ triangles

def test_triangle_counts_hand_graph(spark):
    from flink_rag_spark.operators.graph import triangle_counts
    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 5-1
    # and an isolated edge 6-7; duplicate/reversed inputs must collapse
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (5, 1), (1, 5), (6, 7), (2, 1)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    out = {r["node"]: r for r in triangle_counts(df).collect()}
    assert out[1]["degree"] == 4 and out[1]["triangles"] == 3
    for n in (2, 3, 4):
        assert out[n]["degree"] == 3 and out[n]["triangles"] == 3
        assert out[n]["clustering_coeff"] == 1.0
    assert out[1]["clustering_coeff"] == 0.5       # 2*3/(4*3)
    assert out[5]["triangles"] == 0 and out[5]["clustering_coeff"] is None
    assert out[6]["triangles"] == 0 and out[7]["degree"] == 1
    # total triangle count: each of the 4 K4-triangles counted at 3 nodes
    assert sum(r["triangles"] for r in out.values()) == 12


def test_triangle_counts_star_has_none(spark):
    from flink_rag_spark.operators.graph import triangle_counts
    # a hub star has wedges but zero triangles — the wedge join must not
    # overcount
    df = spark.createDataFrame([(0, i) for i in range(1, 9)],
                               "u bigint, v bigint")
    out = triangle_counts(df).collect()
    assert all(r["triangles"] == 0 for r in out)
    assert {r["degree"] for r in out} == {1, 8}


# ------------------------------------------------------------- privacy

def test_k_anonymity_audit_and_suppression(spark):
    from flink_rag_spark.operators.privacy import (
        k_anonymity_audit, suppress_below_k)
    rows = ([("a", "x")] * 5 + [("a", "y")] * 2 + [("b", None)] * 3
            + [("b", "x")])
    df = spark.createDataFrame(rows, "s string, n string")
    audit = {(r["s"], r["n"]): r
             for r in k_anonymity_audit(df, ["s", "n"], k=3).collect()}
    assert audit[("a", "x")]["group_size"] == 5
    assert not audit[("a", "x")]["at_risk"]
    assert audit[("a", "y")]["at_risk"]
    assert audit[("b", None)]["group_size"] == 3        # NULL is a QI value
    assert not audit[("b", None)]["at_risk"]
    kept = suppress_below_k(df, ["s", "n"], k=3)
    assert kept.count() == 8                            # 5 + 3 survive
    # the suppressed table IS k-anonymous: re-audit finds no risk
    re_audit = k_anonymity_audit(kept, ["s", "n"], k=3).collect()
    assert not any(r["at_risk"] for r in re_audit)


# ------------------------------------------------------------ keywords

def test_tfidf_keywords_hand_values(spark):
    import math
    from flink_rag_spark.operators.keywords import tfidf_keywords
    df = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana cherry common"),
         (3, "cherry cherry common common")],
        "doc_id bigint, text string")
    out = tfidf_keywords(df, "text", "doc_id", top_n=2, min_df=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    idf2 = math.log(4.0 / 3.0) + 1.0      # df=2 terms (apple excluded: df=1)
    idf3 = math.log(4.0 / 4.0) + 1.0      # 'common' in all 3 docs
    # doc 1: apple is OOV by min_df, so banana (1·idf2) beats common (1·idf3)
    assert rows[(1, 1)]["token"] == "banana"
    assert rows[(1, 1)]["score"] == round(idf2, 6)
    assert rows[(1, 2)]["token"] == "common"
    # doc 3: cherry tf=2 -> 2·idf2 tops common tf=2 -> 2·idf3
    assert rows[(3, 1)]["token"] == "cherry"
    assert rows[(3, 1)]["score"] == round(2 * idf2, 6)
    # doc 2: banana and cherry tie at 1·idf2 -> token ASC breaks the tie
    assert rows[(2, 1)]["token"] == "banana"
    assert rows[(2, 2)]["token"] == "cherry"
    assert all(r["doc_freq"] >= 2 for r in rows.values())


def test_tfidf_keywords_vocab_cap_bounds_the_broadcast(spark):
    """The idf table is capped at the max_vocab highest-df terms
    (df DESC, token ASC) — the broadcast-bound contract, and DuckDB's
    mirror applies the identical cut."""
    import duckdb
    from flink_rag_spark.operators.keywords import (tfidf_keywords,
                                                    tfidf_keywords_duck)
    rows = [(1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry common common")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # dfs: common=3, banana=2, cherry=2 (apple df=1 gated by min_df).
    # max_vocab=2 keeps common then banana (token ASC tie) — cherry out.
    out = tfidf_keywords(df, "text", "doc_id", top_n=5, min_df=2,
                         max_vocab=2)
    toks = {r["token"] for r in out.collect()}
    assert toks == {"common", "banana"}
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in rows)
                + ") AS v(doc_id, text)")
    sql = tfidf_keywords_duck("SELECT doc_id, text FROM d",
                              "text", "doc_id", top_n=5, min_df=2,
                              max_vocab=2)
    duck = con.execute(sql).fetchdf()
    spk = out.toPandas()
    key = lambda f: sorted(map(tuple, f[["doc_id", "token", "tf",
                                         "doc_freq", "score"]].values))
    assert key(duck) == key(spk)


# -------------------------------------------- streaming decay monitor

def _write_vbatch(spark, path, rows):
    spark.createDataFrame(
        [(ts, u, v) for ts, u, v in rows],
        "ts_s string, user_id bigint, value double"
    ).selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "user_id", "value"
                 ).coalesce(1).write.mode("append").parquet(path)
    import time
    time.sleep(1.1)


def test_streaming_decay_matches_batch_anchor(spark, tmp_path):
    """The streaming fold's final per-key state must equal the batch
    anchored aggregate over the same events, including out-of-order
    arrival ACROSS micro-batches (within the watermark)."""
    import pytest as _pt
    from flink_rag_spark.operators.timeseries import time_decayed_at_latest
    from flink_rag_spark.streaming.decay import decay_monitor
    src = str(tmp_path / "decay_src")
    # batch 1: u1 out of order inside the batch; u2 single event
    _write_vbatch(spark, src, [
        ("2024-01-08 00:00:00", 1, 10.0),
        ("2024-01-01 00:00:00", 1, 4.0),
        ("2024-01-05 00:00:00", 2, 6.0),
    ])
    # batch 2: u1 gets an event EARLIER than its batch-1 max (disorder
    # bounded by the 30-day watermark) + a flush event far in the future
    _write_vbatch(spark, src, [
        ("2024-01-04 00:00:00", 1, 2.0),
        ("2024-01-15 00:00:00", 1, 1.0),
        ("2024-06-01 00:00:00", 99, 0.0),
    ])
    stream = (spark.readStream
              .schema("ts timestamp, user_id bigint, value double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (decay_monitor(stream, half_life_days=7.0, watermark="30 days")
         .writeStream.format("memory").queryName("decay_t")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_decay"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    emitted = spark.sql("select * from decay_t").collect()
    # latest emission per key (update mode re-emits as state evolves)
    last = {}
    for r in emitted:
        if r["user_id"] not in last or r["n_events"] > last[r["user_id"]]["n_events"]:
            last[r["user_id"]] = r
    batch = {r["user_id"]: r for r in time_decayed_at_latest(
        spark.read.parquet(src).filter("user_id < 99"),
        ["user_id"], "ts", "value", half_life_days=7.0).collect()}
    # u99 is the flush key: the watermark never passes its own event, so
    # it stays buffered and must NOT emit
    assert set(last) == {1, 2}
    for uid in (1, 2):
        assert last[uid]["n_events"] == batch[uid]["n_events"]
        assert last[uid]["last_ts"] == batch[uid]["last_ts"]
        assert last[uid]["decayed_sum"] == _pt.approx(
            batch[uid]["decayed_sum"], rel=1e-6, abs=1e-4)
        assert last[uid]["decayed_weight"] == _pt.approx(
            batch[uid]["decayed_weight"], rel=1e-6, abs=1e-4)
    # hand value for u1: events (1/1, 4), (1/4, 2), (1/8, 10), (1/15, 1)
    # folded at 7d half-life anchored at 1/15:
    # 4*2^-2 + 2*2^(-11/7) + 10*2^-1 + 1
    import math
    want = (4 * 2 ** (-2.0) + 2 * 2 ** (-11.0 / 7.0)
            + 10 * 2 ** (-1.0) + 1.0)
    assert last[1]["decayed_sum"] == _pt.approx(want, rel=1e-9)


def test_batch_decay_at_latest_anchor_is_per_key(spark):
    """Each key anchors at ITS OWN latest event, not the global max."""
    from datetime import datetime
    from flink_rag_spark.operators.timeseries import time_decayed_at_latest
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 8.0), (1, datetime(2024, 1, 8), 2.0),
         (2, datetime(2024, 2, 1), 5.0)],
        "user_id bigint, ts timestamp, value double")
    out = {r["user_id"]: r for r in time_decayed_at_latest(
        df, ["user_id"], "ts", "value", half_life_days=7.0).collect()}
    assert out[1]["decayed_sum"] == 8 * 0.5 + 2    # anchored at 1/8, not 2/1
    assert out[1]["last_ts"] == datetime(2024, 1, 8)
    assert out[2]["decayed_sum"] == 5.0


# ------------------------------------------ incremental join view (IVM)

def _facts(spark, rows):
    from datetime import datetime
    return spark.createDataFrame(
        [(k, c, datetime(y, m, d), p) for k, c, (y, m, d), p in rows],
        "o_id bigint, cust bigint, ts timestamp, price double")


def _dims(spark, rows):
    return spark.createDataFrame(rows, "ck bigint, seg string")


def _vrows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivm_append_equals_rebuild(spark, tmp_path):
    from flink_rag_spark.operators.ivm import (
        append_facts, build_join_view, read_join_view)
    path = str(tmp_path / "view")
    dims = _dims(spark, [(1, "A"), (2, "B")])
    f0 = _facts(spark, [(10, 1, (2024, 1, 5), 5.0),
                        (11, 2, (2024, 2, 1), 7.0)])
    build_join_view(spark, f0, dims, path, "cust", "ck", "ts")
    f1 = _facts(spark, [(12, 1, (2024, 2, 9), 3.0),
                        (13, 2, (2024, 3, 2), 2.0)])
    touched = append_facts(spark, f1, dims, path, "cust", "ck", "ts")
    assert touched == ["2024-02", "2024-03"]
    from flink_rag_spark.operators.ivm import _enriched
    full = _enriched(f0.unionByName(f1), dims, "cust", "ck", "ts")
    got = read_join_view(spark, path)
    assert _vrows(got.select(*full.columns)) == _vrows(full)


def test_ivm_append_replay_idempotent(spark, tmp_path):
    from flink_rag_spark.operators.ivm import (
        append_facts, build_join_view, read_join_view)
    path = str(tmp_path / "view_r")
    dims = _dims(spark, [(1, "A")])
    build_join_view(spark, _facts(spark, [(10, 1, (2024, 1, 5), 5.0)]),
                    dims, path, "cust", "ck", "ts")
    f1 = _facts(spark, [(11, 1, (2024, 1, 9), 3.0)])
    t1 = append_facts(spark, f1, dims, path, "cust", "ck", "ts", batch_id=7)
    assert t1 == ["2024-01"]
    t2 = append_facts(spark, f1, dims, path, "cust", "ck", "ts", batch_id=7)
    assert t2 == []                                  # replay skipped
    assert read_join_view(spark, path).count() == 2  # no duplicate rows
    # a NEW batch id still lands
    f2 = _facts(spark, [(12, 1, (2024, 1, 20), 1.0)])
    t3 = append_facts(spark, f2, dims, path, "cust", "ck", "ts", batch_id=8)
    assert t3 == ["2024-01"]
    assert read_join_view(spark, path).count() == 3


def test_ivm_dim_update_from_view_only(spark, tmp_path):
    from flink_rag_spark.operators.ivm import (
        apply_dim_update, build_join_view, read_join_view, _enriched)
    path = str(tmp_path / "view_d")
    dims = _dims(spark, [(1, "A"), (2, "B"), (3, "C")])
    f = _facts(spark, [(10, 1, (2024, 1, 5), 5.0),
                       (11, 2, (2024, 1, 7), 7.0),
                       (12, 1, (2024, 3, 1), 2.0),
                       (13, 3, (2024, 4, 1), 9.0)])
    build_join_view(spark, f, dims, path, "cust", "ck", "ts")
    # customer 1 moves to segment Z — touches 2024-01 and 2024-03 only
    touched = apply_dim_update(
        spark, _dims(spark, [(1, "Z")]), path, "cust", "ck")
    assert touched == ["2024-01", "2024-03"]
    new_dims = _dims(spark, [(1, "Z"), (2, "B"), (3, "C")])
    want = _enriched(f, new_dims, "cust", "ck", "ts")
    got = read_join_view(spark, path)
    assert _vrows(got.select(*want.columns)) == _vrows(want)


def test_ivm_untouched_partition_bytes_identical(spark, tmp_path):
    import os
    from flink_rag_spark.operators.ivm import append_facts, build_join_view
    path = str(tmp_path / "view_u")
    dims = _dims(spark, [(1, "A")])
    build_join_view(spark, _facts(spark, [(10, 1, (2024, 1, 5), 5.0)]),
                    dims, path, "cust", "ck", "ts")
    before = {}
    jan = os.path.join(path, "pmonth=2024-01")
    for fn in os.listdir(jan):
        if fn.endswith(".parquet"):
            before[fn] = os.path.getmtime(os.path.join(jan, fn))
    append_facts(spark, _facts(spark, [(11, 1, (2024, 2, 9), 3.0)]),
                 dims, path, "cust", "ck", "ts")
    after = {fn: os.path.getmtime(os.path.join(jan, fn))
             for fn in os.listdir(jan) if fn.endswith(".parquet")}
    assert before == after          # January files untouched by the Feb append


# ------------------------------------- review-pass regression pins

def test_suppress_below_k_null_qi_groups(spark):
    """NULL QI combinations must be suppressed when at risk and KEPT
    when safe — a plain equality anti join gets both wrong."""
    from flink_rag_spark.operators.privacy import (
        k_anonymity_audit, suppress_below_k)
    rows = ([("a", "x")] * 3 + [("b", None)] * 3 + [("c", None)])
    df = spark.createDataFrame(rows, "s string, n string")
    kept = suppress_below_k(df, ["s", "n"], k=3)
    got = sorted((r["s"], r["n"]) for r in kept.collect())
    # ('c', NULL) is a size-1 at-risk group -> suppressed;
    # ('b', NULL) is size 3 -> kept
    assert got == [("a", "x")] * 3 + [("b", None)] * 3
    assert not any(r["at_risk"] for r in
                   k_anonymity_audit(kept, ["s", "n"], k=3).collect())


def test_suppress_below_k_duck_twin_null_and_alias(spark):
    """The DuckDB twin must match the Spark fix (IS NOT DISTINCT FROM
    join) and survive a QI column literally named ``n``."""
    import duckdb
    from flink_rag_spark.operators.privacy import suppress_below_k_duck
    inner = ("SELECT * FROM (VALUES ('a','x'), ('a','x'), ('a','x'), "
             "('b',NULL), ('b',NULL), ('b',NULL), ('c',NULL)) t(s, n)")
    sql = suppress_below_k_duck(inner, ["s", "n"], k=3)
    got = sorted(duckdb.connect().execute(sql).fetchall())
    assert got == [("a", "x")] * 3 + [("b", None)] * 3


def test_scd2_null_first_value_versions_start_at_one(spark):
    """An entity whose FIRST attribute value is NULL must still number
    its runs 1..k (the lag-NULL ≡ NULL trap), in BOTH engines."""
    import duckdb
    from flink_rag_spark.operators.scd import scd2_history, scd2_history_duck
    log = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), None, 0), (1, datetime(2024, 1, 2), "A", 1)],
        "k bigint, ts timestamp, attr string, seq bigint")
    out = sorted(scd2_history(log, "k", "ts", "attr", "seq").collect(),
                 key=lambda r: r["version"])
    assert [r["version"] for r in out] == [1, 2]
    assert out[0]["attr"] is None and out[1]["attr"] == "A"
    sql = scd2_history_duck(
        "SELECT * FROM (VALUES (1, TIMESTAMP '2024-01-01', NULL, 0), "
        "(1, TIMESTAMP '2024-01-02', 'A', 1)) t(k, ts, attr, seq)",
        "k", "ts", "attr", "seq")
    duck = sorted(duckdb.connect().execute(sql).fetchall())
    assert [r[1] for r in duck] == [1, 2]


# ----------------------------------------------------- answer grounding

def test_answer_grounding_hand_values(spark):
    from flink_rag_spark.operators.evaluation import answer_grounding
    df = spark.createDataFrame(
        [(1, "the cat sat", "the cat sat on the mat"),     # fully grounded
         (2, "dogs bark loudly", "cats purr softly"),      # nothing grounded
         (3, "alpha beta GAMMA beta", "alpha delta"),      # partial + dedup + case
         (4, "", "some context")],                         # empty answer
        "qid bigint, answer string, ctx string")
    out = {r["qid"]: r for r in
           answer_grounding(df, "qid", "answer", "ctx").collect()}
    assert out[1]["grounded_frac"] == 1.0 and out[1]["n_answer_tokens"] == 3
    assert out[2]["grounded_frac"] == 0.0
    assert out[2]["ungrounded_sample"] == "bark,dogs,loudly"  # lexical order
    # doc 3: distinct tokens {alpha, beta, gamma}; only alpha grounded
    assert out[3]["n_answer_tokens"] == 3
    assert out[3]["grounded_tokens"] == 1
    assert out[3]["grounded_frac"] == round(1.0 / 3.0, 6)
    assert out[3]["ungrounded_sample"] == "beta,gamma"
    # empty answer: zero tokens, NULL frac, question still reported
    assert out[4]["n_answer_tokens"] == 0
    assert out[4]["grounded_frac"] is None


# ------------------------------------- streaming heavy-hitter monitor

def test_streaming_heavy_hitters_superset_and_bounds(spark, tmp_path):
    """The bucketed-MG stream must (a) keep every true heavy hitter in
    its candidate fold and (b) bracket every surviving item's true count
    with [lo, hi]."""
    from collections import Counter
    from flink_rag_spark.streaming.frequency_monitor import (
        heavy_hitter_monitor, mg_candidates)
    b1 = ["hot"] * 60 + [f"cold{i}" for i in range(40)]
    b2 = ["hot"] * 40 + ["warm"] * 30 + [f"cold{i}" for i in range(40, 70)]
    src = str(tmp_path / "hh_src")
    for batch in (b1, b2):
        (spark.createDataFrame([(x,) for x in batch], "event_type string")
         .coalesce(1).write.mode("append").parquet(src))
        import time
        time.sleep(1.1)
    stream = (spark.readStream.schema("event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (heavy_hitter_monitor(stream, "event_type", m=8, n_buckets=4)
         .writeStream.format("memory").queryName("hh_t")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    emissions = spark.sql("select * from hh_t")
    cands = {r["item"]: r for r in
             mg_candidates(emissions, threshold_frac=0.10).collect()}
    true = Counter(b1 + b2)
    n = sum(true.values())
    # superset: every true >10% item is a candidate
    for item, c in true.items():
        if c > 0.10 * n:
            assert item in cands, f"missing true heavy hitter {item}"
    # bounds: lo <= true <= hi for every candidate
    for item, r in cands.items():
        assert r["lo"] <= true[item] <= r["hi"], (item, dict(r.asDict()))
    assert "hot" in cands and "warm" in cands
    # total is the full stream length (every bucket's latest total)
    assert next(iter(cands.values()))["n_total"] == n


def test_streaming_heavy_hitters_state_bounded(spark, tmp_path):
    """State (and therefore each bucket's emission) stays within the MG
    capacity m no matter how many distinct items flow through."""
    from flink_rag_spark.streaming.frequency_monitor import (
        heavy_hitter_monitor)
    rows = [(f"item{i % 500}",) for i in range(2000)]
    src = str(tmp_path / "hh_cap")
    spark.createDataFrame(rows, "event_type string") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema("event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (heavy_hitter_monitor(stream, "event_type", m=10, n_buckets=4)
         .writeStream.format("memory").queryName("hh_cap_t")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_hh_cap"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    per_bucket = (spark.sql("select bucket, count(*) c from hh_cap_t "
                            "group by bucket").collect())
    assert all(r["c"] <= 10 for r in per_bucket)


# ------------------------------------------------------ robust outliers

def test_robust_outliers_hand_values(spark):
    from flink_rag_spark.operators.anomaly import robust_outliers
    # group g: symmetric cluster at 10 +- 1 with one wild point; median
    # 10, MAD 1 -> z(100) = 90/1.4826 = 60.7...; z(11) = 0.67 (kept in)
    rows = [("g", 9.0), ("g", 10.0), ("g", 10.0), ("g", 11.0),
            ("g", 100.0),
            # zero-spread group: any deviation flags, z is NULL
            ("z", 5.0), ("z", 5.0), ("z", 5.0), ("z", 7.0),
            # NULL value never flags
            ("g", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = robust_outliers(df, ["k"], "v", z_thresh=3.5).collect()
    flagged = {(r["k"], r["v"]): r for r in out}
    assert set(flagged) == {("g", 100.0), ("z", 7.0)}
    g = flagged[("g", 100.0)]
    assert g["group_median"] == 10.0 and g["group_mad"] == 1.0
    assert g["robust_z"] == round(90.0 / 1.4826, 4)
    z = flagged[("z", 7.0)]
    assert z["group_mad"] == 0.0 and z["robust_z"] is None


def test_robust_outliers_resist_mean_drag(spark):
    """The defining property: a huge outlier must not mask itself by
    dragging the center (as it would for mean/stddev z-scores)."""
    from flink_rag_spark.operators.anomaly import robust_outliers
    vals = [float(v) for v in range(100)] + [1e6]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    out = robust_outliers(df, ["k"], "v").collect()
    assert [r["v"] for r in out] == [1e6]
