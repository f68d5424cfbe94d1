"""Round-15 operators: FlinkCEP greedy() loops (batch + streaming).

Hand-value fixtures verified by hand; the DuckDB mirror parity is
exercised here on the same fixtures (the sf0.01 sweep covers the
catalog entry) and the streaming monitor is pinned ≡ the batch
operator's completed rows under cross-batch disorder.
"""

import duckdb
import pytest

import pyspark.sql.functions as F


def _t(r, j):
    v = r[f"t{j}"]
    return None if v is None else int(v.timestamp())


def _greedy_events(spark):
    rows = [
        # u1: greedy click run {2,3} bounded by purchase@10; click@12
        # belongs to no run (past the completing purchase)
        ("u1", 1, "view"), ("u1", 2, "click"), ("u1", 3, "click"),
        ("u1", 10, "purchase"), ("u1", 12, "click"),
        # u2: no click at all -> open loop, t2/t3/absorbed NULL
        ("u2", 1, "view"), ("u2", 2, "purchase"),
        # u3: click@1 precedes the view -> not absorbed; run = {3}
        ("u3", 1, "click"), ("u3", 2, "view"), ("u3", 3, "click"),
        ("u3", 4, "purchase"),
        # u4: n=2 fixture - three clicks before the purchase
        ("u4", 1, "view"), ("u4", 2, "click"), ("u4", 3, "click"),
        ("u4", 4, "click"), ("u4", 5, "purchase"),
    ]
    return (spark.createDataFrame(
        [(u, s, t, i) for i, (u, s, t) in enumerate(rows)],
        "user_id string, s bigint, event_type string, event_id bigint")
        .select("user_id", "event_id",
                F.timestamp_seconds(F.col("s")).alias("ts"),
                "event_type"))


def test_greedy_funnel_hand_values(spark):
    """The loop claims every click in (view, first purchase): t2 is the
    run's LAST click (reluctant would report the n-th), absorbed its
    length; an open run (no suffix yet) reports NULL."""
    from flink_rag_spark.operators.sequences import greedy_funnel_times

    e = _greedy_events(spark)
    out = {r["user_id"]: r for r in greedy_funnel_times(
        e, ["view", "click", "purchase"], greedy=2).collect()}
    r = out["u1"]
    assert (_t(r, 1), _t(r, 2), _t(r, 3), r["absorbed"]) == (1, 3, 10, 2)
    r = out["u2"]
    assert (_t(r, 1), _t(r, 2), _t(r, 3), r["absorbed"]) == \
        (1, None, None, None)
    r = out["u3"]
    assert (_t(r, 1), _t(r, 2), _t(r, 3), r["absorbed"]) == (2, 3, 4, 1)
    r = out["u4"]
    assert (_t(r, 1), _t(r, 2), _t(r, 3), r["absorbed"]) == (1, 4, 5, 3)


def test_greedy_funnel_n2_and_within(spark):
    """n=2 requires two reps before the suffix counts; within_seconds
    clamps the whole chain at the anchor."""
    from flink_rag_spark.operators.sequences import greedy_funnel_times

    e = _greedy_events(spark)
    out = {r["user_id"]: r for r in greedy_funnel_times(
        e, ["view", "click", "purchase"], greedy=2, n=2).collect()}
    # u3 has only one click after its view -> chain never closes
    r = out["u3"]
    assert (_t(r, 2), _t(r, 3), r["absorbed"]) == (None, None, None)
    # u4 still completes; the run is all three clicks
    r = out["u4"]
    assert (_t(r, 1), _t(r, 2), _t(r, 3), r["absorbed"]) == (1, 4, 5, 3)
    # within 5s: u1's purchase@10 is out of window -> open run
    out_w = {r["user_id"]: r for r in greedy_funnel_times(
        e, ["view", "click", "purchase"], greedy=2,
        within_seconds=5).collect()}
    assert (_t(out_w["u1"], 3), out_w["u1"]["absorbed"]) == (None, None)
    assert (_t(out_w["u4"], 2), out_w["u4"]["absorbed"]) == (4, 3)


def test_greedy_funnel_duck_parity(spark):
    """The mirror expands, bounds and counts identically on the hand
    fixture (both n values)."""
    from flink_rag_spark.operators.sequences import (
        greedy_funnel_times, greedy_funnel_times_duck)

    e = _greedy_events(spark)
    pdf = e.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    steps = ["view", "click", "purchase"]
    for n in (1, 2):
        sp = {r["user_id"]: (_t(r, 1), _t(r, 2), _t(r, 3), r["absorbed"])
              for r in greedy_funnel_times(e, steps, 2, n=n).collect()}
        du = {r[0]: tuple(
            [None if v is None else int(v.timestamp()) for v in r[1:4]]
            + [r[4]])
            for r in con.execute(
                greedy_funnel_times_duck(steps, 2, n=n)).fetchall()}
        assert sp == du


def test_greedy_validation():
    from flink_rag_spark.operators.sequences import _greedy_validate

    with pytest.raises(ValueError, match="LAST step"):
        _greedy_validate(["a", "b"], 2, 1)
    with pytest.raises(ValueError, match="overlap"):
        _greedy_validate(["a", "b", "b"], 2, 1)
    with pytest.raises(ValueError, match="n must be"):
        _greedy_validate(["a", "b", "c"], 2, 0)
    with pytest.raises(ValueError, match="index"):
        _greedy_validate(["a", "b", "c"], 4, 1)


def test_streaming_greedy_matches_batch(spark, tmp_path):
    """greedy() streaming ≡ batch completions (t3 non-NULL) under
    cross-batch disorder: u1's second click arrives LATE (inside the
    watermark) and is still absorbed; u2 never closes its run."""
    from flink_rag_spark.operators.sequences import greedy_funnel_times
    from flink_rag_spark.streaming.cep import greedy_funnel_monitor
    from tests.test_round13_ops import _drain, _write_cep_batch

    steps = ["view", "click", "purchase"]
    ev = [("2024-01-01 00:00:01", 1, "view"),
          ("2024-01-01 00:00:02", 1, "click"),
          ("2024-01-01 00:00:10", 1, "purchase"),
          ("2024-01-01 00:00:12", 1, "click"),
          ("2024-01-01 00:00:01", 2, "view"),
          ("2024-01-01 00:00:02", 2, "click"),
          ("2024-01-01 00:00:01", 3, "view"),
          ("2024-01-01 00:00:03", 3, "click"),
          ("2024-01-01 00:00:04", 3, "purchase")]
    late = [("2024-01-01 00:00:03", 1, "click")]
    tail = [("2024-01-10 00:00:00", 99, "view")]
    src = str(tmp_path / "greedy_src")
    _write_cep_batch(spark, src, ev)
    _write_cep_batch(spark, src, late)
    _write_cep_batch(spark, src, tail)
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    got = sorted(
        (r["user_id"], r["t1"], r["t2"], r["t3"], r["absorbed"])
        for r in _drain(greedy_funnel_monitor(
            stream, steps, 2, watermark="1 hour"),
            tmp_path, "greedy_m").collect())
    want = sorted(
        (r["user_id"], r["t1"], r["t2"], r["t3"], r["absorbed"])
        for r in greedy_funnel_times(
            spark.read.parquet(src), steps, 2).collect()
        if r["t3"] is not None)
    assert got == want
    assert len(got) == 2            # u1 and u3 complete; u2 stays open
    by_u = {u: (t2, a) for u, _t1, t2, _t3, a in got}
    # the late click@3 is inside u1's run and absorbed
    assert by_u[1][1] == 2
    assert by_u[3] == (by_u[3][0], 1)


def test_flinkcep_porting_table_doc():
    """COVERAGE.md's porting table must name every Pattern.java
    construct and point at real operators (doc-as-fact discipline)."""
    import os

    import flink_rag_spark.operators.sequences as seq
    import flink_rag_spark.streaming.cep as cep

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = open(os.path.join(repo, "COVERAGE.md")).read()
    start = doc.index("## FlinkCEP porting table")
    table = doc[start:]
    for construct in ("next()", "notFollowedBy()", "times(n)",
                      "consecutive()", "until(cond)", "greedy()",
                      "optional()", "Pattern.begin(Pattern)",
                      "within(Duration)", "noSkip()",
                      "skipPastLastEvent()", "skipToFirst(p)",
                      "followedByAny()", "MATCH_RECOGNIZE"):
        assert construct in table, f"porting table misses {construct}"
    for op in ("funnel_times", "strict_funnel_times",
               "negated_funnel_times", "quantified_funnel_times",
               "consecutive_funnel_times", "until_funnel_times",
               "greedy_funnel_times", "optional_funnel_times",
               "group_funnel_times", "all_funnel_matches",
               "consumed_funnel_matches", "skip_to_funnel_matches"):
        assert op in table, f"porting table misses {op}"
        assert hasattr(seq, op), f"table names a ghost operator {op}"
    for mon in ("funnel_monitor", "strict_funnel_monitor",
                "negated_funnel_monitor", "until_funnel_monitor",
                "greedy_funnel_monitor", "optional_funnel_monitor",
                "group_funnel_monitor", "all_matches_monitor",
                "consumed_matches_monitor", "skip_to_matches_monitor"):
        assert mon in table, f"porting table misses {mon}"
        assert hasattr(cep, mon), f"table names a ghost monitor {mon}"


# ------------------------------------------ round-15 stats battery


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_levene_hand_values(spark):
    """scipy levene(center='mean') on [1,5] vs [2,2,8] -> W = 0.6."""
    from flink_rag_spark.operators.hypothesis import levene_test

    df = _df(spark, [("a", 1.0), ("a", 5.0), ("b", 2.0), ("b", 2.0),
                     ("b", 8.0)], "g string, v double")
    r = levene_test(df, "g", "v", 5.0).collect()[0]
    assert r["n"] == 5 and r["n_groups"] == 2
    assert abs(r["f"] - 0.6) < 1e-6
    assert abs(r["ss_between"] - 8.0 / 15) < 1e-6
    assert not r["significant"]


def test_cohens_d_hand_values(spark):
    """[1,2,3] vs [4,6]: d = -3/sqrt(4/3), g = d * 8/11."""
    from flink_rag_spark.operators.hypothesis import cohens_d

    a = _df(spark, [(1.0,), (2.0,), (3.0,)], "v double")
    b = _df(spark, [(4.0,), (6.0,)], "v double")
    r = cohens_d(a, b, "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["mean_a"] == 2.0 and r["mean_b"] == 5.0
    assert abs(r["d"] - (-2.598076)) < 1e-6
    assert abs(r["g"] - (-2.598076 * 8 / 11)) < 1e-5
    # a single-observation side has no variance -> NULL d
    one = _df(spark, [(4.0,)], "v double")
    r2 = cohens_d(a, one, "v").collect()[0]
    assert r2["d"] is None and r2["pooled_sd"] is None


def test_point_biserial_hand_values(spark):
    """flag={2,4} vs {1,3}: r = 1/1.118034 * 0.5 = 0.447214."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.hypothesis import point_biserial

    df = _df(spark, [(True, 2.0), (True, 4.0), (False, 1.0),
                     (False, 3.0)], "f boolean, v double")
    r = point_biserial(df, "f", "v").collect()[0]
    assert (r["n"], r["n_1"], r["n_0"]) == (4, 2, 2)
    assert r["mean_1"] == 3.0 and r["mean_0"] == 2.0
    assert abs(r["r_pb"] - 0.447214) < 1e-6
    assert abs(r["z"] - 0.774597) < 1e-6
    # Column predicate form + constant values -> NULL r
    flat = _df(spark, [(1, 5.0), (2, 5.0)], "k bigint, v double")
    r2 = point_biserial(flat, F.col("k") == 1, "v").collect()[0]
    assert r2["r_pb"] is None and not r2["significant"]


def test_friedman_hand_values(spark):
    """Three blocks ranking three treatments identically -> Q = 6
    (the no-tie classic); an incomplete block is excluded."""
    from flink_rag_spark.operators.hypothesis import friedman_test

    rows = []
    for b in ("b1", "b2", "b3"):
        rows += [(b, "t1", 1.0), (b, "t2", 2.0), (b, "t3", 3.0)]
    df = _df(spark, rows, "b string, t string, v double")
    r = friedman_test(df, "b", "t", "v", 5.991).collect()[0]
    assert (r["n_blocks"], r["k"]) == (3, 3)
    assert abs(r["q"] - 6.0) < 1e-9
    assert r["significant"]
    # a block missing t3 drops out; Q unchanged
    df2 = df.union(_df(spark, [("b4", "t1", 9.0), ("b4", "t2", 1.0)],
                       "b string, t string, v double"))
    r2 = friedman_test(df2, "b", "t", "v", 5.991).collect()[0]
    assert (r2["n_blocks"], r2["k"]) == (3, 3)
    assert abs(r2["q"] - 6.0) < 1e-9


def test_cochran_q_hand_values(spark):
    """Classic 4-block binary grid -> Q = 6.5."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.hypothesis import cochran_q

    grid = {"b1": (1, 1, 0), "b2": (1, 1, 0), "b3": (0, 1, 0),
            "b4": (1, 1, 0)}
    rows = [(b, f"t{j+1}", bool(x)) for b, xs in grid.items()
            for j, x in enumerate(xs)]
    df = _df(spark, rows, "b string, t string, s boolean")
    r = cochran_q(df, "b", "t", "s", 5.991).collect()[0]
    assert (r["n_blocks"], r["k"]) == (4, 3)
    assert abs(r["q"] - 6.5) < 1e-9
    assert r["significant"]
    # all-success blocks only -> zero denominator -> NULL
    allsucc = _df(spark, [("b", f"t{j}", True) for j in range(3)],
                  "b string, t string, s boolean")
    r2 = cochran_q(allsucc, "b", "t", F.col("s"), 5.991).collect()[0]
    assert r2["q"] is None and not r2["significant"]


def test_ordinal_association_hand_values(spark):
    from flink_rag_spark.operators.hypothesis import ordinal_association

    df = _df(spark, [(1, 1), (1, 1), (2, 2)], "x int, y int")
    r = ordinal_association(df, "x", "y").collect()[0]
    assert r["n"] == 3
    assert r["gamma"] == 1.0
    assert r["somers_d_yx"] == 1.0 and r["somers_d_xy"] == 1.0
    assert abs(r["tau_c"] - 8.0 / 9) < 1e-6
    rev = _df(spark, [(1, 2), (2, 1)], "x int, y int")
    r2 = ordinal_association(rev, "x", "y").collect()[0]
    assert r2["gamma"] == -1.0 and r2["tau_c"] == -1.0
    # constant x: no pairs at all -> NULL gamma/d_yx
    flat = _df(spark, [(1, 1), (1, 2)], "x int, y int")
    r3 = ordinal_association(flat, "x", "y").collect()[0]
    assert r3["gamma"] is None and r3["somers_d_yx"] is None


def test_cohen_kappa_hand_values(spark):
    """po = 2/3, pe = 5/9 -> kappa = 0.25; constant raters -> NULL."""
    from flink_rag_spark.operators.hypothesis import cohen_kappa

    rows = ([("x", "x")] * 3 + [("x", "y")] + [("y", "y")]
            + [("y", "x")])
    df = _df(spark, rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 6
    assert abs(r["po"] - 2 / 3) < 1e-6
    assert abs(r["pe"] - 5 / 9) < 1e-6
    assert abs(r["kappa"] - 0.25) < 1e-6
    const = _df(spark, [("x", "x")] * 4, "a string, b string")
    r2 = cohen_kappa(const, "a", "b").collect()[0]
    assert r2["po"] == 1.0 and r2["pe"] == 1.0 and r2["kappa"] is None


def test_uncertainty_coefficient_hand_values(spark):
    """Perfect 2x2 association: U = 1 in every direction."""
    from flink_rag_spark.operators.hypothesis import (
        uncertainty_coefficient)

    df = _df(spark, [("a", 1), ("a", 1), ("b", 2), ("b", 2)],
             "x string, y int")
    r = uncertainty_coefficient(df, "x", "y").collect()[0]
    assert abs(r["mi"] - 0.693147) < 1e-6
    assert r["u_x_given_y"] == 1.0
    assert r["u_y_given_x"] == 1.0
    assert r["u_symmetric"] == 1.0
    # independent grid -> MI 0 -> U 0
    ind = _df(spark, [("a", 1), ("a", 2), ("b", 1), ("b", 2)],
              "x string, y int")
    r2 = uncertainty_coefficient(ind, "x", "y").collect()[0]
    assert r2["u_symmetric"] == 0.0


def test_inequality_indexes_hand_values(spark):
    import pyspark.sql.functions as F
    import pytest

    from flink_rag_spark.operators.profiling import inequality_indexes

    rows = ([("even", 1.0)] * 4
            + [("two", 1.0), ("two", 3.0), ("zero", 0.0),
               ("zero", 2.0)])
    df = _df(spark, rows, "g string, v double").withColumn(
        "v", F.col("v").cast("decimal(18,2)"))
    out = {r["g"]: r for r in
           inequality_indexes(df, "v", ["g"]).collect()}
    assert out["even"]["theil"] == 0.0 and out["even"]["atkinson"] == 0.0
    assert abs(out["two"]["theil"] - 0.130812) < 1e-6
    assert abs(out["two"]["atkinson"] - 0.133975) < 1e-6
    assert abs(out["zero"]["theil"] - 0.693147) < 1e-6
    assert out["zero"]["atkinson"] == 1.0
    with pytest.raises(TypeError, match="DECIMAL"):
        inequality_indexes(_df(spark, [("g", 1.0)],
                               "g string, v double"), "v", ["g"])
    with pytest.raises(ValueError, match="non-negative"):
        inequality_indexes(
            _df(spark, [("g", -1.0)], "g string, v double")
            .withColumn("v", F.col("v").cast("decimal(18,2)")),
            "v", ["g"])


def test_distribution_distance_hand_values(spark):
    """Two-mass fixture: p = (.5, .5), q = (.9, .1) -> tv 0.4,
    hellinger 0.32492, jsd 0.101749; identical samples -> zeros."""
    from flink_rag_spark.operators.drift import distribution_distance

    ref = _df(spark, [(0.0,)] * 5 + [(10.0,)] * 5, "v double")
    cur = _df(spark, [(0.0,)] * 9 + [(10.0,)], "v double")
    r = distribution_distance(ref, cur, "v").collect()[0]
    assert (r["n_ref"], r["n_cur"]) == (10, 10)
    assert r["tv"] == 0.4
    assert abs(r["hellinger"] - 0.32492) < 1e-6
    assert abs(r["jsd"] - 0.101749) < 1e-6
    same = distribution_distance(ref, ref, "v").collect()[0]
    assert (same["jsd"], same["hellinger"], same["tv"]) == (0.0, 0.0, 0.0)


def test_runs_test_hand_values(spark):
    """Perfect alternation -> z = +1.825742; perfect clustering ->
    the mirror image; median-tied values drop."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.timeseries import runs_test

    def series(vals):
        return _df(spark,
                   [("s", i, float(v)) for i, v in enumerate(vals)],
                   "k string, t bigint, v double").withColumn(
            "ts", F.timestamp_seconds(F.col("t")))

    alt = runs_test(series([1, 2, 1, 2, 1, 2]), ["k"], "ts",
                    "v").collect()[0]
    assert (alt["n"], alt["n_above"], alt["n_below"],
            alt["runs"]) == (6, 3, 3, 6)
    assert alt["expected_runs"] == 4.0
    assert abs(alt["z"] - 1.825742) < 1e-6
    clus = runs_test(series([1, 1, 1, 2, 2, 2]), ["k"], "ts",
                     "v").collect()[0]
    assert clus["runs"] == 2 and abs(clus["z"] + 1.825742) < 1e-6
    # a value AT the median drops (classical treatment)
    tied = runs_test(series([1, 1.5, 2]), ["k"], "ts",
                     "v").collect()[0]
    assert tied["n"] == 2 and tied["runs"] == 2


def test_zipf_fit_hand_values(spark):
    """An exactly-Zipfian corpus (counts 6/3/2) fits slope -1,
    intercept ln 6, r2 = 1."""
    from flink_rag_spark.operators.keywords import zipf_fit

    text = " ".join(["alpha"] * 6 + ["beta"] * 3 + ["gamma"] * 2)
    docs = _df(spark, [(1, text)], "doc_id bigint, text string")
    r = zipf_fit(docs, "text").collect()[0]
    assert r["n_terms"] == 3
    assert r["slope"] == -1.0
    assert abs(r["intercept"] - 1.791759) < 1e-6
    assert r["r2"] == 1.0


# --------------------------------------- bounded followedByAny


def test_any_funnel_matches_hand_values(spark):
    """Per-anchor lex-top-N combination matches: the B@6 past the last
    C is not viable, two anchors each emit their own tree, N truncates
    in (t2, t3) order."""
    from flink_rag_spark.operators.sequences import any_funnel_matches

    rows = [
        ("u1", 1, "A"), ("u1", 2, "B"), ("u1", 3, "B"), ("u1", 4, "C"),
        ("u1", 5, "C"), ("u1", 6, "B"),
        ("u2", 1, "A"), ("u2", 2, "C"),
        ("u3", 1, "A"), ("u3", 2, "A"), ("u3", 3, "B"), ("u3", 4, "C"),
    ]
    e = (spark.createDataFrame(
        [(u, s, t, i) for i, (u, s, t) in enumerate(rows)],
        "user_id string, s bigint, event_type string, event_id bigint")
        .select("user_id", "event_id",
                F.timestamp_seconds(F.col("s")).alias("ts"),
                "event_type"))
    got = sorted(
        (r["user_id"], _t(r, 1), _t(r, 2), _t(r, 3), r["match_rank"])
        for r in any_funnel_matches(e, ["A", "B", "C"],
                                    per_anchor=3).collect())
    assert got == [
        ("u1", 1, 2, 4, 1), ("u1", 1, 2, 5, 2), ("u1", 1, 3, 4, 3),
        ("u3", 1, 3, 4, 1), ("u3", 2, 3, 4, 1)]
    got2 = sorted(
        (r["user_id"], _t(r, 2), _t(r, 3))
        for r in any_funnel_matches(e, ["A", "B", "C"],
                                    per_anchor=2).collect()
        if r["user_id"] == "u1")
    assert got2 == [("u1", 2, 4), ("u1", 2, 5)]


def test_any_funnel_matches_duck_parity(spark):
    import duckdb as ddb

    from flink_rag_spark.operators.sequences import (
        any_funnel_matches, any_funnel_matches_duck)

    rows = [
        ("u1", 1, "A"), ("u1", 2, "B"), ("u1", 3, "B"), ("u1", 4, "C"),
        ("u1", 5, "C"), ("u1", 6, "B"),
        ("u3", 1, "A"), ("u3", 2, "A"), ("u3", 3, "B"), ("u3", 4, "C"),
    ]
    e = (spark.createDataFrame(
        [(u, s, t, i) for i, (u, s, t) in enumerate(rows)],
        "user_id string, s bigint, event_type string, event_id bigint")
        .select("user_id", "event_id",
                F.timestamp_seconds(F.col("s")).alias("ts"),
                "event_type"))
    con = ddb.connect()
    con.register("events", e.toPandas())
    for n in (1, 2, 3, 5):
        sp = sorted(
            (r["user_id"], _t(r, 1), _t(r, 2), _t(r, 3),
             r["match_rank"])
            for r in any_funnel_matches(e, ["A", "B", "C"],
                                        per_anchor=n).collect())
        du = sorted(
            (r[0],) + tuple(int(v.timestamp()) for v in r[1:4])
            + (r[4],)
            for r in con.sql(any_funnel_matches_duck(
                ["A", "B", "C"], per_anchor=n)).fetchall())
        assert sp == du, n


def test_any_funnel_matches_validation():
    import pytest as pt

    from flink_rag_spark.operators.sequences import (
        ANY_MATCHES_MAX, any_funnel_matches_duck)

    with pt.raises(ValueError, match="at least 2"):
        any_funnel_matches_duck(["A"])
    with pt.raises(ValueError, match="per_anchor"):
        any_funnel_matches_duck(["A", "B"], per_anchor=0)
    with pt.raises(ValueError, match="per_anchor"):
        any_funnel_matches_duck(["A", "B"],
                                per_anchor=ANY_MATCHES_MAX + 1)


# ------------------------------ streaming bounded distances (drift)


def test_streaming_distances_match_batch_operator(spark, tmp_path):
    """The monitor's per-batch jsd/hellinger/tv equal the batch
    distribution_distance on (reference frame, batch frame) exactly —
    the stored p_raw profile + the replayed 9-dp term quantization."""
    from flink_rag_spark.operators.drift import distribution_distance
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
    stable = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                                   "value double")
    shifted = spark.createDataFrame([(999.0,)] * 50, "value double")
    stable.coalesce(1).write.parquet(str(src / "a"))
    shifted.coalesce(1).write.parquet(str(src / "b"))
    mets = str(tmp_path / "mets")
    stream = (spark.readStream.schema(stable.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = run_drift_monitor(spark, stream, ref_path, mets,
                          str(tmp_path / "cp"), available_now=True)
    assert q.awaitTermination(120)
    rows = spark.read.parquet(mets).collect()
    assert len(rows) == 2
    got = sorted((r["jsd"], r["hellinger"], r["tv"]) for r in rows)
    want = sorted(
        tuple(distribution_distance(ref_df, cur, "value", n_bins=5)
              .collect()[0][c] for c in ("jsd", "hellinger", "tv"))
        for cur in (stable, shifted))
    assert got == want
    # the stable batch reads as identical; the shifted one as disjoint
    assert got[0] == (0.0, 0.0, 0.0)
    assert got[1][2] == 0.8          # shifted mass shares only the top bin


# ----------------------------------------------- readability


def test_readability_hand_values(spark):
    """'Hello world. This is a test!': W=6, S=2, Y=7 ->
    ease 105.09, grade -0.653333; empty text -> NULL scores."""
    from flink_rag_spark.operators.quality import readability_scores

    d = spark.createDataFrame(
        [(1, "Hello world. This is a test!"), (2, "   "),
         (3, "no punctuation here")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           readability_scores(d).collect()}
    r = out[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 7)
    assert abs(r["flesch_ease"] - 105.09) < 1e-6
    assert abs(r["fk_grade"] - (-0.653333)) < 1e-6
    assert out[2]["n_words"] == 0 and out[2]["flesch_ease"] is None
    # zero [.!?] runs floor to one sentence
    assert out[3]["n_sentences"] == 1


def test_readability_duck_parity(spark):
    import duckdb as ddb

    from flink_rag_spark.operators.quality import (
        readability_scores, readability_scores_duck)

    d = spark.createDataFrame(
        [(1, "Hello world. This is a test!"), (2, "   "),
         (3, "Queueing THEORY, y'all!!! Onomatopoeia abounds?")],
        "doc_id bigint, text string")
    sp = sorted(tuple(r) for r in readability_scores(d).collect())
    con = ddb.connect()
    con.register("documents", d.toPandas())
    du = sorted(tuple(r) for r in
                con.sql(readability_scores_duck()).fetchall())
    assert sp == du


# ----------------------------------------------- McNemar's test


def test_mcnemar_hand_values(spark):
    """b=3, c=1 discordant -> continuity-corrected chi2 = 1.0/4 = 0.25;
    all-concordant -> NULL."""
    from flink_rag_spark.operators.hypothesis import mcnemar_test

    rows = ([(True, True)] * 4 + [(True, False)] * 3
            + [(False, True)] * 1 + [(False, False)] * 2)
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = mcnemar_test(df, "a", "b", 3.841).collect()[0]
    assert (r["n"], r["n_discordant_ab"], r["n_discordant_ba"]) == \
        (10, 3, 1)
    assert abs(r["chi2"] - 0.25) < 1e-9
    assert not r["significant"]
    conc = spark.createDataFrame([(True, True)] * 5,
                                 "a boolean, b boolean")
    r2 = mcnemar_test(conc, "a", "b", 3.841).collect()[0]
    assert r2["chi2"] is None and not r2["significant"]
    # heavy asymmetry is significant: b=20, c=0 -> (19)^2/20 = 18.05
    asym = spark.createDataFrame([(True, False)] * 20,
                                 "a boolean, b boolean")
    r3 = mcnemar_test(asym, "a", "b", 3.841).collect()[0]
    assert abs(r3["chi2"] - 18.05) < 1e-9 and r3["significant"]
