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
