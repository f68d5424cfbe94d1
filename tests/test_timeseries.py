"""Unit tests for the gap-fill operator (operators/timeseries.py): exact
LOCF / linear-interpolation values on a crafted series, single-observation
keys, and the sparse-key bucket cap."""

import datetime as dt

import pytest

from flink_rag_spark.operators.timeseries import gapfill_locf_interp


def _series(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, h), v) for u, h, v in rows],
        "user_id int, bucket timestamp, obs double")


def test_gapfill_locf_and_linear_values(spark):
    # user 1: obs at hour 0 (10.0) and hour 4 (30.0) — three gap buckets
    filled = gapfill_locf_interp(
        _series(spark, [(1, 0, 10.0), (1, 4, 30.0)]),
        ["user_id"], "bucket", "obs", step="1 hour")
    rows = {r["bucket"].hour: r for r in filled.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert [rows[h]["locf"] for h in range(5)] == [10.0, 10.0, 10.0, 10.0, 30.0]
    assert [round(rows[h]["interp"], 6) for h in range(5)] == \
           [10.0, 15.0, 20.0, 25.0, 30.0]
    # observed buckets keep their observation; gaps have null obs
    assert rows[0]["obs"] == 10.0 and rows[2]["obs"] is None


def test_gapfill_single_observation_key(spark):
    filled = gapfill_locf_interp(
        _series(spark, [(7, 3, 5.5)]),
        ["user_id"], "bucket", "obs", step="1 hour").collect()
    assert len(filled) == 1
    r = filled[0]
    assert r["locf"] == 5.5 and r["interp"] == 5.5 and r["obs"] == 5.5


def test_gapfill_multiple_keys_are_independent(spark):
    filled = gapfill_locf_interp(
        _series(spark, [(1, 0, 1.0), (1, 2, 3.0), (2, 5, 9.0), (2, 6, 11.0)]),
        ["user_id"], "bucket", "obs", step="1 hour")
    got = {(r["user_id"], r["bucket"].hour): r["interp"]
           for r in filled.collect()}
    # user 1 grid is hours 0-2, user 2 grid is hours 5-6 — no bleed
    assert set(got) == {(1, 0), (1, 1), (1, 2), (2, 5), (2, 6)}
    assert got[(1, 1)] == 2.0


def test_gapfill_sparse_key_cap_raises(spark):
    """The budget guard rides inside the grid expression (raise_error in
    the sequence bound), so it fires at execution time on the offending
    key — no extra pre-scan job."""
    wide = _series(spark, [(1, 0, 1.0)]).union(spark.createDataFrame(
        [(1, dt.datetime(2030, 1, 1), 2.0)],
        "user_id int, bucket timestamp, obs double"))
    out = gapfill_locf_interp(wide, ["user_id"], "bucket", "obs",
                              step="1 hour", max_buckets=1000)
    with pytest.raises(Exception, match="buckets for one key"):
        out.collect()


def test_gapfill_week_step_and_bad_unit(spark):
    """'1 week' must work (ADVICE round 4: the unit map ended at day) and
    an unknown unit must raise a descriptive ValueError, not a KeyError."""
    s = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0),
         (1, dt.datetime(2024, 1, 29), 5.0)],
        "user_id int, bucket timestamp, obs double")
    filled = gapfill_locf_interp(s, ["user_id"], "bucket", "obs",
                                 step="1 week")
    rows = sorted(filled.collect(), key=lambda r: r["bucket"])
    assert len(rows) == 5  # Jan 1, 8, 15, 22, 29
    assert rows[2]["interp"] == 3.0  # midpoint of the linear fill
    with pytest.raises(ValueError, match="unsupported gapfill step unit"):
        gapfill_locf_interp(s, ["user_id"], "bucket", "obs",
                            step="1 fortnight")


def test_gapfill_plan_has_no_quadratic_frame(spark):
    """Regression pin for the round-5 fix: the fill must use RUNNING
    frames only — a (currentRow -> unboundedFollowing) frame re-aggregates
    the tail per row (O(buckets^2) per key, measured 10x at sf0.1)."""
    filled = gapfill_locf_interp(
        _series(spark, [(1, 0, 1.0), (1, 5, 2.0)]),
        ["user_id"], "bucket", "obs", step="1 hour")
    plan = filled._jdf.queryExecution().executedPlan().toString()
    assert "unboundedfollowing" not in plan.lower()
    assert "unboundedpreceding" in plan.lower()  # the running frames
