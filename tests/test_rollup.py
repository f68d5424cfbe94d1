"""Incrementally-maintained rollup (operators/rollup.py): exact merge
equivalence, partition-pruned maintenance, dynamic-overwrite isolation of
untouched partitions, cold start."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from flink_rag_spark.operators.rollup import (
    append_to_rollup,
    build_rollup,
    read_rollup,
)


def _events(spark, rows):
    # rows: (event_id, "YYYY-MM-DD HH:MM:SS", user_id, value)
    return spark.createDataFrame(
        [(i, ts, u, v) for (i, ts, u, v) in rows],
        "event_id long, ts_s string, user_id long, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "value")


@pytest.fixture()
def three_days(spark):
    rows = []
    eid = 0
    for d in (1, 2, 3):
        for h in (0, 5, 13):
            for u in (10, 20):
                for k in range(3):
                    rows.append((eid, f"2024-03-0{d} {h:02d}:{10*k:02d}:00",
                                 u, float(d * 100 + h + k)))
                    eid += 1
    return _events(spark, rows)


def _rows(df):
    return {tuple(r) for r in
            df.select("bucket_ts", "user_id", "cnt", "sum_value",
                      "avg_value").collect()}


def test_incremental_equals_full_rebuild(spark, three_days, tmp_path):
    """build(history) + append(last day) must equal build(everything) —
    the merge is exact, not approximate."""
    e = three_days
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    cutoff = "2024-03-03 00:00:00"
    build_rollup(spark, e.filter(F.col("ts") < cutoff), inc,
                 keys=["user_id"])
    touched = append_to_rollup(spark, e.filter(F.col("ts") >= cutoff), inc,
                               keys=["user_id"])
    assert touched == ["2024-03-03"]
    build_rollup(spark, e, full, keys=["user_id"])
    got = _rows(read_rollup(spark, inc, keys=["user_id"]))
    want = _rows(read_rollup(spark, full, keys=["user_id"]))
    assert got == want and len(got) == 3 * 3 * 2  # days × hours × users


def test_untouched_partitions_not_rewritten(spark, three_days, tmp_path):
    """Dynamic partition overwrite: appending day-3 events must leave the
    day-1/day-2 partition FILES byte-identical in place (same paths, same
    mtimes) — the maintenance cost is O(touched), not O(history)."""
    e = three_days
    path = str(tmp_path / "r")
    build_rollup(spark, e.filter(F.col("ts") < "2024-03-03"), path,
                 keys=["user_id"])

    def snapshot(day):
        return {f: os.path.getmtime(f) for f in
                glob.glob(f"{path}/pday={day}/*.parquet")}

    before = {d: snapshot(d) for d in ("2024-03-01", "2024-03-02")}
    assert all(before.values())
    append_to_rollup(spark, e.filter(F.col("ts") >= "2024-03-03"), path,
                     keys=["user_id"])
    for d, snap in before.items():
        assert snapshot(d) == snap, f"partition {d} was rewritten"
    assert glob.glob(f"{path}/pday=2024-03-03/*.parquet")


def test_append_merges_within_touched_partition(spark, three_days, tmp_path):
    """A batch overlapping existing buckets re-merges them (one row per
    bucket/key, counts summed) rather than duplicating rows."""
    e = three_days
    path = str(tmp_path / "r")
    build_rollup(spark, e, path, keys=["user_id"])
    # replay day 3 again: counts for day-3 buckets must double, row count
    # must stay the same
    base = _rows(read_rollup(spark, path, keys=["user_id"]))
    append_to_rollup(spark, e.filter(F.col("ts") >= "2024-03-03"), path,
                     keys=["user_id"])
    after = read_rollup(spark, path, keys=["user_id"])
    assert after.count() == len(base)
    d3 = after.filter(F.col("bucket_ts") >= "2024-03-03").collect()
    assert all(r["cnt"] == 6 for r in d3)  # 3 originals + 3 replayed


def test_cold_start_append_without_build(spark, three_days, tmp_path):
    path = str(tmp_path / "r")
    touched = append_to_rollup(spark, three_days, path, keys=["user_id"])
    assert touched == ["2024-03-01", "2024-03-02", "2024-03-03"]
    assert read_rollup(spark, path, keys=["user_id"]).count() == 18


def test_empty_batch_is_a_noop(spark, three_days, tmp_path):
    path = str(tmp_path / "r")
    build_rollup(spark, three_days, path, keys=["user_id"])
    before = _rows(read_rollup(spark, path, keys=["user_id"]))
    touched = append_to_rollup(
        spark, three_days.filter(F.lit(False)), path, keys=["user_id"])
    assert touched == []
    assert _rows(read_rollup(spark, path, keys=["user_id"])) == before


# ---------------------------------------------------- streaming maintenance


def test_streaming_rollup_matches_batch(spark, three_days, tmp_path):
    """run_rollup over a file stream drains to the same rollup a one-shot
    batch build produces; a second drain with new files merges them in."""
    from flink_rag_spark.streaming.rollup_job import run_rollup

    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "roll")
    full = str(tmp_path / "full")
    d12 = three_days.filter(F.col("ts") < "2024-03-03")
    d3 = three_days.filter(F.col("ts") >= "2024-03-03")
    d12.write.parquet(str(src / "b1"))

    cp = str(tmp_path / "cp")  # ONE checkpoint across drains: the second
    # run is a restart of the same job and must only see the new files

    def drain():
        stream = (spark.readStream.schema(three_days.schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = run_rollup(spark, stream, path, cp, keys=["user_id"],
                       bucket="1 hour", available_now=True)
        assert q.awaitTermination(120)

    drain()
    d3.write.parquet(str(src / "b2"))
    drain()

    build_rollup(spark, three_days, full, keys=["user_id"])
    got = _rows(read_rollup(spark, path, keys=["user_id"]))
    want = _rows(read_rollup(spark, full, keys=["user_id"]))
    assert got == want and got


def test_streaming_rollup_replay_marker_skips(spark, three_days, tmp_path):
    """The fast-path guard: a batch id at or below the recorded
    last-applied id is skipped without even computing partials."""
    import os

    from flink_rag_spark.streaming.rollup_job import run_rollup

    src = tmp_path / "src"
    src.mkdir()
    three_days.write.parquet(str(src / "b1"))
    path = str(tmp_path / "roll")
    os.makedirs(path + "_applied", exist_ok=True)
    open(path + "_applied/latest", "w").write("0")  # pretend batch 0 ran

    stream = spark.readStream.schema(three_days.schema).parquet(str(src / "*"))
    q = run_rollup(spark, stream, path, str(tmp_path / "cp"),
                   keys=["user_id"], available_now=True)
    assert q.awaitTermination(120)
    assert not os.path.exists(path)  # merge skipped — nothing written


def test_replay_without_marker_is_idempotent(spark, three_days, tmp_path):
    """The round-7 guarantee: replaying a committed batch id with NO
    fast-path marker present (the crash-between-commit-and-marker window)
    is a no-op, because the applied ids live in the rollup partitions
    themselves. The replayed pdays' files are not even rewritten."""
    e = three_days
    path = str(tmp_path / "r")
    build_rollup(spark, e.filter(F.col("ts") < "2024-03-03"), path,
                 keys=["user_id"])
    d3 = e.filter(F.col("ts") >= "2024-03-03")
    touched = append_to_rollup(spark, d3, path, keys=["user_id"],
                               batch_id=7)
    assert touched == ["2024-03-03"]
    want = _rows(read_rollup(spark, path, keys=["user_id"]))
    files = {f: os.path.getmtime(f) for f in
             glob.glob(f"{path}/pday=2024-03-03/*.parquet")}

    # replay the same batch id — marker file does not exist in this test
    retouched = append_to_rollup(spark, d3, path, keys=["user_id"],
                                 batch_id=7)
    assert retouched == []
    assert _rows(read_rollup(spark, path, keys=["user_id"])) == want
    assert {f: os.path.getmtime(f) for f in
            glob.glob(f"{path}/pday=2024-03-03/*.parquet")} == files

    # a genuinely new batch id over the same pday still merges, and its
    # marker accumulates both ids
    append_to_rollup(spark, d3, path, keys=["user_id"], batch_id=8)
    after = read_rollup(spark, path, keys=["user_id"])
    assert all(r["cnt"] == 6 for r in
               after.filter(F.col("bucket_ts") >= "2024-03-03").collect())
    marks = (spark.read.option("mergeSchema", "true").parquet(path)
             .filter(F.col("bids").isNotNull())
             .filter(F.col("pday") == "2024-03-03").collect())
    assert len(marks) == 1 and sorted(marks[0]["bids"]) == [7, 8]


def test_replay_partial_pday_overlap(spark, three_days, tmp_path):
    """A replayed batch spanning several pdays no-ops per PARTITION: pdays
    it already committed are skipped, genuinely new pdays still merge —
    matching the full-history oracle either way."""
    e = three_days
    path = str(tmp_path / "r")
    full = str(tmp_path / "full")
    d23 = e.filter(F.col("ts") >= "2024-03-02")
    append_to_rollup(spark, e.filter(F.col("ts") < "2024-03-02"), path,
                     keys=["user_id"], batch_id=1)
    append_to_rollup(spark, d23, path, keys=["user_id"], batch_id=2)
    # replay batch 2 — both its pdays already carry id 2
    assert append_to_rollup(spark, d23, path, keys=["user_id"],
                            batch_id=2) == []
    build_rollup(spark, e, full, keys=["user_id"])
    assert _rows(read_rollup(spark, path, keys=["user_id"])) == \
        _rows(read_rollup(spark, full, keys=["user_id"]))


def test_cascade_from_partials_matches_direct(spark, three_days, tmp_path):
    """Daily-from-stored-hourly must equal a direct daily rollup built
    from raw events (the cascade is exact: sums of sums)."""
    from flink_rag_spark.operators.rollup import rollup_cascade

    hourly = str(tmp_path / "h")
    daily = str(tmp_path / "d")
    build_rollup(spark, three_days, hourly, keys=["user_id"],
                 bucket="1 hour")
    build_rollup(spark, three_days, daily, keys=["user_id"],
                 bucket="1 day")
    got = _rows(rollup_cascade(spark, hourly, "1 day", keys=["user_id"]))
    want = _rows(read_rollup(spark, daily, keys=["user_id"]))
    assert got == want and len(got) == 3 * 2  # days × users


def test_hll_sketch_partials_merge_exactly(spark, three_days, tmp_path):
    """Incremental sketch maintenance must equal a from-scratch build:
    HLL union is associative/idempotent, so the estimate served from the
    maintained store matches the full rebuild's, and the daily cascade
    re-merges the stored hourly sketches."""
    from flink_rag_spark.operators.rollup import (
        append_to_rollup,
        build_rollup,
        read_rollup,
        rollup_cascade,
    )
    e = three_days
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_rollup(spark, e.filter(F.col("ts") < "2024-03-03"), inc,
                 keys=["user_id"], distinct_col="event_id")
    append_to_rollup(spark, e.filter(F.col("ts") >= "2024-03-03"), inc,
                     keys=["user_id"], distinct_col="event_id")
    build_rollup(spark, e, full, keys=["user_id"],
                 distinct_col="event_id")

    def rows(path):
        return {(r["bucket_ts"], r["user_id"], r["cnt"],
                 r["approx_distinct"]) for r in
                read_rollup(spark, path, keys=["user_id"]).collect()}

    got, want = rows(inc), rows(full)
    assert got == want and got
    # distinct event ids per (hour, user) is exactly 3 in the fixture —
    # at this cardinality the sketch is exact
    assert all(a == 3 for (_, _, _, a) in got)
    # the cascade re-merges sketches: daily distinct = 9 per user-day
    daily = rollup_cascade(spark, inc, "1 day", keys=["user_id"])
    assert all(r["approx_distinct"] == 9 for r in daily.collect())


def test_streaming_rollup_with_sketches(spark, three_days, tmp_path):
    """The streaming maintenance path carries the HLL sketch partial too:
    the drained rollup's per-bucket estimate equals a batch build's."""
    from flink_rag_spark.operators.rollup import rollup_cascade
    from flink_rag_spark.streaming.rollup_job import run_rollup

    src = tmp_path / "src"
    src.mkdir()
    three_days.write.parquet(str(src / "b1"))
    path = str(tmp_path / "roll")
    stream = (spark.readStream.schema(three_days.schema)
              .parquet(str(src / "*")))
    q = run_rollup(spark, stream, path, str(tmp_path / "cp"),
                   keys=["user_id"], available_now=True,
                   distinct_col="event_id")
    assert q.awaitTermination(120)
    full = str(tmp_path / "full")
    build_rollup(spark, three_days, full, keys=["user_id"],
                 distinct_col="event_id")

    def est(p):
        return {(r["bucket_ts"], r["user_id"], r["approx_distinct"])
                for r in read_rollup(spark, p, keys=["user_id"]).collect()}

    assert est(path) == est(full) and est(path)
    # cascade over the streamed store still re-merges sketches
    assert all(r["approx_distinct"] == 9 for r in
               rollup_cascade(spark, path, "1 day",
                              keys=["user_id"]).collect())
