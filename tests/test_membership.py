"""Unit tests for bloom membership pre-filtering (operators/membership.py):
exact equivalence with the plain anti join, the no-false-negative
guarantee, pruning effectiveness, and null-key semantics."""

import pyspark.sql.functions as F

from flink_rag_spark.operators.membership import (
    build_bloom,
    decontaminate_exact,
    with_bloom_maybe,
)


def _frames(spark):
    train = spark.createDataFrame(
        [(i, i * 37 % 5000) for i in range(4000)], "row_id long, key long")
    bench = spark.createDataFrame(
        [(j * 37 % 5000,) for j in range(0, 4000, 40)], "key long")
    return train, bench


def test_decontaminate_matches_plain_anti_join(spark):
    train, bench = _frames(spark)
    got = sorted(r["row_id"] for r in
                 decontaminate_exact(train, bench, "key").collect())
    want = sorted(r["row_id"] for r in
                  train.join(bench, on="key", how="left_anti").collect())
    assert got == want and 0 < len(got) < 4000


def test_bloom_has_no_false_negatives(spark):
    _, bench = _frames(spark)
    bloom = build_bloom(bench, "key")
    flags = with_bloom_maybe(bench, "key", bloom).collect()
    assert all(r["bloom_maybe"] for r in flags)


def test_bloom_prunes_nonmembers(spark):
    # disjoint key spaces: every train row is a non-member, so the maybe
    # rate IS the false-positive rate — must be far below 100% (that is
    # the entire point of the pre-filter) and near the 1% target
    train = spark.createDataFrame([(i,) for i in range(100000, 104000)],
                                  "key long")
    bench = spark.createDataFrame([(i,) for i in range(100)], "key long")
    bloom = build_bloom(bench, "key", fpp=0.01)
    n_maybe = (with_bloom_maybe(train, "key", bloom)
               .filter(F.col("bloom_maybe")).count())
    assert n_maybe / 4000 < 0.05


def test_null_keys_are_kept_and_probe_false(spark):
    train = spark.createDataFrame([(1, 10), (2, None), (3, 20)],
                                  "row_id long, key long")
    bench = spark.createDataFrame([(10,)], "key long")
    bloom = build_bloom(bench, "key")
    flags = {r["row_id"]: r["bloom_maybe"] for r in
             with_bloom_maybe(train, "key", bloom).collect()}
    assert flags[2] is False
    kept = sorted(r["row_id"] for r in
                  decontaminate_exact(train, bench, "key").collect())
    assert kept == [2, 3]  # row 1 is a member; the null-key row survives


def test_probe_pass_runs_once_in_plan(spark):
    """The bloom probe (an opaque MapInPandas stage) must appear exactly
    once in the executed plan — the round-4 two-branch union executed the
    full probe pass per branch (ADVICE medium)."""
    train, bench = _frames(spark)
    out = decontaminate_exact(train, bench, "key")
    out.collect()  # materialize so the adaptive plan is final
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert final.count("MapInPandas") == 1
