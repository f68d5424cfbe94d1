"""Unit tests: sequence packing (operators/packing.py), mixture sampling
(operators/curation.py:mixture_sample), time-weighted average
(operators/timeseries.py:time_weighted_avg). Semantics beyond the oracle
sweep: budget respect, overlong docs, mixture ratios, hand-computed TWA."""

import pyspark.sql.functions as F
import pytest

from flink_rag_spark.operators.curation import mixture_sample
from flink_rag_spark.operators.packing import pack_documents, pack_stats
from flink_rag_spark.operators.timeseries import time_weighted_avg


def _docs(spark, toks_per_doc):
    # doc i gets exactly toks_per_doc[i] single-char tokens
    return spark.createDataFrame(
        [(i, " ".join(["x"] * n)) for i, n in enumerate(toks_per_doc)],
        "doc_id long, text string")


def test_packs_respect_budget_and_order(spark):
    # one shard → pure sequential greedy: 40+40 | 90 | 100 | 30+50 | 60
    df = _docs(spark, [40, 40, 90, 100, 30, 50, 60])
    out = pack_documents(df, "text", "doc_id", budget=100, n_shards=1,
                         shard_expr=F.lit(0)).collect()
    by_id = {r["doc_id"]: r for r in sorted(out, key=lambda r: r["doc_id"])}
    packs = [by_id[i]["pack_id"] for i in range(7)]
    assert packs == ["0_0", "0_0", "0_1", "0_2", "0_3", "0_3", "0_4"]
    # final row of each pack carries the pack total
    assert by_id[1]["pack_tokens"] == 80
    assert by_id[5]["pack_tokens"] == 80
    # no pack built from >1 doc exceeds the budget
    totals: dict = {}
    for r in out:
        totals.setdefault(r["pack_id"], []).append(r["tok"])
    for _pid, toks in totals.items():
        assert len(toks) == 1 or sum(toks) <= 100


def test_overlong_doc_gets_own_pack_never_dropped(spark):
    df = _docs(spark, [10, 500, 10])
    out = {r["doc_id"]: r["pack_id"] for r in
           pack_documents(df, "text", "doc_id", budget=100, n_shards=1,
                          shard_expr=F.lit(0)).collect()}
    assert len(out) == 3  # nothing dropped
    assert out[0] != out[1] != out[2]  # the 500-token doc packs alone


def test_pack_stats_fill_ratio(spark):
    df = _docs(spark, [50, 50, 50, 50])  # two full packs in one shard
    packed = pack_documents(df, "text", "doc_id", budget=100, n_shards=1,
                            shard_expr=F.lit(0))
    s = pack_stats(packed, budget=100).collect()[0]
    assert s["n_packs"] == 2 and s["mean_fill"] == 1.0


def test_mixture_ratios_and_determinism(spark):
    rows = ([(i, f"text number {i} alpha", "a") for i in range(4000)]
            + [(10_000 + i, f"text number {i} beta", "b")
               for i in range(1000)])
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    out = mixture_sample(df, "dom", "text", {"a": 0.5, "b": 0.5})
    counts = {r["dom"]: r["cnt"] for r in
              out.groupBy("dom").agg(F.count(F.lit(1)).alias("cnt"))
              .collect()}
    # b is the bottleneck domain: kept in full (p = 1.0 exactly)
    assert counts["b"] == 1000
    # a downsampled to ≈1000 (binomial, hash-deterministic)
    assert 850 <= counts["a"] <= 1150
    # deterministic: identical output on a re-run
    again = mixture_sample(df, "dom", "text", {"a": 0.5, "b": 0.5})
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_mixture_rejects_bad_targets(spark):
    df = spark.createDataFrame([(1, "t", "a")],
                               "doc_id long, text string, dom string")
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "dom", "text", {"a": -1.0})
    with pytest.raises(ValueError, match="absent"):
        mixture_sample(df, "dom", "text", {"a": 0.5, "zz": 0.5})


def test_time_weighted_avg_hand_computed(spark):
    # one user, one day: v=10 for 6h, v=20 for 12h, v=40 for the last 6h
    rows = [(1, "2024-03-01 00:00:00", 7, 10.0),
            (2, "2024-03-01 06:00:00", 7, 20.0),
            (3, "2024-03-01 18:00:00", 7, 40.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "value")
    out = time_weighted_avg(df, "ts", "value", keys=["user_id"],
                            bucket="1 day",
                            order_tiebreak="event_id").collect()
    assert len(out) == 1
    r = out[0]
    # (10·6 + 20·12 + 40·6) / 24 = 540/24 = 22.5  — plain AVG says 23.33
    assert r["twa"] == 22.5
    assert r["n_samples"] == 3 and r["covered_sec"] == 86400


def test_packing_property_matches_python_model(spark):
    """Property test: for random token-length sequences and budgets, the
    distributed per-shard fold equals a pure-Python greedy model exactly
    (assignment AND running totals), and global invariants hold — nothing
    dropped, multi-doc packs within budget, pack ids contiguous from 0."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    toks = st.lists(st.integers(min_value=1, max_value=120),
                    min_size=1, max_size=40)
    budgets = st.integers(min_value=10, max_value=200)

    def model(ts, budget):
        packs, totals, pack, acc = [], [], 0, 0
        for t in ts:
            if acc > 0 and acc + t > budget:
                pack += 1
                acc = 0
            acc += t
            packs.append(pack)
            totals.append(acc)
        return packs, totals

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(ts=toks, budget=budgets)
    def check(ts, budget):
        df = _docs(spark, ts)
        out = sorted(
            pack_documents(df, "text", "doc_id", budget=budget,
                           n_shards=1, shard_expr=F.lit(0)).collect(),
            key=lambda r: r["doc_id"])
        packs, totals = model(ts, budget)
        assert [r["pack_id"] for r in out] == [f"0_{p}" for p in packs]
        assert [r["pack_tokens"] for r in out] == totals
        assert len(out) == len(ts)
        assert sorted({r["pack_id"] for r in out}) == sorted(
            {f"0_{p}" for p in range(packs[-1] + 1)})

    check()
