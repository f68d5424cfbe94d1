"""Round-15 optimization invariants.

The r15 optimization round changed ITERATION MECHANICS, not math:
pagerank/personalized_pagerank/hits/community_labels fold their driver
scalars in-plan and broadcast the |V|-bounded score frame into the edge
join behind a node-count gate (SCORE_BROADCAST_MAX_NODES). These tests
pin the invariants the optimizations must preserve:

- both sides of the broadcast gate produce IDENTICAL rows AT THE
  OPERATORS' ROUNDED OUTPUT CONTRACT. For integer-vote LPA the gate is
  provably value-inert; for the float-scored operators (pagerank, ppr,
  hits) the broadcast-vs-shuffle join can reorder the rows feeding a
  double partial sum, so last-ulp differences across the gate are
  possible and are absorbed by the terminal 6-dp round these tests
  compare (r15 ADVICE: a tie-boundary value could in principle flip a
  rounded digit at scale — the gate's claim is "identical up to
  float-sum ordering under the documented rounding", not bit identity
  of the unrounded doubles). The dangling-graph case exercises the
  in-plan dangling-mass broadcast;
- rm3_expanded_topk leaves no persisted blocks behind (its r15 persist
  was reverted in r16 — see its docstring for the paired numbers).
"""

import pyspark.sql.functions as F
import pytest

from flink_rag_spark.operators import graph as G


def _dangling_edges(spark):
    # 0→1→2→3, 4→1, 3 has no out-edges (dangling); weights 1..4
    rows = [(0, 1, 1), (1, 2, 2), (2, 3, 3), (4, 1, 4)]
    return spark.createDataFrame(rows, "src bigint, dst bigint, w int")


def _symmetric_edges(spark):
    und = [(0, 1, 2), (1, 2, 1), (2, 3, 5), (3, 0, 1), (0, 2, 2)]
    df = spark.createDataFrame(und, "src bigint, dst bigint, w int")
    return df.union(df.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst"), "w"))


@pytest.mark.parametrize("weight", [None, "w"])
def test_pagerank_broadcast_gate_value_inert(spark, monkeypatch, weight):
    edges = _dangling_edges(spark)
    wide = sorted(G.pagerank(edges, iters=4, weight=weight).collect())
    monkeypatch.setattr(G, "SCORE_BROADCAST_MAX_NODES", 0)
    narrow = sorted(G.pagerank(edges, iters=4, weight=weight).collect())
    assert wide == narrow


def test_ppr_broadcast_gate_value_inert(spark, monkeypatch):
    edges = _dangling_edges(spark)
    wide = sorted(G.personalized_pagerank(
        edges, [0, 4], iters=4).collect())
    monkeypatch.setattr(G, "SCORE_BROADCAST_MAX_NODES", 0)
    narrow = sorted(G.personalized_pagerank(
        edges, [0, 4], iters=4).collect())
    assert wide == narrow


def test_hits_broadcast_gate_value_inert(spark, monkeypatch):
    edges = _dangling_edges(spark)
    wide = sorted(G.hits(edges, iters=4).collect())
    monkeypatch.setattr(G, "SCORE_BROADCAST_MAX_NODES", 0)
    narrow = sorted(G.hits(edges, iters=4).collect())
    assert wide == narrow


def test_lpa_broadcast_gate_value_inert(spark, monkeypatch):
    edges = _symmetric_edges(spark).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b"), "w")
    wide = sorted(G.community_labels(edges, weight="w").collect())
    monkeypatch.setattr(G, "SCORE_BROADCAST_MAX_NODES", 0)
    narrow = sorted(G.community_labels(edges, weight="w").collect())
    assert wide == narrow


def test_rm3_leaves_no_persisted_blocks(spark):
    """r16: the r15 orig-frame persist was REVERTED (same-day paired
    medians read the unpersisted plan faster — see rm3_expanded_topk's
    docstring). Pin the new contract: the operator neither records
    cached deps nor leaves persisted RDDs behind after materializing."""
    from flink_rag_spark.operators.ranking import rm3_expanded_topk
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} " + ("alpha " * (i % 3)))
         for i in range(40)], "doc_id bigint, text string")
    out = rm3_expanded_topk(docs, ["alpha", "beta"], k=5)
    rows = out.collect()
    assert len(rows) == 5
    assert not getattr(out, "_cached_deps", [])
    # plan-based check (global persisted-RDD counts are racy under
    # ContextCleaner): nothing in the rm3 plan reads a cached relation
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan
