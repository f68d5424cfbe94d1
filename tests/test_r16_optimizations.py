"""Round-16 optimization invariants.

The r16 optimization round changed plan shapes, not math:

- build_nsw_index fuses each groupBy(src,dst).max(sim) → row_number
  stage into ONE window pass (lag-dedup + running count), valid because
  a duplicate (src,dst) row always carries the identical rounded sim
  (same vector pair, another shared cell / the symmetrize union) — so
  max() was pure dedup and duplicates sort adjacently under
  (sim DESC, dst ASC). Pin: the fused pass emits exactly the rows the
  groupBy-max + row_number pair did, including under adversarial
  duplicate/tie layouts.
- link_prediction broadcast-gates its |V|-bounded degree frame into the
  wedge build (SCORE_BROADCAST_MAX_NODES, the r15 graph-family idiom).
  Pin: both sides of the gate produce identical rows — degrees are
  exact integers and the AA terms are DECIMAL-quantized before the
  order-insensitive sum, so the gate is value-inert here.
- rm3's r15 persist was reverted (see test_r15_optimizations).
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from flink_rag_spark.operators import graph as G


def _pairs_with_dups(spark):
    """(src_id, dst_id, sim) with: exact duplicates (multi-cell
    co-occurrence), sim ties across DIFFERENT dst (rank-boundary ties),
    and a partition with more rows than the cap."""
    rows = [
        # src 1: dup of (1,2,0.9); tie 0.8 between dst 3 and 4; 5 below
        (1, 2, 0.9), (1, 2, 0.9), (1, 3, 0.8), (1, 4, 0.8), (1, 5, 0.7),
        # src 2: triple duplicate only
        (2, 7, 0.5), (2, 7, 0.5), (2, 7, 0.5),
        # src 3: all-distinct, exceeds cap
        (3, 1, 0.9), (3, 2, 0.8), (3, 4, 0.7), (3, 5, 0.6),
    ]
    return spark.createDataFrame(
        rows, "src_id bigint, dst_id bigint, sim double")


@pytest.mark.parametrize("cap", [1, 2, 3])
def test_nsw_fused_dedup_topn_matches_groupby_shape(spark, cap):
    df = _pairs_with_dups(spark)
    # reference: the pre-r16 two-exchange shape
    w = Window.partitionBy("src_id").orderBy(F.desc("sim"),
                                             F.col("dst_id"))
    ref = (df.groupBy("src_id", "dst_id").agg(F.max("sim").alias("sim"))
           .withColumn("_r", F.row_number().over(w))
           .filter(F.col("_r") <= cap).drop("_r"))
    # the shipped fused pass (module-internal helper shape, replicated
    # exactly as build_nsw_index constructs it)
    dup = F.coalesce(F.lag("dst_id").over(w) == F.col("dst_id"),
                     F.lit(False))
    rnk = F.sum(F.when(dup, 0).otherwise(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fused = (df.withColumn("_dup", dup).withColumn("_r", rnk)
             .filter((~F.col("_dup")) & (F.col("_r") <= cap))
             .drop("_dup", "_r"))
    assert sorted(map(tuple, ref.collect())) == \
           sorted(map(tuple, fused.collect()))


def test_nsw_build_rows_stable_under_fusion(spark, sf_smoke, tmp_path):
    """End-to-end pin: the fused build emits the same edge set (and
    the same entry points) as the operator contract requires —
    deterministic under re-build."""
    from flink_rag_spark.operators.nsw import build_nsw_index
    from flink_rag_spark.sources.tables import load_table
    emb = load_table(spark, sf_smoke, "embeddings")
    m1 = build_nsw_index(spark, emb, str(tmp_path / "i1"))
    m2 = build_nsw_index(spark, emb, str(tmp_path / "i2"))
    assert m1["entry_ids"] == m2["entry_ids"]
    e1 = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "i1") + "/edges")
        .select("src_id", "dst_id", "sim").collect()))
    e2 = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "i2") + "/edges")
        .select("src_id", "dst_id", "sim").collect()))
    assert e1 == e2
    # per-src degree caps hold: ≤ 2M after symmetrize
    import collections
    deg = collections.Counter(s for s, _, _ in e1)
    assert max(deg.values()) <= 2 * m1["m_neighbors"]


def test_link_prediction_broadcast_gate_value_inert(spark, monkeypatch):
    rows = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (1, 6)]
    pairs = spark.createDataFrame(rows, "u bigint, v bigint")
    wide = sorted(map(tuple, G.link_prediction(pairs, top_n=5).collect()))
    monkeypatch.setattr(G, "SCORE_BROADCAST_MAX_NODES", 0)
    narrow = sorted(map(tuple,
                        G.link_prediction(pairs, top_n=5).collect()))
    assert wide == narrow
