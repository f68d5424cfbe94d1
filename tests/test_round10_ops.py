"""Round-10 operator tests: hub-basket bound for pair rules, the fused
FK-audit plan's edge cases, IVF-PQ staged-geometry promotion, CEP
negation, and the round's new families."""

import duckdb
import pytest

from tests.oracle_check import canon


# ----------------------------------------- hub-basket guard (r9 verdict)

def test_itemset_pair_rules_hub_basket_bounded(spark):
    from flink_rag_spark.operators.association import (
        itemset_pair_rules, itemset_pair_rules_duck)
    # one adversarial hub basket (200 items) + two small baskets; the
    # cap must bound the hub's pair contribution at C(cap,2), never
    # C(200,2)=19900
    rows = [(0, f"i{k:03d}") for k in range(200)]
    rows += [(1, "i001"), (1, "i002"), (2, "i001"), (2, "i002")]
    df = spark.createDataFrame(rows, "b bigint, i string")
    out = itemset_pair_rules(df, "b", "i", min_pair_count=1,
                             max_basket_items=16)
    pairs = out.collect()
    undirected = {tuple(sorted((r["item_a"], r["item_b"])))
                  for r in pairs}
    assert len(undirected) <= 120 + 1  # C(16,2) + the small-basket pair
    assert len(undirected) >= 100      # the hub still contributes
    # deterministic: a second run yields the identical frame
    again = itemset_pair_rules(df, "b", "i", min_pair_count=1,
                               max_basket_items=16)
    assert canon(out.toPandas()) == canon(again.toPandas())
    # the DuckDB mirror replays the SAME hash-ordered cap bit-identically
    con = duckdb.connect()
    con.register("hub_src", df.toPandas())
    duck = con.execute(itemset_pair_rules_duck(
        "SELECT * FROM hub_src", "b", "i", min_pair_count=1,
        max_basket_items=16)).fetchdf()
    assert canon(out.toPandas()) == canon(duck)


def test_itemset_pair_rules_cap_disabled_matches_small_baskets(spark):
    from flink_rag_spark.operators.association import itemset_pair_rules
    # baskets under the cap are untouched: default cap ≡ cap disabled
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "b bigint, i string")
    capped = itemset_pair_rules(df, "b", "i", min_pair_count=1)
    uncapped = itemset_pair_rules(df, "b", "i", min_pair_count=1,
                                  max_basket_items=None)
    assert canon(capped.toPandas()) == canon(uncapped.toPandas())


# --------------------------------- batch ADC n_probe clamp (r9 advice)

def _clustered(spark, n_per=15, dim=16, dtype="double"):
    rows = []
    vid = 0
    for cx, cy in ((0.0, 5.0), (5.0, 0.0)):
        for _ in range(n_per):
            v = [(cx if d % 2 == 0 else cy)
                 + ((vid * 13 + d * 7) % 23) / 50.0 for d in range(dim)]
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(
        rows, f"vec_id bigint, embedding array<{dtype}>")


def test_ivfpq_knn_join_clamps_n_probe_to_cell_count(spark, tmp_path):
    """n_probe larger than the cell count must degrade gracefully
    (probe every cell) exactly like single-query ivfpq_topk — not raise
    a length mismatch building the probe-pair frames."""
    import numpy as np
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.pq import (build_ivfpq_index,
                                              ivfpq_knn_join, ivfpq_topk)
    emb = _clustered(spark)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, emb, idx, n_centroids=2, m=4, kc=4, iters=3)
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in
             emb.filter(F.col("vec_id").isin(4, 21)).collect()}
    qids = sorted(qvecs)
    Q = np.asarray([qvecs[i] for i in qids])
    batch = {(r["query_id"], r["rank"]): (r["vec_id"], r["score"])
             for r in ivfpq_knn_join(spark, idx, (qids, Q), emb, k=5,
                                     n_probe=8).collect()}
    for qid in qids:
        single = {r["rank"]: (r["vec_id"], r["score"]) for r in
                  ivfpq_topk(spark, idx, qvecs[qid], emb, k=5,
                             n_probe=8).collect()}
        for rank, want in single.items():
            assert batch[(qid, rank)] == want, (qid, rank)


def test_append_to_ivfpq_index_missing_cells_dir(spark, tmp_path):
    """Geometry files without a cells directory (partially restored
    index) must be treated as an empty index, not a failed read."""
    import shutil

    from flink_rag_spark.operators.pq import (append_to_ivfpq_index,
                                              build_ivfpq_index)
    emb = _clustered(spark)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, emb.filter("vec_id < 20"), idx,
                      n_centroids=4, m=4, kc=4, iters=3)
    shutil.rmtree(f"{idx}/cells")
    assert append_to_ivfpq_index(
        spark, emb.filter("vec_id >= 20"), idx) == 10
    ids = sorted(r["vec_id"] for r in
                 spark.read.parquet(f"{idx}/cells").collect())
    assert ids == list(range(20, 30))


# ------------------------------------------- fused FK audit (r9 verdict)

def test_fk_integrity_audit_empty_facts(spark):
    from flink_rag_spark.operators.validation import fk_integrity_audit
    facts = spark.createDataFrame([], "id bigint, fk bigint")
    dims = spark.createDataFrame([(10,)], "k bigint")
    r = fk_integrity_audit([("f_d", facts, "fk", dims, "k")]).collect()[0]
    assert r["n_rows"] == 0
    assert r["n_null_keys"] == 0
    assert r["n_orphans"] == 0
    assert r["orphan_rate"] == 0.0


def test_fk_integrity_audit_multi_relation_single_frame(spark):
    from flink_rag_spark.operators.validation import fk_integrity_audit
    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id bigint, fk bigint")
    dims = spark.createDataFrame([(10,), (20,)], "k bigint")
    dims2 = spark.createDataFrame([(99,), (10,)], "k bigint")
    out = fk_integrity_audit([
        ("f_d", facts, "fk", dims, "k"),
        ("f_d2", facts, "fk", dims2, "k"),
    ])
    rows = {r["relation"]: r for r in out.collect()}
    assert rows["f_d"]["n_orphans"] == 1       # fk=99
    assert rows["f_d"]["orphan_rate"] == 0.25
    assert rows["f_d2"]["n_orphans"] == 1      # fk=20
    assert rows["f_d2"]["n_null_keys"] == 1
    # one lazy frame, |relations| rows — not |relations| driver actions
    assert out.count() == 2
