"""Round-13 operator tests: NSW right-to-be-forgotten plus the round's
new operator families."""

import duckdb
import pytest


# ------------------------------------------------------ NSW RTBF


def test_nsw_forget_documents(spark, sf_smoke, tmp_path):
    """After ``forget_in_nsw_index`` a probe can NEVER return a
    forgotten id (its vector row — the scoring surface — is gone), the
    index still fills to k and meets the recall floor against the exact
    tier ON THE SURVIVING CORPUS, forgotten entry points leave
    meta.json, and the pass is reentrant (second call removes 0)."""
    import json
    import os

    import pyspark.sql.functions as F

    from flink_rag_spark.operators.maintenance import forget_in_nsw_index
    from flink_rag_spark.operators.nsw import (build_nsw_index,
                                               nsw_knn_join, nsw_topk)
    from flink_rag_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    path = str(tmp_path / "nsw_forget")
    meta = build_nsw_index(spark, emb, path)
    qid = 7
    qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
    before = [r["vec_id"] for r in nsw_topk(spark, path, qv, k=10)
              .collect()]
    # forget the query's own top hits (the hardest case: they are the
    # ids the walk is navigating TOWARD) plus one entry point, so the
    # entry-pruning path executes too
    forgotten = set(before[:3]) | {meta["entry_ids"][0]}
    removed = forget_in_nsw_index(spark, path, sorted(forgotten))
    assert removed > 0
    with open(os.path.join(path, "meta.json")) as f:
        meta2 = json.load(f)
    assert not (set(meta2["entry_ids"]) & forgotten)
    assert meta2["entry_ids"], "index must stay probeable"
    # edges out of the forgotten ids' buckets are gone
    edges = spark.read.parquet(os.path.join(path, "edges"))
    assert edges.filter(F.col("src_id").isin(sorted(forgotten))) \
        .count() == 0
    surviving = emb.filter(~F.col("vec_id").isin(sorted(forgotten)))
    after = [r["vec_id"] for r in nsw_topk(spark, path, qv, k=10)
             .collect()]
    assert len(after) == 10
    assert not (set(after) & forgotten)
    exact = {r["vec_id"] for r in cosine_topk(surviving, qv,
                                              k=10).collect()}
    assert len(set(after) & exact) / 10.0 >= 0.5
    # the batch tier serves the same post-forget surface
    import numpy as np
    batch = nsw_knn_join(spark, path, ([qid], np.asarray([qv])), k=10)
    bids = {r["vec_id"] for r in batch.collect()}
    assert len(bids) == 10 and not (bids & forgotten)
    # reentrant: nothing left to remove
    assert forget_in_nsw_index(spark, path, sorted(forgotten)) == 0
    # empty id list is a no-op
    assert forget_in_nsw_index(spark, path, []) == 0


def test_nsw_forget_all_entries_promotes_survivors(spark, tmp_path):
    """Forgetting EVERY entry point promotes the smallest surviving ids
    so the graph stays probeable — the degraded-entry fallback."""
    import json
    import os

    from flink_rag_spark.operators.maintenance import forget_in_nsw_index
    from flink_rag_spark.operators.nsw import build_nsw_index, nsw_topk

    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0])
            for i in range(1, 41)]
    emb = spark.createDataFrame(rows,
                                "vec_id bigint, embedding array<double>")
    path = str(tmp_path / "nsw_entries")
    meta = build_nsw_index(spark, emb, path, n_centroids=4)
    forget_in_nsw_index(spark, path, meta["entry_ids"])
    with open(os.path.join(path, "meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["entry_ids"]
    assert not (set(meta2["entry_ids"]) & set(meta["entry_ids"]))
    out = nsw_topk(spark, path, [1.0, 1.0, 1.0], k=5).collect()
    assert 0 < len(out) <= 5
    assert not ({r["vec_id"] for r in out} & set(meta["entry_ids"]))
