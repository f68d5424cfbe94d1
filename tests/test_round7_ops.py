"""Round-7 operator families: store upsert, embedding clustering +
semantic dedup, n-gram decontamination, random projection."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from flink_rag_spark.sources.tables import load_table


# ------------------------------------------------------------- upsert


def _mk_store(spark, tmp_path, rows):
    from flink_rag_spark.streaming.ingest import STORE_BUCKETS
    path = str(tmp_path / "store")
    df = spark.createDataFrame(rows, "vec_id long, payload string")
    (df.withColumn("bucket", F.pmod(F.col("vec_id"), F.lit(STORE_BUCKETS)))
     .repartition("bucket").write.partitionBy("bucket").parquet(path))
    return path


def test_upsert_replaces_and_inserts(spark, tmp_path):
    from flink_rag_spark.operators.maintenance import upsert_into_store
    path = _mk_store(spark, tmp_path,
                     [(i, f"v1-{i}") for i in range(40)])
    updates = spark.createDataFrame(
        [(3, "v2-3"), (17, "v2-17"), (1000, "new-1000")],
        "vec_id long, payload string")
    res = upsert_into_store(spark, path, updates)
    assert res == {"updated": 2, "inserted": 1}
    got = {r["vec_id"]: r["payload"]
           for r in spark.read.parquet(path).collect()}
    assert len(got) == 41
    assert got[3] == "v2-3" and got[17] == "v2-17"
    assert got[1000] == "new-1000" and got[5] == "v1-5"


def test_upsert_untouched_buckets_not_rewritten(spark, tmp_path):
    from flink_rag_spark.operators.maintenance import upsert_into_store
    from flink_rag_spark.streaming.ingest import STORE_BUCKETS
    path = _mk_store(spark, tmp_path,
                     [(i, f"v1-{i}") for i in range(64)])
    touched_bucket = 3 % STORE_BUCKETS

    def snapshot():
        return {f: os.path.getmtime(f)
                for f in glob.glob(f"{path}/bucket=*/*.parquet")
                if f"bucket={touched_bucket}/" not in f}

    before = snapshot()
    upsert_into_store(spark, path, spark.createDataFrame(
        [(3, "v2-3")], "vec_id long, payload string"))
    assert snapshot() == before, "untouched bucket files were rewritten"


def test_upsert_flat_store_fallback(spark, tmp_path):
    from flink_rag_spark.operators.maintenance import upsert_into_store
    path = str(tmp_path / "flat")
    spark.createDataFrame([(i, f"v1-{i}") for i in range(10)],
                          "vec_id long, payload string").write.parquet(path)
    res = upsert_into_store(spark, path, spark.createDataFrame(
        [(2, "v2-2"), (99, "new")], "vec_id long, payload string"))
    assert res == {"updated": 1, "inserted": 1}
    got = {r["vec_id"]: r["payload"]
           for r in spark.read.parquet(path).collect()}
    assert got[2] == "v2-2" and got[99] == "new" and len(got) == 11


# ------------------------------------------------- clustering / SemDeDup


def test_assign_clusters_matches_matmul_argmin(spark, sf_oracle):
    """The relational (graded) assignment and the Arrow matmul fast path
    must agree — same nearest centroid everywhere (the fixture space has
    no rounded-cosine ties between distinct centroids)."""
    from flink_rag_spark.operators.clustering import assign_clusters
    from flink_rag_spark.operators.similarity import with_ivf_cells
    from flink_rag_spark.plans.llm import _fixed_centroids

    emb = load_table(spark, sf_oracle, "embeddings")
    cents = _fixed_centroids(spark, sf_oracle)
    rel = {r["vec_id"]: r["cell"]
           for r in assign_clusters(emb, cents).collect()}
    # with_ivf_cells is L2-argmin; on unit-unnormalized vectors L2 and
    # cosine argmin can differ — compare against a cosine argmin in numpy
    import numpy as np
    C = np.asarray(cents)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    for r in emb.select("vec_id", "embedding").collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        scores = np.round((Cn @ v) / np.linalg.norm(v), 6)
        best = int(np.lexsort((np.arange(len(cents)), -scores))[0])
        assert rel[r["vec_id"]] == best, r["vec_id"]
    assert with_ivf_cells(emb, cents).count() == emb.count()


def test_kmeans_refine_reduces_inertia(spark, sf_oracle):
    """One distributed Lloyd's iteration must not increase total
    within-cluster squared distance (textbook monotonicity)."""
    import numpy as np

    from flink_rag_spark.operators.clustering import kmeans_refine
    from flink_rag_spark.plans.llm import _fixed_centroids

    emb = load_table(spark, sf_oracle, "embeddings")
    X = np.asarray([r["embedding"] for r in
                    emb.select("embedding").collect()], dtype=np.float64)

    def inertia(cent):
        C = np.asarray(cent)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    c0 = _fixed_centroids(spark, sf_oracle)
    c1 = kmeans_refine(emb, c0, iters=1)
    assert inertia(c1) <= inertia(c0) + 1e-9
    # and the refined centroids equal numpy Lloyd's exactly (same assign)
    C = np.asarray(c0)
    assign = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    for k in range(len(c0)):
        m = X[assign == k]
        want = m.mean(axis=0) if len(m) else C[k]
        assert np.allclose(np.asarray(c1[k]), want, atol=1e-9), k


def test_semantic_dedup_keep_properties(spark, sf_oracle):
    """Kept set: every removed id has a lower-id same-cell doc within the
    threshold; no kept doc does (the documented min-id survivor rule)."""
    from flink_rag_spark.operators.clustering import (
        assign_clusters,
        semantic_dedup_keep,
    )
    from flink_rag_spark.plans.llm import SEMANTIC_DEDUP_T, _fixed_centroids

    import numpy as np
    emb = load_table(spark, sf_oracle, "embeddings")
    cents = _fixed_centroids(spark, sf_oracle)
    kept = {r["vec_id"] for r in
            semantic_dedup_keep(emb, cents, SEMANTIC_DEDUP_T).collect()}
    asg = {r["vec_id"]: r["cell"]
           for r in assign_clusters(emb, cents).collect()}
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()}

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    removed = set(vecs) - kept
    assert removed  # threshold chosen so the pass is non-trivial
    for i in vecs:
        has_lower_dup = any(
            cos(vecs[i], vecs[j]) >= SEMANTIC_DEDUP_T
            for j in vecs if j < i and asg[j] == asg[i])
        assert (i in removed) == has_lower_dup, i


# -------------------------------------------------- n-gram decontamination


def test_ngram_decontaminate_drops_shared_passage(spark):
    from flink_rag_spark.operators.curation import ngram_decontaminate
    passage = " ".join(f"w{i}" for i in range(13))  # one full 13-gram
    train = spark.createDataFrame(
        [(1, f"prefix text {passage} suffix text"),
         (2, "totally unrelated words " + " ".join(
             f"x{i}" for i in range(20)))],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, f"the benchmark contains {passage} inside it")],
        "doc_id long, text string")
    kept = {r["doc_id"] for r in
            ngram_decontaminate(train, bench, "text", "doc_id").collect()}
    assert kept == {2}


def test_ngram_decontaminate_plan_broadcasts_bench(spark):
    from flink_rag_spark.operators.curation import ngram_decontaminate
    train = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"t{i}w{j}" for j in range(15)))
         for i in range(20)], "doc_id long, text string")
    bench = train.filter(F.col("doc_id") % 5 == 0)
    out = ngram_decontaminate(train, bench, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------ random projection


def test_random_projection_is_layout_independent(spark, sf_oracle):
    """The projection is a pure function of content — identical values
    at any partitioning (the reproducibility property that makes it
    storable/replayable at scale)."""
    from flink_rag_spark.operators.compression import random_projection_expr
    emb = load_table(spark, sf_oracle, "embeddings").limit(50)
    expr = F.expr(random_projection_expr("embedding", 16)).alias("p")
    a = {r["vec_id"]: tuple(r["p"])
         for r in emb.select("vec_id", expr).collect()}
    b = {r["vec_id"]: tuple(r["p"])
         for r in emb.repartition(7).select("vec_id", expr).collect()}
    assert a == b and all(len(v) == 16 for v in a.values())


def test_random_projection_sign_matrix_full_rank(spark):
    """The seeded sign matrix must be full-rank with near-zero column
    correlation — a LINEAR index hash degenerates to parity(i+j), a
    rank-1 matrix that projects everything onto one line (the bug the
    quadratic mixing term fixes)."""
    import numpy as np

    from flink_rag_spark.operators.compression import (
        _RP_BIG,
        _RP_P1,
        _RP_P2,
    )
    d_in, d_out = 64, 16
    S = np.empty((d_in, d_out))
    for i in range(d_in):
        for j in range(d_out):
            h = i * _RP_P1 + j + 1
            S[i, j] = 1.0 if ((h * h * _RP_P2) % _RP_BIG) % 2 == 0 else -1.0
    assert np.linalg.matrix_rank(S) == d_out
    C = np.corrcoef(S.T)
    iu = np.triu_indices(d_out, k=1)
    assert np.abs(C[iu]).max() < 0.5


def test_random_projection_preserves_geometry(spark, sf_oracle):
    """JL sanity: projected cosine correlates with exact cosine over
    sampled pairs. The ceiling is set by the fixture's small cosine
    spread (σ≈0.13) vs JL noise 1/√16: theory predicts corr ≈ 0.45 —
    assert comfortably above the broken-matrix level (≈0.14)."""
    import numpy as np

    from flink_rag_spark.operators.compression import random_projection_expr
    emb = load_table(spark, sf_oracle, "embeddings").filter(
        F.col("vec_id") < 60)
    rows = emb.select(
        "vec_id", "embedding",
        F.expr(random_projection_expr("embedding", 16)).alias("p")).collect()
    V = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    P = np.asarray([r["p"] for r in rows], dtype=np.float64)

    def cosm(M):
        n = M / np.linalg.norm(M, axis=1, keepdims=True)
        return n @ n.T

    cv, cp = cosm(V), cosm(P)
    iu = np.triu_indices(len(rows), k=1)
    corr = np.corrcoef(cv[iu], cp[iu])[0, 1]
    assert corr > 0.4, corr
