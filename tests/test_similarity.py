"""Similarity-operator tests: exact/approximate agreement, ANN recall,
determinism of the provider embedder."""

import pyspark.sql.functions as F

from flink_rag_spark.functions.providers import LocalDeterministicProvider
from flink_rag_spark.operators.similarity import (
    _partition_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    ivf_centroids,
    knn_join,
)
from flink_rag_spark.sources.tables import load_table


def _query_vec(spark, sf_dir, vid=0):
    emb = load_table(spark, sf_dir, "embeddings")
    return list(emb.filter(F.col("vec_id") == vid).first()["embedding"])


def test_knn_join_matches_single_topk(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    qv = _query_vec(spark, sf_oracle)
    single = {r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()}
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    joined = {r["vec_id"] for r in knn_join(q, emb, k=10).collect()}
    assert single == joined


def test_partition_topk_bounds_window_input(spark, sf_oracle):
    """The partial top-k must cut the ranking window's input to
    ≤ |Q| × k × partitions rows (the VERDICT's |Q|×|E| shuffle fix), while
    leaving the final top-k bit-identical to ranking the full score set."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    from flink_rag_spark.functions.vector import ROUND_DP, cosine_expr

    emb = load_table(spark, sf_oracle, "embeddings").repartition(8)
    n_emb = emb.count()
    queries = (load_table(spark, sf_oracle, "embeddings")
               .filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    k = 10
    scored = emb.crossJoin(broadcast(queries)).select(
        F.col("query_id"), F.col("vec_id"),
        F.round(F.expr(cosine_expr("embedding", "query_vec")),
                ROUND_DP).alias("score"))
    reduced = _partition_topk(scored, "query_id", "vec_id", k)
    n_reduced = reduced.count()
    assert n_reduced <= 5 * k * 8, n_reduced
    assert n_reduced < 5 * n_emb  # strictly smaller than the unreduced set

    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.col("vec_id"))
    full = (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
    via_partial = (reduced.withColumn("rank", F.row_number().over(w))
                   .filter(F.col("rank") <= k))
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, via_partial.collect()))
    assert a == b


def test_ann_recall(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    qv = _query_vec(spark, sf_oracle, vid=7)
    exact = [r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()]
    lsh = {r["vec_id"] for r in ann_lsh_topk(emb, qv, 10, multiprobe=1).collect()}
    cents = ivf_centroids(emb)
    ivf = {r["vec_id"] for r in
           ann_ivf_topk(emb, qv, 10, n_probe=4, centroids=cents).collect()}
    # approximate paths must find a solid majority of the true neighbors
    assert len(lsh & set(exact)) >= 5, (exact, lsh)
    assert len(ivf & set(exact)) >= 5, (exact, ivf)


def test_ivf_centroids_deterministic(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    assert ivf_centroids(emb, n_centroids=8) == ivf_centroids(emb, n_centroids=8)


def test_ivf_centroids_footer_estimate_skips_count(spark, sf_oracle,
                                                   monkeypatch):
    """With a parquet-backed input and no n_rows, training must size its
    sample from the footer estimate — never a count() job — and produce
    the same centroids as an explicit row count (the footer total IS the
    row count for an unfiltered scan)."""
    from pyspark.sql import DataFrame

    emb = load_table(spark, sf_oracle, "embeddings")
    want = ivf_centroids(emb, n_centroids=8, n_rows=emb.count())

    def _no_count(self):
        raise AssertionError("ivf_centroids ran a count() job on the "
                             "footer path")
    monkeypatch.setattr(DataFrame, "count", _no_count)
    got = ivf_centroids(emb, n_centroids=8)
    assert got == want


def test_persisted_ivf_index(spark, sf_oracle, tmp_path):
    """Build the IVF index once, query it through ivf_knn_join with
    partition pruning, and match the inline (index-free) results."""
    import io
    import contextlib

    import pyspark.sql.functions as F2

    from flink_rag_spark.operators.index import build_ivf_index, load_ivf_index
    from flink_rag_spark.operators.similarity import ivf_knn_join

    emb = load_table(spark, sf_oracle, "embeddings")
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(spark, emb, path)
    cents2, cells = load_ivf_index(spark, path)
    assert cents == cents2

    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    via_index = ivf_knn_join(q, emb, k=5, centroids=cents2, cells=cells)
    inline = ivf_knn_join(q, emb, k=5, centroids=cents,
                          cells=None)
    a = {(r["query_id"], r["vec_id"]) for r in via_index.collect()}
    b = {(r["query_id"], r["vec_id"]) for r in inline.collect()}
    assert a == b and len(a) == 15

    # partition pruning: a cell filter must reach PartitionFilters
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cells.filter(F2.col("cell").isin([0, 1])).explain(True)
    assert "PartitionFilters" in buf.getvalue()

    # one file per cell (files_per_cell=1): no tasks×cells small-file blowup
    import glob
    n_cells = cells.select("cell").distinct().count()
    files = glob.glob(str(tmp_path / "ivf" / "cells" / "cell=*" / "*.parquet"))
    assert len(files) == n_cells


def test_ann_high_dim_1536(spark):
    """The reference's dimensionality (EmbeddingConfig.java:5): both ANN
    tiers must run at 1536 dims without expression-tree blowup (geometry is
    a broadcast numpy matrix, not SQL literals) and keep recall on a
    clustered synthetic corpus."""
    import numpy as np

    rng = np.random.default_rng(7)
    dims, n_clusters, per = 1536, 6, 40
    centers = rng.standard_normal((n_clusters, dims))
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        v = c + 0.15 * rng.standard_normal(dims)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = [float(x) for x in centers[0] + 0.05 * rng.standard_normal(dims)]

    exact = [r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()]
    lsh = {r["vec_id"] for r in ann_lsh_topk(emb, qv, 10, multiprobe=1).collect()}
    cents = ivf_centroids(emb, n_centroids=n_clusters)
    ivf = {r["vec_id"] for r in
           ann_ivf_topk(emb, qv, 10, n_probe=2, centroids=cents).collect()}
    assert len(lsh & set(exact)) >= 5, (exact, lsh)
    assert len(ivf & set(exact)) >= 8, (exact, ivf)


def test_ivf_knn_join_string_query_ids(spark, sf_oracle):
    """Probe construction must inherit the caller's query-id type — string
    question ids are the RAG path's natural key."""
    from flink_rag_spark.operators.similarity import ivf_knn_join
    emb = load_table(spark, sf_oracle, "embeddings")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.concat(F.lit("q"), F.col("vec_id").cast("string"))
                 .alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = ivf_knn_join(q, emb, k=5)
    rows = out.collect()
    assert len(rows) == 15
    assert {r["query_id"] for r in rows} == {"q0", "q1", "q2"}


def test_ivf_append_and_compact(spark, sf_oracle, tmp_path):
    """Incremental index maintenance (VERDICT r3 item 8): append assigns
    new vectors to their nearest EXISTING cell (no retrain), probes see
    them immediately, and compaction restores files_per_cell files while
    preserving centroids and rows."""
    from flink_rag_spark.operators.index import (
        append_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        load_ivf_index,
    )
    from flink_rag_spark.operators.similarity import ivf_knn_join

    emb = load_table(spark, sf_oracle, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    fresh = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, base, path)
    append_to_ivf_index(spark, fresh.select("vec_id", "embedding"), path)

    cents, cells = load_ivf_index(spark, path)
    assert cells.count() == emb.count()
    # an appended vector queried by its own embedding must be its own top
    # hit — probes reach appended rows through the same partition pruning
    probe_id = fresh.agg(F.min("vec_id")).collect()[0][0]
    q = (emb.filter(F.col("vec_id") == probe_id)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    top = ivf_knn_join(q, emb, k=3, centroids=cents, cells=cells) \
        .orderBy("rank").first()
    assert top["vec_id"] == probe_id and top["score"] == 1.0

    files_after = compact_ivf_index(spark, path)
    cents2, cells2 = load_ivf_index(spark, path)
    assert cents2 == cents                      # compaction never retrains
    assert cells2.count() == emb.count()
    n_cells = cells2.select("cell").distinct().count()
    assert files_after <= n_cells               # one file per non-empty cell


def test_cosine_topk_high_dim_paths_agree(spark):
    """Above HIGH_DIM_LITERAL_MAX the single-query exact path swaps the
    literal-array HOF expression for a broadcast numpy dot. Both paths must
    produce identical rounded scores, and the high-dim plan must be free of
    the giant CAST-literal tree (the VERDICT item: 1536 literals at the
    reference's dimensionality)."""
    import numpy as np

    from flink_rag_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    dims, n = 600, 50
    rows = [(i, [float(x) for x in rng.standard_normal(dims)])
            for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = [float(x) for x in rng.standard_normal(dims)]

    high = cosine_topk(emb, qv, 10)
    plan = high._jdf.queryExecution().executedPlan().toString()
    assert plan.count("CAST") < dims // 2, "literal tree leaked into plan"
    # force the literal path for the same data by raising the threshold
    old = sim.HIGH_DIM_LITERAL_MAX
    sim.HIGH_DIM_LITERAL_MAX = 10_000
    try:
        low = cosine_topk(emb, qv, 10)
        assert ([(r["vec_id"], r["score"]) for r in high.collect()]
                == [(r["vec_id"], r["score"]) for r in low.collect()])
    finally:
        sim.HIGH_DIM_LITERAL_MAX = old


def test_ivf_knn_join_driver_queries_parity(spark, sf_oracle):
    """Passing (qids, Q) driver-side must give exactly the DataFrame-query
    result — same probes, same scores — it only skips the collect."""
    import numpy as np

    from flink_rag_spark.operators.similarity import ivf_knn_join

    emb = load_table(spark, sf_oracle, "embeddings")
    q = (emb.filter(F.col("vec_id") < 4)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    cents = ivf_centroids(emb, n_centroids=16)
    via_df = ivf_knn_join(q, emb, k=5, centroids=cents)
    qrows = q.collect()
    Q = np.asarray([r["query_vec"] for r in qrows], dtype=np.float64)
    via_driver = ivf_knn_join(None, emb, k=5, centroids=cents,
                              driver_queries=([r["query_id"] for r in qrows], Q))
    a = sorted(map(tuple, via_df.collect()))
    b = sorted(map(tuple, via_driver.collect()))
    assert a == b and len(a) == 20


def test_estimated_scan_rows(spark, sf_oracle):
    """Parquet-footer row estimate: exact for file scans, None (assume
    large) for in-memory frames — the partial-top-k gate's contract."""
    from flink_rag_spark.operators.util import estimated_scan_rows

    emb = load_table(spark, sf_oracle, "embeddings")
    assert estimated_scan_rows(emb) == emb.count()
    local = spark.createDataFrame([(1,)], "x long")
    assert estimated_scan_rows(local) is None


def test_embedder_similarity_sanity(spark):
    """The deterministic embedder puts token-overlapping texts closer than
    disjoint ones — the property the freshness scenario depends on."""
    p = LocalDeterministicProvider(dims=64, seed=42)
    import numpy as np

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    q = p.embed_one("what is the capital of france")
    hit = p.embed_one("the capital of france is paris")
    miss = p.embed_one("streaming dataflow engine benchmark results")
    assert cos(q, hit) > cos(q, miss) + 0.2


def test_int8_quantization_roundtrip_and_contract(spark, sf_oracle):
    """Quantization semantics: max|v| maps to ±127 exactly, per-element
    reconstruction error ≤ scale/2, zero vectors round-trip exactly, and
    on the real embeddings every vec-7 cosine stays within the 1e-2
    contract."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.compression import (
        dequantize_expr,
        with_quantized,
    )
    from flink_rag_spark.plans.llm import quantized_similarity_vec7

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           with_quantized(df).withColumn(
               "deq", F.expr(dequantize_expr())).collect()}
    assert out[1]["qvec"] == [64, -127, 32]  # max|v|=1.0 → code -127
    scale = out[1]["qscale"]
    for orig, rec in zip([0.5, -1.0, 0.25], out[1]["deq"]):
        assert abs(orig - rec) <= scale / 2 + 1e-12
    assert out[2]["qvec"] == [0, 0, 0] and out[2]["deq"] == [0.0, 0.0, 0.0]

    rows = quantized_similarity_vec7(spark, sf_oracle).collect()
    assert rows and all(r["within_tol"] for r in rows)
