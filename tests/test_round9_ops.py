"""Round-9 operator contracts: right-to-be-forgotten across the VECTOR
indexes (IVF and IVF-PQ), completing the deletion surface the text and
dedup indexes already honor (tests/test_round7b_ops.py).

The rebuild-equivalence contract here is geometry-pinned: an IVF
geometry (coarse centroids, PQ codebook) is a TRAINED corpus-level
aggregate — like the text index's avgdl, it legitimately survives a
deletion and is refreshed on the rebuild cadence, not per delete. So
"forget ≡ rebuild" means: after forgetting ids, the index is
bit-identical (artifact AND probe results) to an index built from the
surviving corpus UNDER THE SAME GEOMETRY (build_ivf_index(centroids=) /
build_ivfpq_index(coarse_centroids=, codebook=)).
"""

import pyspark.sql.functions as F
import pytest


def _clustered(spark, n_per=15, dim=16, dtype="double"):
    rows = []
    vid = 0
    for cx, cy in ((0.0, 5.0), (5.0, 0.0)):
        for _ in range(n_per):
            # jitter period 23 over vid — no two of the 30 vectors tie
            v = [(cx if d % 2 == 0 else cy)
                 + ((vid * 13 + d * 7) % 23) / 50.0 for d in range(dim)]
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(
        rows, f"vec_id bigint, embedding array<{dtype}>")


def _cells_content(spark, path):
    return sorted(
        (r["vec_id"], r["cell"]) for r in
        spark.read.parquet(f"{path}/cells").select("vec_id", "cell")
        .collect())


# ------------------------------------------------------- IVF forget

@pytest.mark.parametrize("pass_vectors", [False, True],
                         ids=["find-scan", "vector-pruned"])
def test_forget_in_ivf_index_equals_rebuild(spark, tmp_path, pass_vectors):
    import json

    from flink_rag_spark.operators.index import (build_ivf_index,
                                                 load_ivf_index)
    from flink_rag_spark.operators.maintenance import forget_in_ivf_index
    from flink_rag_spark.operators.similarity import ivf_knn_join

    emb = _clustered(spark)
    forgotten = [3, 17]
    survivors = emb.filter(~F.col("vec_id").isin(forgotten))
    full, fresh = str(tmp_path / "full"), str(tmp_path / "fresh")
    cents = build_ivf_index(spark, emb, full, n_centroids=4)
    build_ivf_index(spark, survivors, fresh, centroids=cents)

    vectors = (emb.filter(F.col("vec_id").isin(forgotten))
               .select("vec_id", "embedding")) if pass_vectors else None
    removed = forget_in_ivf_index(spark, full, forgotten, vectors=vectors)
    assert removed == 2

    # artifact-identical: same cell assignments, same centroids
    assert _cells_content(spark, full) == _cells_content(spark, fresh)
    assert json.load(open(f"{full}/centroids.json")) == \
        json.load(open(f"{fresh}/centroids.json"))

    # probe-identical, and the forgotten ids never surface
    q = spark.createDataFrame(
        [(0, [r["embedding"] for r in
              emb.filter(F.col("vec_id") == 4).collect()][0])],
        "query_id bigint, query_vec array<double>")

    def probe(path):
        cents_p, cells_p = load_ivf_index(spark, path)
        return sorted(map(tuple, ivf_knn_join(
            q, None, k=5, centroids=cents_p, cells=cells_p).collect()))

    got, want = probe(full), probe(fresh)
    assert got == want
    assert not any(r[1] in forgotten for r in got)


def test_forget_in_ivf_index_purges_pending_tail(spark, tmp_path):
    from flink_rag_spark.operators.index import (build_ivf_index,
                                                 load_ivf_tail,
                                                 stage_pending)
    from flink_rag_spark.operators.maintenance import forget_in_ivf_index

    emb = _clustered(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter("vec_id < 20"), idx, n_centroids=4)
    # two fresh vectors land in the tail; one of them is then forgotten
    stage_pending(spark, emb.filter(F.col("vec_id").isin(25, 26)), idx)
    removed = forget_in_ivf_index(spark, idx, [25])
    assert removed == 1                       # tail row only — no cell hit
    tail = {r["vec_id"] for r in load_ivf_tail(spark, idx).collect()}
    assert tail == {26}                       # the other tail row survives


def test_forget_in_ivf_index_missing_ids_noop(spark, tmp_path):
    from flink_rag_spark.operators.index import build_ivf_index
    from flink_rag_spark.operators.maintenance import forget_in_ivf_index

    emb = _clustered(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx, n_centroids=4)
    before = _cells_content(spark, idx)
    assert forget_in_ivf_index(spark, idx, [999]) == 0
    assert forget_in_ivf_index(spark, idx, []) == 0
    assert _cells_content(spark, idx) == before


# ----------------------------------------------------- IVF-PQ forget

@pytest.mark.parametrize("pass_vectors", [False, True],
                         ids=["find-scan", "vector-pruned"])
def test_forget_in_ivfpq_index_equals_rebuild(spark, tmp_path,
                                              pass_vectors):
    import json

    from flink_rag_spark.operators.maintenance import forget_in_ivfpq_index
    from flink_rag_spark.operators.pq import (IVFPQ_CENTROIDS_FILE,
                                              IVFPQ_CODEBOOK_FILE,
                                              build_ivfpq_index,
                                              ivfpq_topk)

    emb = _clustered(spark)
    forgotten = [3, 17]
    survivors = emb.filter(~F.col("vec_id").isin(forgotten))
    full, fresh = str(tmp_path / "full"), str(tmp_path / "fresh")
    build_ivfpq_index(spark, emb, full, n_centroids=4, m=4, kc=4, iters=3)
    cents = json.load(open(f"{full}/{IVFPQ_CENTROIDS_FILE}"))
    cb = json.load(open(f"{full}/{IVFPQ_CODEBOOK_FILE}"))
    build_ivfpq_index(spark, survivors, fresh, coarse_centroids=cents,
                      codebook=cb, m=4, kc=4, iters=3)

    vectors = (emb.filter(F.col("vec_id").isin(forgotten))
               .select("vec_id", "embedding")) if pass_vectors else None
    removed = forget_in_ivfpq_index(spark, full, forgotten,
                                    vectors=vectors)
    assert removed == 2

    # artifact-identical: same (id, cell, codes) rows, same geometry
    def codes(path):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["codes"])) for r in
            spark.read.parquet(f"{path}/cells").collect())
    assert codes(full) == codes(fresh)

    # probe-identical, forgotten ids never surface (rerank against the
    # surviving corpus — the store's own delete already ran by contract)
    qv = [r["embedding"] for r in
          emb.filter(F.col("vec_id") == 4).collect()][0]

    def probe(path):
        return sorted(map(tuple, ivfpq_topk(
            spark, path, qv, survivors, k=5, n_probe=2).collect()))

    got, want = probe(full), probe(fresh)
    assert got == want
    assert not any(r[0] in forgotten for r in got)


# ------------------------------------------- IVF-PQ append / flush

def test_append_to_ivfpq_index_equals_rebuild_and_replays_noop(
        spark, tmp_path):
    """Appended codes are encoded with the FROZEN geometry, so the
    maintained index is bit-identical to a from-scratch build of the
    full corpus under that geometry; a replayed append inserts
    nothing."""
    import json

    from flink_rag_spark.operators.pq import (IVFPQ_CENTROIDS_FILE,
                                              IVFPQ_CODEBOOK_FILE,
                                              append_to_ivfpq_index,
                                              build_ivfpq_index)

    emb = _clustered(spark)
    base = emb.filter("vec_id < 20")
    fresh = emb.filter("vec_id >= 20")
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_ivfpq_index(spark, base, inc, n_centroids=4, m=4, kc=4, iters=3)
    cents = json.load(open(f"{inc}/{IVFPQ_CENTROIDS_FILE}"))
    cb = json.load(open(f"{inc}/{IVFPQ_CODEBOOK_FILE}"))

    assert append_to_ivfpq_index(spark, fresh, inc) == 10
    build_ivfpq_index(spark, emb, full, coarse_centroids=cents,
                      codebook=cb, m=4, kc=4, iters=3)

    def codes(path):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["codes"])) for r in
            spark.read.parquet(f"{path}/cells").collect())
    assert codes(inc) == codes(full)

    # replay: the partition-pruned anti join absorbs the whole batch
    assert append_to_ivfpq_index(spark, fresh, inc) == 0
    assert codes(inc) == codes(full)


def test_ivfpq_flush_pending_and_tail_probe(spark, tmp_path):
    """flush_pending_ivfpq drains the staged tail through the replay
    guard; before the flush, ivfpq_topk(tail=...) serves the staged
    vectors exactly."""
    from flink_rag_spark.operators.index import (load_ivf_tail,
                                                 stage_pending)
    from flink_rag_spark.operators.pq import (build_ivfpq_index,
                                              flush_pending_ivfpq,
                                              ivfpq_topk)

    emb = _clustered(spark)
    base = emb.filter("vec_id < 20")
    fresh = emb.filter("vec_id >= 20")
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, base, idx, n_centroids=4, m=4, kc=4, iters=3)
    stage_pending(spark, fresh, idx)

    # pre-flush: a fresh vector is only reachable through the tail
    qv = [r["embedding"] for r in
          emb.filter(F.col("vec_id") == 25).collect()][0]
    tail = load_ivf_tail(spark, idx)
    no_tail = {r["vec_id"] for r in
               ivfpq_topk(spark, idx, qv, emb, k=3, n_probe=2).collect()}
    with_tail = ivfpq_topk(spark, idx, qv, emb, k=3, n_probe=2,
                           tail=tail).collect()
    assert 25 not in no_tail
    top = sorted(with_tail, key=lambda r: r["rank"])[0]
    assert top["vec_id"] == 25 and top["score"] == 1.0

    # flush drains the tail into the partitions; a replayed flush
    # (crash between append and cleanup) inserts nothing twice
    assert flush_pending_ivfpq(spark, idx) == 10
    assert load_ivf_tail(spark, idx) is None
    ids = [r["vec_id"] for r in
           spark.read.parquet(f"{idx}/cells").collect()]
    assert sorted(ids) == list(range(30))
    post = {r["vec_id"] for r in
            ivfpq_topk(spark, idx, qv, emb, k=3, n_probe=2).collect()}
    assert 25 in post


def test_ivfpq_flush_noop_before_first_build(spark, tmp_path):
    from flink_rag_spark.operators.index import (load_ivf_tail,
                                                 stage_pending)
    from flink_rag_spark.operators.pq import flush_pending_ivfpq

    emb = _clustered(spark)
    idx = str(tmp_path / "ivfpq")
    stage_pending(spark, emb.filter("vec_id < 5"), idx)
    assert flush_pending_ivfpq(spark, idx) == 0    # no geometry yet
    assert load_ivf_tail(spark, idx).count() == 5  # nothing lost


def test_streaming_ingest_maintains_ivfpq_index(spark, tmp_path):
    """run_ingest(ivfpq_index=...): streamed vectors reach the code
    partitions on the flush cadence; the maintained index is
    bit-identical to a from-scratch build of the full store under the
    same geometry."""
    import json

    from flink_rag_spark.operators.pq import (IVFPQ_CENTROIDS_FILE,
                                              IVFPQ_CODEBOOK_FILE,
                                              build_ivfpq_index)
    from flink_rag_spark.sources.streams import file_string_source
    from flink_rag_spark.streaming.ingest import run_ingest

    idx, store = str(tmp_path / "ivfpq"), str(tmp_path / "store")
    seed = tmp_path / "seed"
    seed.mkdir()
    (seed / "s.txt").write_text(
        "".join(f"seed fact number {i} about topic {i % 4}\n"
                for i in range(16)))
    q = run_ingest(spark, file_string_source(spark, str(seed)), store,
                   str(tmp_path / "c0"), available_now=True)
    assert q.awaitTermination(120)
    emb0 = spark.read.parquet(store).select("vec_id", "embedding")
    # embeddings are provider-dim; pick m that divides it
    dim = len(emb0.first()["embedding"])
    m = 4 if dim % 4 == 0 else (2 if dim % 2 == 0 else 1)
    build_ivfpq_index(spark, emb0, idx, n_centroids=4, m=m, kc=4,
                      iters=3)

    newdir = tmp_path / "new"
    newdir.mkdir()
    for j in range(2):
        (newdir / f"n{j}.txt").write_text(
            f"fresh streamed fact {j} about entirely new topics\n")
    q = run_ingest(spark,
                   file_string_source(spark, str(newdir),
                                      max_files_per_trigger=1),
                   store, str(tmp_path / "c1"), available_now=True,
                   ivfpq_index=idx, ivfpq_append_every=1)
    assert q.awaitTermination(180)

    cents = json.load(open(f"{idx}/{IVFPQ_CENTROIDS_FILE}"))
    cb = json.load(open(f"{idx}/{IVFPQ_CODEBOOK_FILE}"))
    full = str(tmp_path / "full")
    build_ivfpq_index(spark,
                      spark.read.parquet(store)
                      .select("vec_id", "embedding"),
                      full, coarse_centroids=cents, codebook=cb, m=m,
                      kc=4, iters=3)

    def codes(path):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["codes"])) for r in
            spark.read.parquet(f"{path}/cells").collect())
    assert codes(idx) == codes(full)
    assert len(codes(idx)) == 18


# ----------------------------------------- quantified (Kleene) CEP

def _ev(spark, rows):
    from datetime import datetime
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, h, m), u, t)
         for i, (h, m, u, t) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string")


def test_quantified_funnel_hand_values(spark):
    """A B{3,} C: the pattern advances at the 3rd strictly-later B;
    repeats before the anchor don't count; same-timestamp repeats
    count once (strict-after chaining)."""
    from datetime import datetime

    from flink_rag_spark.operators.sequences import quantified_funnel_times
    e = _ev(spark, [
        # u1: clean completion — 4 clicks, completes at the 3rd
        (0, 0, 1, "view"), (0, 1, 1, "click"), (0, 2, 1, "click"),
        (0, 3, 1, "click"), (0, 4, 1, "click"), (0, 5, 1, "purchase"),
        # u2: only 2 clicks — quantified step never completes
        (1, 0, 2, "view"), (1, 1, 2, "click"), (1, 2, 2, "click"),
        (1, 3, 2, "purchase"),
        # u3: clicks BEFORE the view don't count toward the repeat
        (2, 0, 3, "click"), (2, 1, 3, "click"), (2, 2, 3, "view"),
        (2, 3, 3, "click"), (2, 4, 3, "click"), (2, 5, 3, "click"),
        (2, 6, 3, "purchase"),
    ])
    got = {r["user_id"]: r for r in quantified_funnel_times(
        e, ["view", ("click", 3), "purchase"]).collect()}
    d = lambda h, m: datetime(2024, 1, 1, h, m)
    assert got[1]["t1"] == d(0, 0)
    assert got[1]["t2"] == d(0, 3)          # the 3rd click, not the 4th
    assert got[1]["t3"] == d(0, 5)
    assert got[2]["t2"] is None and got[2]["t3"] is None
    assert got[3]["t1"] == d(2, 2)
    assert got[3]["t2"] == d(2, 5)
    assert got[3]["t3"] == d(2, 6)


def test_quantified_funnel_same_ts_counts_once_and_validates(spark):
    import pytest as _pytest

    from flink_rag_spark.operators.sequences import (
        expand_quantified_steps,
        quantified_funnel_times,
    )
    # two clicks at the SAME minute: strict-after chaining counts one
    e = _ev(spark, [
        (0, 0, 1, "view"), (0, 1, 1, "click"), (0, 1, 1, "click"),
        (0, 2, 1, "click"), (0, 3, 1, "purchase")])
    got = quantified_funnel_times(
        e, ["view", ("click", 3), "purchase"]).collect()[0]
    assert got["t2"] is None                 # only 2 distinct instants
    flat, last = expand_quantified_steps(["a", ("b", 3), "c"])
    assert flat == ["a", "b", "b", "b", "c"] and last == [1, 4, 5]
    with _pytest.raises(ValueError):
        expand_quantified_steps([("b", 0)])


def test_quantified_funnel_duck_mirror_rejects_columns(spark):
    import pyspark.sql.functions as F2
    import pytest as _pytest

    from flink_rag_spark.operators.sequences import (
        quantified_funnel_times_duck,
    )
    with _pytest.raises(TypeError):
        quantified_funnel_times_duck([(F2.col("x") > 1, 2)])


# -------------------------------------------------- composition

def test_forget_documents_spans_vector_indexes(spark, tmp_path):
    """One forget_documents call wipes the store AND both vector
    indexes; the store's vectors are fetched before its delete so the
    index passes run cell-pruned."""
    from flink_rag_spark.operators.index import build_ivf_index
    from flink_rag_spark.operators.maintenance import forget_documents
    from flink_rag_spark.operators.pq import build_ivfpq_index, ivfpq_topk
    from flink_rag_spark.operators.similarity import ivf_knn_join
    from flink_rag_spark.streaming.ingest import STORE_BUCKETS

    emb = _clustered(spark)
    store = str(tmp_path / "store")
    (emb.withColumn("text", F.concat(F.lit("doc "), F.col("vec_id")))
     .withColumn("bucket", F.pmod(F.col("vec_id"), F.lit(STORE_BUCKETS))
                 .cast("int"))
     .repartition("bucket").write.partitionBy("bucket").parquet(store))
    ivf, ivfpq = str(tmp_path / "ivf"), str(tmp_path / "ivfpq")
    build_ivf_index(spark, emb, ivf, n_centroids=4)
    build_ivfpq_index(spark, emb, ivfpq, n_centroids=4, m=4, kc=4,
                      iters=3)

    out = forget_documents(spark, [3, 17], store_path=store,
                           ivf_index_path=ivf, ivfpq_index_path=ivfpq)
    assert out == {"store_rows": 2, "ivf_rows": 2, "ivfpq_rows": 2}

    left = {r["vec_id"] for r in spark.read.parquet(store).collect()}
    assert left == set(range(30)) - {3, 17}
    for path in (ivf, ivfpq):
        ids = {r["vec_id"] for r in
               spark.read.parquet(f"{path}/cells").collect()}
        assert ids == set(range(30)) - {3, 17}

    # serving paths come back clean
    qv = [r["embedding"] for r in
          emb.filter(F.col("vec_id") == 4).collect()][0]
    q = spark.createDataFrame([(0, qv)],
                              "query_id bigint, query_vec array<double>")
    import json
    cents = json.load(open(f"{ivf}/centroids.json"))
    cells = spark.read.parquet(f"{ivf}/cells")
    got_ivf = {r["vec_id"] for r in ivf_knn_join(
        q, None, k=10, centroids=cents, cells=cells).collect()}
    rerank = spark.read.parquet(store).select("vec_id", "embedding")
    got_pq = {r["vec_id"] for r in ivfpq_topk(
        spark, ivfpq, qv, rerank, k=10, n_probe=2).collect()}
    assert not ({3, 17} & (got_ivf | got_pq))
