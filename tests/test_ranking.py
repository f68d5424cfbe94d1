"""BM25 / RRF hybrid ranking tests (operators/ranking.py): hand-computed
BM25 on a tiny corpus, fusion arithmetic, determinism, and the postings
pushdown plan shape."""

import math

import pyspark.sql.functions as F
import pytest

from flink_rag_spark.operators.ranking import (
    BM25_B,
    BM25_K1,
    bm25_scores,
    bm25_topk,
    hybrid_topk,
    rrf_fuse,
)

DOCS = [
    (0, "spark join spark window"),
    (1, "join join join filter"),
    (2, "window sort merge"),
    (3, "the quick brown fox"),
]


def _py_bm25(docs, terms, k1=BM25_K1, b=BM25_B):
    toks = {i: t.split() for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf or not dfreq[t]:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_hand_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           bm25_scores(df, ["spark", "join", "window"]).collect()}
    want = _py_bm25(DOCS, ["spark", "join", "window"])
    assert got == want
    assert 3 not in got  # no matching term → no row


def test_bm25_topk_deterministic_rank(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = sorted(bm25_topk(df, ["spark", "join", "window"], k=3).collect(),
                  key=lambda r: r["rank"])
    want = sorted(_py_bm25(DOCS, ["spark", "join", "window"]).items(),
                  key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"], r["score"]) for r in rows] == want


def test_bm25_query_terms_case_and_dupes(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {(r["doc_id"], r["score"]) for r in
         bm25_scores(df, ["SPARK", "spark", " Spark "]).collect()}
    b = {(r["doc_id"], r["score"]) for r in
         bm25_scores(df, ["spark"]).collect()}
    assert a == b  # dedup + lowercase + strip


def test_rrf_fusion_arithmetic(spark):
    r1 = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank int")
    r2 = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: (r["rrf_score"], r["rank"]) for r in
           rrf_fuse([r1, r2], k0=60).collect()}
    s20 = round(1 / 62 + 1 / 61, 6)
    s10, s30 = round(1 / 61, 6), round(1 / 62, 6)
    assert got == {20: (s20, 1), 10: (s10, 2), 30: (s30, 3)}


def test_hybrid_unions_both_arms(spark):
    """A doc findable only lexically and one findable only by vector must
    BOTH surface in the fused top-k."""
    docs = spark.createDataFrame(
        [(0, "spark join window vector"), (1, "quick brown fox"),
         (2, "lorem ipsum dolor")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (7, [1.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = hybrid_topk(docs, emb, ["spark"], [1.0, 0.0], k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    ids = [r["doc_id"] for r in rows]
    assert 0 in ids   # lexical-only hit
    assert 1 in ids   # vector-only hit (identical direction to the query)


def test_bm25_postings_filter_reaches_scan(spark, sf_oracle, tmp_path):
    """The term IN (...) filter must prune BEFORE the (id, term) aggregate
    — the shuffle carries matching postings, never the full token stream.
    (The filter sits above an explode of a projected column, so it prunes
    at the first narrow stage rather than the parquet row-group level.)"""
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents")
    out = bm25_scores(d, ["spark", "join"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    gen_idx = final.find("Generate explode")
    fil_idx = final.find("Filter term#")
    assert gen_idx != -1 and fil_idx != -1
    # tree printing is top-down: the filter printing ABOVE the Generate
    # means it executes between the explode and the aggregate — i.e. the
    # postings are filtered before any shuffle
    assert fil_idx < gen_idx
    assert " IN (" in final[fil_idx:gen_idx] or "spark" in final[fil_idx:gen_idx]


def test_text_index_matches_inline_and_prunes(spark, sf_oracle, tmp_path):
    """The persisted inverted index must return bit-identical top-k to the
    inline path, and the postings scan must partition-prune on the query
    terms' hash partitions."""
    from flink_rag_spark.operators.ranking import (
        bm25_topk_indexed,
        build_text_index,
    )
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents")
    path = str(tmp_path / "tidx")
    build_text_index(spark, d, path, n_parts=16)

    terms = ["spark", "join", "vector", "window"]
    inline = bm25_topk(d, terms, k=15)
    indexed = bm25_topk_indexed(spark, path, terms, k=15)
    a = [(r["doc_id"], r["score"], r["rank"]) for r in inline.collect()]
    b = [(r["doc_id"], r["score"], r["rank"]) for r in indexed.collect()]
    assert a == b and len(a) == 15

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "tp" in seg


def test_bm25_join_matches_single_query_path(spark):
    """The batch form restricted to one query must equal bm25_topk (unique
    query terms; same formula, rounding, tie-breaks)."""
    from flink_rag_spark.operators.ranking import bm25_join

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame([(0, "spark join window")],
                              "query_id long, query_text string")
    batch = {(r["doc_id"], r["score"], r["rank"]) for r in
             bm25_join(q, df, k=3).collect()}
    single = {(r["doc_id"], r["score"], r["rank"]) for r in
              bm25_topk(df, ["spark", "join", "window"], k=3).collect()}
    assert batch == single


def test_bm25_join_query_term_multiplicity_ignored(spark):
    """Classic BM25: repeating a term in the query must not re-weight it."""
    from flink_rag_spark.operators.ranking import bm25_join

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    q1 = spark.createDataFrame([(0, "spark spark spark")],
                               "query_id long, query_text string")
    q2 = spark.createDataFrame([(0, "spark")],
                               "query_id long, query_text string")
    a = {(r["doc_id"], r["score"]) for r in bm25_join(q1, df, k=5).collect()}
    b = {(r["doc_id"], r["score"]) for r in bm25_join(q2, df, k=5).collect()}
    assert a == b


def test_hybrid_knn_join_per_query_fusion(spark):
    """Each query fuses its OWN arms: a lexical-only hit for q0 must not
    leak into q1's result."""
    from flink_rag_spark.operators.ranking import hybrid_knn_join

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "epsilon zeta")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, 0.7])],
        "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(100, "alpha", [0.0, 1.0]), (200, "epsilon", [1.0, 0.0])],
        "query_id long, query_text string, query_vec array<float>")
    out = hybrid_knn_join(queries, docs, emb, k=2)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    # q100: lexical hit doc0 + vector hit doc1; q200: lexical doc2 + vector doc0
    assert 0 in by_q[100] and 1 in by_q[100]
    assert 2 in by_q[200] and 0 in by_q[200]


def test_bm25_join_index_backed_matches_inline(spark, sf_oracle, tmp_path):
    """bm25_join(index_path=...) must be bit-identical to the inline path
    — including for the hybrid batch fusion downstream."""
    from flink_rag_spark.operators.ranking import (
        bm25_join,
        build_text_index,
    )
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents")
    path = str(tmp_path / "tidx")
    build_text_index(spark, d, path, n_parts=16)
    q = spark.createDataFrame(
        [(0, "spark join vector"), (1, "window merge batch")],
        "query_id long, query_text string")
    inline = {(r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in
              bm25_join(q, d, k=8).collect()}
    indexed = {(r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in
               bm25_join(q, None, k=8, index_path=path).collect()}
    assert inline == indexed and len(inline) == 16


def test_ranking_edge_inputs(spark):
    """Empty query terms yield an empty (not wrong) result; fusing zero
    rankings fails loudly."""
    from flink_rag_spark.operators.ranking import rrf_fuse

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert bm25_scores(df, []).count() == 0
    assert bm25_scores(df, ["zzz_not_present"]).count() == 0
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])


def test_hybrid_fully_indexed_arms(spark, sf_oracle, tmp_path):
    """Both arms can run off persisted indexes (text postings + IVF
    cells): results stay k-per-query and overlap the fully-exact hybrid
    heavily (the vector arm is approximate; fusion tolerates arm misses)."""
    from flink_rag_spark.operators.index import build_ivf_index, load_ivf_index
    from flink_rag_spark.operators.ranking import (
        build_text_index,
        hybrid_knn_join,
    )
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents")
    emb = load_table(spark, sf_oracle, "embeddings")
    tpath = str(tmp_path / "tidx")
    build_text_index(spark, d, tpath, n_parts=16)
    vpath = str(tmp_path / "vidx")
    build_ivf_index(spark, emb, vpath)
    cents, cells = load_ivf_index(spark, vpath)

    queries = (d.filter(F.col("doc_id") < 2)
               .select(F.col("doc_id").alias("query_id"),
                       F.col("text").alias("query_text"))
               .join(emb.select(F.col("vec_id").alias("query_id"),
                                F.col("embedding").alias("query_vec")),
                     on="query_id"))
    exact = hybrid_knn_join(queries, d, emb, k=10)
    indexed = hybrid_knn_join(queries, None, emb, k=10,
                              text_index=tpath, ann_index=(cents, cells))
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["doc_id"])
    ix = {}
    for r in indexed.collect():
        ix.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid in ex:
        assert len(ix[qid]) == 10
        assert len(ex[qid] & ix[qid]) >= 7  # ANN arm recall tolerance


def test_bm25_property_random_corpora(spark):
    """Property-based parity with the pure-Python BM25 model on random
    ASCII word corpora (the hash-properties pattern): if the Spark
    expression drifts from the model, every BM25/hybrid oracle would
    silently flap."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcdefgh", min_size=1, max_size=3)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1, max_size=6)
    terms = st.lists(word, min_size=1, max_size=3)

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=corpus, qterms=terms)
    def check(texts, qterms):
        docs = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r["score"] for r in
               bm25_scores(df, qterms).collect()}
        assert got == _py_bm25(docs, sorted({t for t in qterms}))

    check()


def test_rag_answer_hybrid_indexed_matches_inline(spark, sf_oracle,
                                                  tmp_path):
    """rag_answer(retrieval='hybrid', text_index=...) — the serving shape
    with the persisted inverted index behind the lexical arm — must
    produce bit-identical answers to the inline hybrid plan (the vector
    arm is exact in both)."""
    from flink_rag_spark.operators.ranking import build_text_index
    from flink_rag_spark.plans.rag import rag_answer
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    path = str(tmp_path / "tix")
    build_text_index(spark, d, path, n_parts=16)
    qs = ["what do i do if it is dark", "sorting big tables quickly"]
    inline = rag_answer(spark, sf_oracle, list(qs),
                        retrieval="hybrid").collect()
    indexed = rag_answer(spark, sf_oracle, list(qs), retrieval="hybrid",
                         text_index=path).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, indexed))
    assert all(r["answer"] for r in indexed)


def test_rag_answer_hybrid_accepts_index_path(spark, sf_oracle, tmp_path):
    """A persisted-IVF-index PATH passed as ann_index in hybrid mode must
    be loaded (mirroring the 'ann' branch), not silently dropped back to
    exact cosine: results must equal the tuple-loaded form exactly."""
    from flink_rag_spark.operators.index import build_ivf_index, load_ivf_index
    from flink_rag_spark.plans.rag import rag_answer
    from flink_rag_spark.sources.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    vpath = str(tmp_path / "vidx")
    build_ivf_index(spark, emb, vpath)
    qs = ["what do i do if it is dark", "sorting big tables quickly"]
    by_tuple = rag_answer(spark, sf_oracle, list(qs), retrieval="hybrid",
                          ann_index=load_ivf_index(spark, vpath)).collect()
    by_path = rag_answer(spark, sf_oracle, list(qs), retrieval="hybrid",
                         ann_index=vpath).collect()
    assert sorted(map(tuple, by_tuple)) == sorted(map(tuple, by_path))
    assert all(r["answer"] for r in by_path)


def test_text_index_append_matches_rebuild(spark, sf_oracle, tmp_path):
    """Indexed BM25 after appends must be bit-identical to a full rebuild
    (mergeable stats: integer doc lengths → exact double sums), and
    compaction restores one file per partition without changing results."""
    import glob

    from flink_rag_spark.operators.ranking import (
        append_to_text_index,
        bm25_topk_indexed,
        build_text_index,
        compact_text_index,
    )
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 3 != 0)
    b1 = d.filter(F.col("doc_id") % 3 == 0).filter(F.col("doc_id") % 2 == 0)
    b2 = d.filter(F.col("doc_id") % 3 == 0).filter(F.col("doc_id") % 2 == 1)

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_text_index(spark, base, inc, n_parts=8)
    append_to_text_index(spark, b1, inc)
    append_to_text_index(spark, b2, inc)
    build_text_index(spark, d, full, n_parts=8)

    terms = ["the", "data", "model", "training"]
    got = [tuple(r) for r in
           bm25_topk_indexed(spark, inc, terms, k=15).collect()]
    want = [tuple(r) for r in
            bm25_topk_indexed(spark, full, terms, k=15).collect()]
    assert got == want and len(got) == 15

    counts = compact_text_index(spark, inc)
    parts = glob.glob(f"{inc}/postings/tp=*")
    assert counts["postings"] == len(parts)
    for p in parts:
        assert len(glob.glob(f"{p}/*.parquet")) == 1
    assert counts["doclens"] == 1
    after = [tuple(r) for r in
             bm25_topk_indexed(spark, inc, terms, k=15).collect()]
    assert after == want


def test_maintain_text_index_replay_contract(spark, sf_oracle, tmp_path):
    """Streaming maintenance (maintain_text_index) must deliver each batch
    effectively once: full replays skip on the batch-id guard and a clean
    stream NEVER sets dedup_on_read (probes pay nothing); a crash between
    the file append and the stats commit leaves an intent marker, so the
    replay flags the index and readers collapse the duplicates; a NEW
    stream's batch 0 is not swallowed by a stale guard; compaction
    physically dedupes and clears the flag."""
    import glob
    import json

    from flink_rag_spark.operators.ranking import (
        _append_postings_doclens,
        bm25_topk_indexed,
        build_text_index,
        compact_text_index,
        maintain_text_index,
    )
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 4 == 0)
    b1 = d.filter(F.col("doc_id") % 4 == 1)
    b2 = d.filter(F.col("doc_id") % 4 == 2)
    b3 = d.filter(F.col("doc_id") % 4 == 3)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    terms = ["the", "data", "model", "training"]

    def stats():
        with open(f"{inc}/stats.json") as f:
            return json.load(f)

    # cold start builds; second batch appends; a full replay of it skips;
    # the clean path never sets the flag
    assert maintain_text_index(spark, base, inc, batch_id=0,
                               stream_id="s1", n_parts=8)
    assert "dedup_on_read" not in stats()
    assert maintain_text_index(spark, b1, inc, batch_id=1, stream_id="s1")
    assert not maintain_text_index(spark, b1, inc, batch_id=1,
                                   stream_id="s1")
    assert "dedup_on_read" not in stats()
    build_text_index(spark, base.unionByName(b1), full, n_parts=8)
    want = [tuple(r) for r in
            bm25_topk_indexed(spark, full, terms, k=15).collect()]
    assert [tuple(r) for r in
            bm25_topk_indexed(spark, inc, terms, k=15).collect()] == want

    # crashed batch 2: intent written, files appended, stats commit never
    # ran — the replay must detect the marker, flag the index, and end
    # bit-identical to a rebuild (stats counted once, files twice)
    with open(f"{inc}/intent.json", "w") as f:
        json.dump({"stream_id": "s1", "batch_id": 2}, f)
    _append_postings_doclens(b2, inc, 8, "text", "doc_id")
    assert maintain_text_index(spark, b2, inc, batch_id=2, stream_id="s1")
    st = stats()
    assert st["dedup_on_read"]
    assert st["n_docs"] == base.unionByName(b1).unionByName(b2).count()
    assert not (tmp_path / "inc" / "intent.json").exists()
    build_text_index(spark, base.unionByName(b1).unionByName(b2), full,
                     n_parts=8)
    want = [tuple(r) for r in
            bm25_topk_indexed(spark, full, terms, k=15).collect()]
    assert [tuple(r) for r in
            bm25_topk_indexed(spark, inc, terms, k=15).collect()] == want

    # a NEW stream (fresh checkpoint → ids restart at 0) must not be
    # swallowed by the old stream's guard
    assert maintain_text_index(spark, b3, inc, batch_id=0, stream_id="s2")
    build_text_index(spark, d, full, n_parts=8)
    want_all = [tuple(r) for r in
                bm25_topk_indexed(spark, full, terms, k=15).collect()]
    assert [tuple(r) for r in
            bm25_topk_indexed(spark, inc, terms, k=15).collect()] == want_all

    # compaction dedupes physically, clears the flag, keeps results
    compact_text_index(spark, inc)
    st = stats()
    assert "dedup_on_read" not in st and st["last_batch_id"] == 0
    assert st["n_docs"] == d.count()
    for p in glob.glob(f"{inc}/postings/tp=*"):
        assert len(glob.glob(f"{p}/*.parquet")) == 1
    dup = (spark.read.parquet(f"{inc}/postings")
           .groupBy("doc_id", "term").count().filter("count > 1").count())
    assert dup == 0
    assert [tuple(r) for r in
            bm25_topk_indexed(spark, inc, terms, k=15).collect()] == want_all


def test_forget_on_dirty_streamed_index(spark, sf_oracle, tmp_path):
    """Right-to-be-forgotten on a streaming-maintained index inside its
    replay window (duplicated rows present, dedup_on_read set) must still
    decrement stats exactly — indexed BM25 afterwards matches an index
    rebuilt without the forgotten docs."""
    from flink_rag_spark.operators.maintenance import forget_in_text_index
    from flink_rag_spark.operators.ranking import (
        _append_postings_doclens,
        bm25_topk_indexed,
        build_text_index,
        maintain_text_index,
    )
    from flink_rag_spark.sources.tables import load_table

    import json

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 3 != 0)
    b1 = d.filter(F.col("doc_id") % 3 == 0)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    maintain_text_index(spark, base, inc, batch_id=0, stream_id="s1",
                        n_parts=8)
    # batch 1 crashes after its append, before the stats commit, then
    # replays — files twice, stats once, dedup_on_read set
    with open(f"{inc}/intent.json", "w") as f:
        json.dump({"stream_id": "s1", "batch_id": 1}, f)
    _append_postings_doclens(b1, inc, 8, "text", "doc_id")
    maintain_text_index(spark, b1, inc, batch_id=1, stream_id="s1")

    ids = [r["doc_id"] for r in d.filter(F.col("doc_id") % 7 == 0)
           .select("doc_id").collect()]
    removed = forget_in_text_index(spark, inc, ids)
    assert removed > 0
    keep = d.filter(~F.col("doc_id").isin(ids))
    build_text_index(spark, keep, full, n_parts=8)
    terms = ["the", "data", "model", "training"]
    got = [tuple(r) for r in
           bm25_topk_indexed(spark, inc, terms, k=15).collect()]
    want = [tuple(r) for r in
            bm25_topk_indexed(spark, full, terms, k=15).collect()]
    assert got == want


def test_maintain_cold_start_crash_single_commit(spark, sf_oracle, tmp_path):
    """The cold-start crash window (ADVICE r7): stats.json must commit
    ONCE, atomically, already carrying the replay guard — so no crash
    point leaves stats that include the batch's totals without
    last_batch_id (the state whose replay used to re-add n_docs/total_len
    and permanently skew idf). Two crash points are simulated:

    - after the build's writes and stats commit, before clear_intent —
      exactly the old double-count window: the replay must SKIP (guard is
      in the same commit as the totals) and stay bit-identical to a
      rebuild, with no dedup_on_read flag;
    - after write_intent, before the build reached its stats commit —
      the replay must take the cold path again and rebuild clean."""
    import json

    from flink_rag_spark.operators.ranking import (
        bm25_topk_indexed,
        build_text_index,
        maintain_text_index,
    )
    from flink_rag_spark.sources.tables import load_table

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    b0 = d.filter(F.col("doc_id") % 3 == 0)
    terms = ["the", "data", "model", "training"]
    full = str(tmp_path / "full")
    build_text_index(spark, b0, full, n_parts=8)
    want = [tuple(r) for r in
            bm25_topk_indexed(spark, full, terms, k=15).collect()]

    # crash point 1: build + single stats commit done, intent not cleared
    inc = str(tmp_path / "inc1")
    import os
    os.makedirs(inc)
    with open(f"{inc}/intent.json", "w") as f:
        json.dump({"stream_id": "s1", "batch_id": 0}, f)
    build_text_index(spark, b0, inc, n_parts=8,
                     extra_stats={"last_batch_id": 0, "stream_id": "s1"})
    assert not maintain_text_index(spark, b0, inc, batch_id=0,
                                   stream_id="s1", n_parts=8)
    with open(f"{inc}/stats.json") as f:
        st = json.load(f)
    assert st["n_docs"] == b0.count()          # counted exactly once
    assert "dedup_on_read" not in st           # no reader tax either
    assert not os.path.exists(f"{inc}/intent.json")
    assert [tuple(r) for r in
            bm25_topk_indexed(spark, inc, terms, k=15).collect()] == want

    # crash point 2: intent written, build never reached its stats commit
    inc2 = str(tmp_path / "inc2")
    os.makedirs(inc2)
    with open(f"{inc2}/intent.json", "w") as f:
        json.dump({"stream_id": "s1", "batch_id": 0}, f)
    assert maintain_text_index(spark, b0, inc2, batch_id=0,
                               stream_id="s1", n_parts=8)
    with open(f"{inc2}/stats.json") as f:
        st = json.load(f)
    assert st["n_docs"] == b0.count() and st["last_batch_id"] == 0
    assert [tuple(r) for r in
            bm25_topk_indexed(spark, inc2, terms, k=15).collect()] == want
