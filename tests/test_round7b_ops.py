"""Round-7 additions, batch 2: exact-substring span dedup, unigram-LM
quality scoring, temperature mixture sampling, deterministic shuffle.

The catalog entries for all four are value-checked against DuckDB by the
oracle sweep; these tests pin the operator-level contracts the sweep's
fixed dataset can't exercise (hot-span star-reduction, OOV scoring against
a separate model corpus, the no-upsample temperature invariants,
layout-independence of the shuffle)."""

import math

import pyspark.sql.functions as F

from flink_rag_spark.operators.curation import (
    deterministic_shuffle,
    temperature_mixture_sample,
)
from flink_rag_spark.operators.dedup import span_pairs
from flink_rag_spark.operators.quality import unigram_lm_scores

# ------------------------------------------------------- span dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_pairs_catches_shared_run(spark):
    # two otherwise-different docs share one verbatim 8-token run —
    # the case whole-document Jaccard scores low but span dedup must hit
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs(spark, [
        (1, "x1 x2 x3 x4 " + shared + " y1 y2 y3 y4 y5 y6 y7 y8 y9"),
        (2, "z1 z2 z3 z4 z5 z6 z7 z8 z9 " + shared + " w1 w2 w3"),
        (3, "unrelated words only here nothing shared at all q r s t u v"),
    ])
    got = {(r["id_a"], r["id_b"]): r["n_spans"]
           for r in span_pairs(d, "text", "doc_id", 8).collect()}
    assert (1, 2) in got and got[(1, 2)] == 1
    assert not any(3 in p for p in got)


def test_span_pairs_counts_distinct_spans(spark):
    # identical 10-token docs share every one of the 3 distinct 8-spans
    t = "a b c d e f g h i j"
    d = _docs(spark, [(1, t), (2, t)])
    [(a, b, n)] = [(r["id_a"], r["id_b"], r["n_spans"])
                   for r in span_pairs(d, "text", "doc_id", 8).collect()]
    assert (a, b, n) == (1, 2, 3)


def test_span_pairs_hot_span_star_reduces(spark):
    # one span shared by 6 docs with guard B=4: star edges (rep=0 ↔ each
    # member) only — O(members), never the 15 member↔member pairs
    t = "p q r s t u v w"
    d = _docs(spark, [(i, t) for i in range(6)])
    pairs = {(r["id_a"], r["id_b"])
             for r in span_pairs(d, "text", "doc_id", 8,
                                 max_span_docs=4).collect()}
    assert pairs == {(0, i) for i in range(1, 6)}
    # guard off: all 15 pairs
    full = span_pairs(d, "text", "doc_id", 8, max_span_docs=64)
    assert full.count() == 15


# --------------------------------------------------- unigram LM quality


def test_unigram_lm_oov_and_ordering(spark):
    model = _docs(spark, [(1, "the the the the cat"), (2, "the dog")])
    score = _docs(spark, [(10, "the the"), (11, "zebra quux")])
    out = {r["doc_id"]: r for r in
           unigram_lm_scores(score, "text", "doc_id", vocab_size=10,
                             alpha=0.5, model_docs=model).collect()}
    # all-OOV doc: oov_ratio 1, score = ln(alpha/D)
    assert out[11]["oov_ratio"] == 1.0
    # frequent-token doc scores strictly higher than the OOV doc
    assert out[10]["avg_logprob"] > out[11]["avg_logprob"]
    # exact value for the frequent doc: ln((5+0.5)/D) with
    # N = 7 tokens, V = 3 distinct → D = 7 + 0.5·(3+1)
    d = 7 + 0.5 * (3 + 1)
    assert abs(out[10]["avg_logprob"] - round(math.log(5.5 / d), 6)) < 1e-9
    assert abs(out[11]["avg_logprob"] - round(math.log(0.5 / d), 6)) < 1e-9


def test_unigram_lm_vocab_cap_creates_oov(spark):
    # vocab_size=1 keeps only the most frequent token; everything else OOV
    model = _docs(spark, [(1, "a a a b c")])
    out = unigram_lm_scores(model, "text", "doc_id", vocab_size=1,
                            alpha=0.5).collect()
    [r] = out
    assert r["oov_ratio"] == 0.4  # b and c of 5 tokens


# ----------------------------------------------- temperature mixture


def test_temperature_mixture_no_upsample_and_flattening(spark):
    # keys must be long enough for the polynomial hash to wrap the
    # modulus (short strings hash near 0 → u ≈ 0); real callers key on
    # document text, which always does
    rows = ([(i, "big", f"document body text number {i} trailing")
             for i in range(900)]
            + [(i + 1000, "small", f"small domain doc text {i} trailing")
               for i in range(100)])
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_mixture_sample(d, "source", "text", alpha=0.5)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # argmin domain (small, under alpha<1) keeps everything: p = 1 exactly
    assert counts["small"] == 100
    # head domain downsamples toward sqrt proportions: expected
    # 100 * sqrt(9) = 300 of 900 (binomial spread around p=1/3)
    assert 200 < counts["big"] < 400
    # no row invented
    assert out.join(d, on="doc_id", how="left_anti").count() == 0


def test_temperature_alpha1_keeps_everything(spark):
    rows = ([(i, "a", f"t{i}") for i in range(50)]
            + [(i + 100, "b", f"s{i}") for i in range(25)])
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # alpha=1: w_d = n_d, so every p_d = 1 — natural proportions, no drop
    assert temperature_mixture_sample(d, "source", "text",
                                      alpha=1.0).count() == 75


# ------------------------------------------------ deterministic shuffle


def test_shuffle_is_total_permutation(spark):
    d = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(d, "doc_id", seed=3, buckets=16)
    assert out.count() == 5000
    assert out.select("shuffle_bucket", "shuffle_pos").distinct().count() \
        == 5000
    # pos is dense 1..n within every bucket
    chk = (out.groupBy("shuffle_bucket")
           .agg(F.count("*").alias("n"), F.max("shuffle_pos").alias("m"),
                F.min("shuffle_pos").alias("lo")).collect())
    assert all(r["n"] == r["m"] and r["lo"] == 1 for r in chk)


def test_shuffle_layout_independent_and_seeded(spark):
    d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = deterministic_shuffle(d, "doc_id", seed=3, buckets=8)
    b = deterministic_shuffle(d.repartition(13), "doc_id", seed=3,
                              buckets=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = deterministic_shuffle(d, "doc_id", seed=4, buckets=8)
    # a different seed is a different permutation
    assert a.exceptAll(c).count() > 0


def test_shuffle_actually_permutes(spark):
    # the order (bucket, pos) must not be the identity: the first 100
    # rows of the shuffled order are not simply doc_id 0..99
    d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(d, "doc_id", seed=3, buckets=8)
    head = [r["doc_id"] for r in
            out.orderBy("shuffle_bucket", "shuffle_pos").limit(100).collect()]
    assert head != sorted(head) or head != list(range(100))


# ---------------------------------------------- vocab + id encoding


def test_encode_ids_stable_and_positional(spark):
    from flink_rag_spark.operators.encoding import (
        UNK_ID,
        build_vocab,
        encode_documents,
    )
    d = _docs(spark, [(1, "b a b c b a"), (2, "a zzz b")])
    vocab = build_vocab(d, "text", vocab_size=2, min_count=2)
    ids = {r["token"]: r["token_id"] for r in vocab.collect()}
    # b(4) id 1, a(3) id 2; c and zzz fall out (cap / min_count)
    assert ids == {"b": 1, "a": 2}
    enc = {r["doc_id"]: r for r in
           encode_documents(d, "text", "doc_id", vocab).collect()}
    assert enc[1]["token_ids"] == [1, 2, 1, UNK_ID, 1, 2]
    assert enc[2]["token_ids"] == [2, UNK_ID, 1]
    assert enc[1]["n_tokens"] == 6


def test_encode_is_layout_independent(spark):
    from flink_rag_spark.operators.encoding import (
        build_vocab,
        encode_documents,
    )
    d = _docs(spark, [(i, f"tok{i % 7} tok{i % 3} filler words here")
                      for i in range(200)])
    v = build_vocab(d, "text", vocab_size=5)
    a = encode_documents(d, "text", "doc_id", v)
    b = encode_documents(d.repartition(13), "text", "doc_id",
                         build_vocab(d.repartition(5), "text",
                                     vocab_size=5))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# --------------------------------------------------- validation


def test_validate_counts_and_uniqueness(spark):
    from flink_rag_spark.operators.validation import (
        validate,
        violating_rows,
    )
    d = spark.createDataFrame(
        [(1, "ok", 5), (2, "", 0), (2, "dup", 3), (3, None, 9)],
        "id long, t string, n long")
    rules = {"t_nonempty": "length(t) > 0", "n_small": "n < 9"}
    rep = {r["rule"]: (r["violations"], r["passed"])
           for r in validate(d, rules, unique_key="id").collect()}
    # empty-string row fails t_nonempty; NULL t is also a violation
    assert rep["t_nonempty"] == (2, False)
    assert rep["n_small"] == (1, False)
    assert rep["unique_id"] == (1, False)  # one surplus duplicate row
    bad = {(r["id"], tuple(r["failed_rules"]))
           for r in violating_rows(d, rules, "id").collect()}
    assert (2, ("t_nonempty",)) in bad
    assert (3, ("t_nonempty", "n_small")) in bad


def test_validate_clean_table_passes(spark):
    from flink_rag_spark.operators.validation import validate
    d = spark.createDataFrame([(i, "x") for i in range(10)],
                              "id long, t string")
    rep = validate(d, {"t_ok": "t = 'x'"}, unique_key="id").collect()
    assert all(r["passed"] and r["violations"] == 0 for r in rep)


# ------------------------------------------------ quantile binning


def test_quantile_bins_equal_frequency(spark):
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.profiling import quantile_bins
    d = spark.range(0, 1000).withColumn("v", F.col("id").cast("double"))
    out = quantile_bins(d, "v", n_bins=4)
    counts = {r["bin"]: r["n"] for r in
              out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {1, 2, 3, 4}
    assert all(200 <= c <= 300 for c in counts.values())
    # monotone: every value in bin k is <= every value in bin k+1
    mx = {r["bin"]: (r["lo"], r["hi"]) for r in
          out.groupBy("bin").agg(F.min("v").alias("lo"),
                                 F.max("v").alias("hi")).collect()}
    assert mx[1][1] <= mx[2][0] and mx[2][1] <= mx[3][0] \
        and mx[3][1] <= mx[4][0]


def test_quantile_bins_approx_path_runs(spark):
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.profiling import quantile_bins
    d = spark.range(0, 500).withColumn("v", (F.col("id") % 50).cast("double"))
    out = quantile_bins(d, "v", n_bins=5, exact=False)
    assert out.count() == 500
    assert out.select("bin").distinct().count() <= 5


# ------------------------------------------------ count-min sketch


def test_cms_contract_and_mergeability(spark):
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.frequency import (
        cms_build,
        cms_estimate,
    )
    rows = [(i % 5, "g%d" % (i % 3)) for i in range(3000)] \
        + [(999, "g0")] * 7
    d = spark.createDataFrame(rows, "k long, g string")
    true = {r["k"]: r["n"] for r in
            d.groupBy("k").agg(F.count("*").alias("n")).collect()}
    n_total = sum(true.values())
    eps = 0.001
    # grouped partials merge to the same answer as one global sketch
    parts = [bytes(r["cms"]) for r in
             cms_build(d, "k", eps=eps, group_col="g").collect()]
    whole = [bytes(r["cms"]) for r in cms_build(d, "k", eps=eps).collect()]
    probes = [0, 1, 4, 999, 12345]
    est_m = cms_estimate(spark, parts, probes)
    est_w = cms_estimate(spark, whole, probes)
    assert est_m == est_w
    for p in probes:
        t = true.get(p, 0)
        assert est_m[p] >= t  # CMS never underestimates
        assert est_m[p] <= t + eps * n_total + 1


# --------------------------------------------------- z-order layout


def _file_stat_widths(path, col):
    """Per-file (max-min)/global_range for one column, from parquet
    footer statistics — the exact information a scan's file skipping
    uses."""
    import glob

    import pyarrow.parquet as pq
    widths, los, his = [], [], []
    files = sorted(glob.glob(f"{path}/*.parquet"))
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        widths.append(hi - lo)
        los.append(lo)
        his.append(hi)
    rng = max(his) - min(los)
    return [w / rng for w in widths]


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.layout import write_zordered
    # two independent uniform dimensions — the worst case for any
    # single-column sort
    d = (spark.range(0, 40_000)
         .select((F.col("id") % 200).alias("x"),
                 F.floor(F.col("id") / 200).alias("y"),
                 F.col("id").alias("payload")))
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(d, zpath, ["x", "y"], n_files=16)
    (d.repartitionByRange(16, F.col("x"))
     .sortWithinPartitions("x").write.mode("overwrite").parquet(lpath))
    # same rows either way
    assert (spark.read.parquet(zpath).exceptAll(d).count() == 0
            and d.exceptAll(spark.read.parquet(zpath)).count() == 0)
    zx = sum(_file_stat_widths(zpath, "x")) / 16
    zy = sum(_file_stat_widths(zpath, "y")) / 16
    lx = sum(_file_stat_widths(lpath, "x")) / 16
    ly = sum(_file_stat_widths(lpath, "y")) / 16
    # linear layout: razor-sharp on x, useless on y
    assert lx < 0.15 and ly > 0.8
    # z-order: BOTH dimensions prunable — every file covers a small
    # fraction of each dimension's range (16 files → ~4x4 curve tiles,
    # expected width ~0.25-0.35 per dimension)
    assert zx < 0.5 and zy < 0.5
    # and far better than the linear layout's bad dimension
    assert zy < ly / 2


# ---------------------------------------------- streaming quality gate


def test_streaming_quality_gate_routes_and_reports(spark, tmp_path):
    from flink_rag_spark.streaming.quality_gate import run_quality_gate
    rules = {"t_nonempty": "length(t) > 0", "v_pos": "v > 0"}
    rows = [(1, "ok", 5), (2, "", 3), (3, "fine", -1), (4, "good", 2),
            (5, "", -9)]
    src = tmp_path / "src"
    src.mkdir()
    d = spark.createDataFrame(rows, "id long, t string, v long")
    d.write.parquet(str(src / "b1"))
    clean, quar, mets = (str(tmp_path / p)
                         for p in ("clean", "quar", "mets"))
    stream = spark.readStream.schema(d.schema).parquet(str(src / "*"))
    q = run_quality_gate(spark, stream, rules, "id", clean, quar, mets,
                         str(tmp_path / "cp"), available_now=True)
    assert q.awaitTermination(120)
    got_clean = {r["id"] for r in spark.read.parquet(clean).collect()}
    assert got_clean == {1, 4}
    bad = {r["id"]: sorted(r["failed_rules"])
           for r in spark.read.parquet(quar).collect()}
    assert bad == {2: ["t_nonempty"], 3: ["v_pos"],
                   5: ["t_nonempty", "v_pos"]}
    m = {r["rule"]: (r["violations"], r["n_rows"])
         for r in spark.read.parquet(mets).collect()}
    assert m == {"t_nonempty": (2, 5), "v_pos": (2, 5)}


def test_streaming_quality_gate_replay_idempotent(spark, tmp_path):
    """Replaying a committed micro-batch dynamic-overwrites its own
    batch_id partitions — no duplicate rows in any sink."""
    from flink_rag_spark.streaming.quality_gate import run_quality_gate
    rules = {"v_pos": "v > 0"}
    src = tmp_path / "src"
    src.mkdir()
    d = spark.createDataFrame([(i, i - 2) for i in range(6)],
                              "id long, v long")
    d.write.parquet(str(src / "b1"))
    clean, quar, mets = (str(tmp_path / p)
                         for p in ("clean", "quar", "mets"))

    def drain(cp):
        stream = spark.readStream.schema(d.schema).parquet(str(src / "*"))
        q = run_quality_gate(spark, stream, rules, "id", clean, quar,
                             mets, cp, available_now=True)
        assert q.awaitTermination(120)

    drain(str(tmp_path / "cp1"))
    # fresh checkpoint: the SAME files replay as batch 0 again
    drain(str(tmp_path / "cp2"))
    assert spark.read.parquet(clean).count() == 3   # v in {1,2,3}
    assert spark.read.parquet(quar).count() == 3    # v in {-2,-1,0}
    assert spark.read.parquet(mets).count() == 1


# -------------------------------------------- right to be forgotten


def test_forget_in_text_index_equals_rebuild(spark, tmp_path):
    import glob

    from flink_rag_spark.operators.maintenance import forget_in_text_index
    from flink_rag_spark.operators.ranking import (
        bm25_topk_indexed,
        build_text_index,
    )
    rows = [(i, f"shared term plus unique{i} word body number {i}")
            for i in range(30)]
    d = _docs(spark, rows)
    forgotten, remaining = [3, 17], d.filter(~F.col("doc_id").isin(3, 17))
    full, fresh = str(tmp_path / "full"), str(tmp_path / "fresh")
    build_text_index(spark, d, full)
    build_text_index(spark, remaining, fresh)

    n = forget_in_text_index(spark, full, forgotten)
    assert n > 0
    # indexed BM25 after deletion is bit-identical to the rebuild
    for terms in (["shared", "term"], ["unique3"], ["body", "number"]):
        got = sorted(map(tuple, bm25_topk_indexed(
            spark, full, terms, k=10).collect()))
        want = sorted(map(tuple, bm25_topk_indexed(
            spark, fresh, terms, k=10).collect()))
        assert got == want
        assert not any(r[0] in (3, 17) for r in got)
    # stats decremented exactly
    import json
    sa = json.load(open(f"{full}/stats.json"))
    sb = json.load(open(f"{fresh}/stats.json"))
    assert (sa["n_docs"], sa["total_len"], sa["avgdl"]) == \
        (sb["n_docs"], sb["total_len"], sb["avgdl"])
    assert glob.glob(f"{full}/postings/tp=*/*.parquet")


def test_forget_in_dedup_index_equals_rebuild(spark, tmp_path):
    from flink_rag_spark.operators.incremental import (
        build_dedup_index,
        incremental_neardup_pairs,
    )
    from flink_rag_spark.operators.maintenance import forget_in_dedup_index
    from flink_rag_spark.operators.util import unpersist_cached_deps
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    corpus_rows = [(i, f"{base} filler{i} more{i} words{i} here{i}")
                   for i in range(20)]
    d = _docs(spark, corpus_rows)
    n_parts = 8
    full, fresh = str(tmp_path / "full"), str(tmp_path / "fresh")
    build_dedup_index(spark, d, "text", "doc_id", full, n_parts=n_parts)
    build_dedup_index(spark, d.filter(F.col("doc_id") != 5), "text",
                      "doc_id", fresh, n_parts=n_parts)
    removed = forget_in_dedup_index(spark, full, [5], n_parts=n_parts)
    assert removed > 0

    batch = _docs(spark, [(100, f"{base} filler5 more5 words5 here5")])

    def probe(path):
        out = incremental_neardup_pairs(spark, batch, "text", "doc_id",
                                        path, 0.5, n_parts=n_parts)
        rows = sorted(map(tuple, out.collect()))
        unpersist_cached_deps(out)
        return rows

    got, want = probe(full), probe(fresh)
    assert got == want
    assert not any(5 in (a, b) for a, b, _ in got)


def test_forget_documents_composition(spark, tmp_path):
    from flink_rag_spark.operators.maintenance import forget_documents
    from flink_rag_spark.streaming.ingest import STORE_BUCKETS
    store = str(tmp_path / "store")
    d = spark.createDataFrame([(i, f"payload {i}") for i in range(20)],
                              "vec_id long, payload string")
    (d.withColumn("bucket", F.pmod(F.col("vec_id"), F.lit(STORE_BUCKETS)))
     .repartition("bucket").write.partitionBy("bucket").parquet(store))
    out = forget_documents(spark, [4, 9], store_path=store)
    assert out == {"store_rows": 2}
    left = {r["vec_id"] for r in spark.read.parquet(store).collect()}
    assert left == set(range(20)) - {4, 9}


# -------------------------------------- span dedup property test


def test_span_pairs_property_matches_python_model(spark):
    """Property test: span_pairs over random small-alphabet corpora
    equals a pure-Python replay of the SAME rolling shingle hash (token
    polynomial hash + SHINGLE_BASE combination + short-doc padding) —
    pair set AND distinct-shared-span counts, guard off."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_rag_spark.functions.hashing import POLY_BASE, POLY_P
    from flink_rag_spark.operators.dedup import SHINGLE_BASE

    K = 3  # small spans so tiny docs can collide

    def tok_hash(t):
        h = 0
        for c in t:
            h = (h * POLY_BASE + ord(c)) % POLY_P
        return h

    def spans(text):
        th = [tok_hash(t) for t in text.lower().strip().split()]
        out = set()
        for i in range(max(len(th) - K + 1, 1)):
            h = 0
            for j in range(K):
                v = th[i + j] if i + j < len(th) else 0
                h = (h * SHINGLE_BASE + v) % POLY_P
            out.add(h)
        return out

    def model(texts):
        sp = {i: spans(t) for i, t in enumerate(texts)}
        pairs = {}
        for a in sp:
            for b in sp:
                if a < b and sp[a] & sp[b]:
                    pairs[(a, b)] = len(sp[a] & sp[b])
        return pairs

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=6)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(texts=corpus)
    def check(texts):
        d = _docs(spark, list(enumerate(texts)))
        got = {(r["id_a"], r["id_b"]): r["n_spans"]
               for r in span_pairs(d, "text", "doc_id", K,
                                   max_span_docs=1000).collect()}
        assert got == model(texts)

    check()
