"""Training-data curation operators: chunk coverage/overlap properties and
the determinism contract of content-hash sampling (value parity with DuckDB
is covered by the catalog oracle sweep)."""

import pyspark.sql.functions as F

from flink_rag_spark.operators.curation import chunk_documents, hash_sample
from flink_rag_spark.sources.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    chunks = chunk_documents(_docs(spark, [(1, text)]), "text", "doc_id",
                             window=32, stride=24).collect()
    chunks.sort(key=lambda r: r["chunk_id"])
    # ceil((100-32)/24)+1 = 4 chunks
    assert [r["chunk_id"] for r in chunks] == [0, 1, 2, 3]
    toks = [r["chunk_text"].split(" ") for r in chunks]
    # full chunks except the tail (starts at 72, holds 28)
    assert [len(t) for t in toks] == [32, 32, 32, 28]
    assert [r["chunk_tokens"] for r in chunks] == [32, 32, 32, 28]
    # every token appears in >=1 chunk, in order
    covered = set().union(*map(set, toks))
    assert covered == {f"t{i}" for i in range(100)}
    # consecutive chunks overlap by window - stride = 8 tokens
    for a, b in zip(toks, toks[1:]):
        assert a[24:] == b[:len(a) - 24]


def test_chunk_short_and_empty_docs(spark):
    rows = [(1, "only three tokens"), (2, ""), (3, "   "), (4, None)]
    chunks = chunk_documents(_docs(spark, rows), "text", "doc_id",
                             window=32, stride=24).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc yields exactly one chunk; empty AND NULL text yield one
    # empty chunk — no document ever silently disappears (ADVICE r3)
    assert {k: len(v) for k, v in by_doc.items()} == {1: 1, 2: 1, 3: 1, 4: 1}
    assert by_doc[1][0]["chunk_text"] == "only three tokens"
    assert by_doc[2][0]["chunk_text"] == ""
    assert by_doc[4][0]["chunk_text"] == ""


def test_hash_sample_is_layout_independent(spark, sf_smoke):
    """The kept set must be a pure function of content — identical across
    partitionings (the reproducibility contract seeded df.sample lacks)."""
    d = load_table(spark, sf_smoke, "documents")
    a = {r["doc_id"] for r in
         hash_sample(d, "text", keep_pct=20).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         hash_sample(d.repartition(13), "text", keep_pct=20)
         .select("doc_id").collect()}
    assert a == b and a
    # roughly 20% kept (hash buckets are near-uniform over real text)
    n = d.count()
    assert 0.05 * n < len(a) < 0.45 * n
    # monotone: a larger keep_pct strictly contains the smaller sample
    c = {r["doc_id"] for r in
         hash_sample(d, "text", keep_pct=50).select("doc_id").collect()}
    assert a <= c


def test_hash_sample_aligns_across_tables(spark, sf_smoke):
    """Sampling two tables by the same key keeps aligned rows — the
    cross-dataset consistency property."""
    d = load_table(spark, sf_smoke, "documents")
    left = d.select("doc_id", "text")
    right = d.select(F.col("doc_id").alias("id2"), "text")
    ka = {r["doc_id"] for r in hash_sample(left, "text", 30).collect()}
    kb = {r["id2"] for r in hash_sample(right, "text", 30).collect()}
    assert ka == kb


def test_chunk_properties_match_python_model(spark):
    """Property sweep: for a grid of (n_tokens, window, stride) the Spark
    chunking must equal a pure-Python model — count, coverage, content."""
    import math

    def py_chunks(tokens, window, stride):
        n_extra = math.ceil(max(len(tokens) - window, 0) / stride)
        return [" ".join(tokens[i * stride: i * stride + window])
                for i in range(n_extra + 1)]

    cases = []
    cid = 0
    for n in (0, 1, 5, 31, 32, 33, 63, 64, 65, 97, 200):
        for w, s in ((32, 24), (32, 32), (8, 3), (64, 48)):
            cases.append((cid, n, w, s))
            cid += 1
    for w, s in {(w, s) for _, _, w, s in cases}:
        rows = [(cid, " ".join(f"t{i}" for i in range(n)))
                for cid, n, cw, cs in cases if (cw, cs) == (w, s)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in chunk_documents(df, "text", "doc_id",
                                 window=w, stride=s).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"]))
        for cid, n, cw, cs in cases:
            if (cw, cs) != (w, s):
                continue
            expected = py_chunks([f"t{i}" for i in range(n)], w, s)
            chunks = [t for _, t in sorted(got.get(cid, []))]
            assert chunks == expected, (cid, n, w, s)


def test_weighted_sample_matches_model_and_survives_repartition(spark):
    import math

    from flink_rag_spark.functions.hashing import POLY_BASE, POLY_P
    from flink_rag_spark.operators.curation import weighted_sample

    rows = [(i, f"document body {i} {'x' * (i % 11)}", (i % 7) + 1)
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    got = [r["doc_id"] for r in
           weighted_sample(df, "text", "w", n=20, id_col="doc_id").collect()]

    def poly(s):
        acc = 0
        for c in s:
            acc = (acc * POLY_BASE + ord(c)) % POLY_P
        return acc

    key = {i: math.log((poly(t) + 1) / (POLY_P + 1)) / w for i, t, w in rows}
    want = [i for i, _, _ in
            sorted(rows, key=lambda r: (-key[r[0]], r[0]))][:20]
    assert got == want
    # layout-independence: same kept set (and order) after a repartition
    got2 = [r["doc_id"] for r in
            weighted_sample(df.repartition(7), "text", "w",
                            n=20, id_col="doc_id").collect()]
    assert got2 == got


def test_weighted_sample_two_pass_identical_and_bounded_plan(spark):
    """The large-n quantile two-pass must return the IDENTICAL kept set as
    the single-pass path, and its top-n must consume a pre-filtered
    candidate set (Filter on samp_key under TakeOrderedAndProject), never
    a global sort (round-4 verdict item 5)."""
    from flink_rag_spark.operators.curation import weighted_sample

    rows = [(i, f"two pass sample doc {i} {'y' * (i % 13)}", (i % 5) + 1)
            for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long") \
        .repartition(8)
    one = [r["doc_id"] for r in
           weighted_sample(df, "text", "w", n=60, id_col="doc_id",
                           two_pass=False).collect()]
    two_df = weighted_sample(df, "text", "w", n=60, id_col="doc_id",
                             two_pass=True)
    two = [r["doc_id"] for r in two_df.collect()]
    assert two == one

    plan = two_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final  # per-partition heap, no sort
    assert "samp_key" in final.split("TakeOrderedAndProject")[1].split(
        "Scan")[0]  # the quantile cutoff filter feeds the top-n


def test_weighted_sample_two_pass_undershoot_falls_back(spark):
    """A margin too small to cover the quantile error must fall back to the
    exact path, not return fewer than n rows."""
    from flink_rag_spark.operators.curation import weighted_sample

    rows = [(i, f"fallback doc {i}", 1 + (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    out = weighted_sample(df, "text", "w", n=100, id_col="doc_id",
                          two_pass=True, margin=1.0, rel_err=0.5)
    exact = weighted_sample(df, "text", "w", n=100, id_col="doc_id",
                            two_pass=False)
    assert [r["doc_id"] for r in out.collect()] == \
        [r["doc_id"] for r in exact.collect()]


def test_split_assignments_partition_disjoint_and_aligned(spark):
    """Splits are a partition (each kept row gets exactly one label),
    sizes track fractions, assignments are deterministic, and two tables
    sharing the key split IDENTICALLY (the doc↔embedding alignment
    property RNG splits can't give)."""
    import pyspark.sql.functions as F

    from flink_rag_spark.operators.curation import split_assignments

    rows = [(i, f"document body number {i} with words") for i in range(3000)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    sa = split_assignments(a, "text", fr)
    assert sa.count() == 3000  # fractions sum to 1 → nothing dropped
    counts = {r["split"]: r["n"] for r in
              sa.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert abs(counts["train"] - 2400) < 150
    assert abs(counts["val"] - 300) < 80 and abs(counts["test"] - 300) < 80
    # cross-table alignment: a second frame with the same key column
    b = spark.createDataFrame(
        [(i, t, i * 2) for (i, t) in rows],
        "doc_id long, text string, extra long")
    sb = split_assignments(b, "text", fr)
    assert ({(r["doc_id"], r["split"]) for r in sa.collect()}
            == {(r["doc_id"], r["split"]) for r in sb.collect()})


def test_split_assignments_validation_and_remainder(spark):
    import pytest as pt

    from flink_rag_spark.operators.curation import split_assignments

    df = spark.createDataFrame([(i, f"t{i}") for i in range(2000)],
                               "doc_id long, text string")
    with pt.raises(ValueError, match="sum above 1"):
        split_assignments(df, "text", {"a": 0.9, "b": 0.2})
    with pt.raises(ValueError, match="non-empty"):
        split_assignments(df, "text", {})
    # fractions summing below 1: remainder dropped
    kept = split_assignments(df, "text", {"sample": 0.5})
    assert 0 < kept.count() < 2000
    assert kept.select("split").distinct().collect()[0]["split"] == "sample"
