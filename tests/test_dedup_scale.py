"""Scale-geometry guarantees of the near-dup family.

Correctness of the dedup operators is pinned by the DuckDB oracles
(test_oracle_parity); these tests pin the properties that only MATTER at
scale — block-key cardinality (the quadratic-blowup guard for simhash) and
bounded candidate counts on adversarial hot buckets (the LSH guard).
"""

import pyspark.sql.functions as F

from flink_rag_spark.config import DEFAULT_CONFIG
from flink_rag_spark.operators.dedup import (
    lsh_bucket_stats,
    lsh_candidate_pairs,
    simhash_candidate_pairs,
    simhash_fingerprints,
)
from flink_rag_spark.sources.tables import load_table


def test_simhash_block_key_space_is_16bit_quarters(spark, sf_smoke):
    """The blocking join key space must be 4 × 2^16 = 262,144 (16-bit
    quarters), not the old 4 × 256 byte space — at 10^8+ docs the byte
    geometry turns every block into a quadratic hot key."""
    cfg = DEFAULT_CONFIG
    assert cfg.simhash_bits == 64
    assert cfg.simhash_bits // 16 * (1 << 16) == 262_144

    d = load_table(spark, sf_smoke, "documents")
    fps = simhash_fingerprints(d, "text", "doc_id", cfg)
    quarters = fps.select(
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("blk"),
                     F.expr(f"shiftright(simhash, {16 * b}) & 65535")
                      .alias("quarter"))
            for b in range(4)])).alias("bb")).select("bb.blk", "bb.quarter")
    stats = quarters.agg(
        F.countDistinct("blk", "quarter").alias("n_keys"),
        F.max("quarter").alias("max_q"),
        F.min("quarter").alias("min_q")).first()
    n_docs = d.count()
    # keys must spread far beyond the 1,024-key byte geometry: with 16-bit
    # quarters, n_docs × 4 block rows should occupy ~that many distinct keys
    assert stats["n_keys"] > min(4 * n_docs, 65_536) * 0.5, stats
    assert stats["max_q"] > 255, "quarters never exceed a byte — still 8-bit blocks?"
    assert 0 <= stats["min_q"] <= stats["max_q"] <= 65_535


def test_simhash_uses_all_64_bits(spark, sf_smoke):
    """The fingerprint must carry entropy in the high 32 bits (the raw
    polynomial token hash is < 2^31 — without per-bit rehashing the top bits
    would be constant zero and the top two quarters would collapse to one
    join key)."""
    d = load_table(spark, sf_smoke, "documents")
    fps = simhash_fingerprints(d, "text", "doc_id")
    hi = fps.agg(
        F.countDistinct(F.expr("shiftright(simhash, 32) & 4294967295"))
         .alias("n_hi"),
        F.sum(F.expr("CASE WHEN simhash < 0 THEN 1 ELSE 0 END"))
         .alias("n_negative")).first()
    n_docs = d.count()
    assert hi["n_hi"] > n_docs * 0.5, hi  # high halves are diverse
    # bit 63 is a fair coin across docs → some fingerprints negative
    assert 0 < hi["n_negative"] < n_docs, hi


def test_simhash_pairs_only_near_duplicates(spark, sf_smoke):
    """hamming ≤ 3 on 64 bits: every returned pair is a genuine near-dup
    (identical docs → hamming 0), and candidate volume stays near the true
    duplicate count, not the 32-bit birthday-collision volume."""
    d = load_table(spark, sf_smoke, "documents")
    pairs = simhash_candidate_pairs(d, "text", "doc_id", max_hamming=3)
    rows = pairs.collect()
    exact_dups = (d.groupBy("text").count().filter(F.col("count") > 1)
                  .agg(F.sum(F.expr("count * (count - 1) / 2"))).first()[0]) or 0
    n_docs = d.count()
    assert all(r["hamming"] <= 3 for r in rows)
    # pair volume is O(true dups), never a constant fraction of n_docs²
    assert len(rows) >= exact_dups
    assert len(rows) < n_docs * 5


def test_connected_components_chain_and_islands(spark):
    """A 6-node chain (diameter 5 — worst case per edge count), a triangle,
    and an isolated pair must resolve to three components labeled by their
    min ids — under BOTH strategies (driver union-find and the distributed
    min-label loop, forced via driver_max_edges=0)."""
    from flink_rag_spark.operators.graph import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),      # chain
         (10, 11), (11, 12), (10, 12),                # triangle
         (20, 21)],                                   # pair
        "id_a long, id_b long")
    want = ({(n, 1) for n in range(1, 7)}
            | {(n, 10) for n in (10, 11, 12)}
            | {(20, 20), (21, 20)})
    for driver_max in (0, 10 ** 6):
        got = {(r["node"], r["group_rep"])
               for r in connected_components(
                   pairs, driver_max_edges=driver_max).collect()}
        assert got == want, f"driver_max_edges={driver_max}"


def test_connected_components_raises_without_convergence(spark):
    from flink_rag_spark.operators.graph import connected_components
    import pytest
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2, driver_max_edges=0)


def _identical_docs(spark, n):
    """The adversarial shape web-scale dedup always hits: one giant bucket
    of boilerplate-identical documents."""
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.lit("the exact same boilerplate header text "
                          "repeated on every single page").alias("text")))


def test_lsh_hot_bucket_star_reduction_bounds_pairs(spark):
    docs = _identical_docs(spark, 1000)
    guarded = lsh_candidate_pairs(docs, "text", "doc_id", max_bucket_size=50)
    rows = guarded.collect()
    # star reduction: every member pairs with the min-id representative
    # exactly once — 999 pairs, not 1000*999/2 = 499,500
    assert len(rows) == 999
    assert all(r["id_a"] == 0 for r in rows)
    assert sorted(r["id_b"] for r in rows) == list(range(1, 1000))


def test_lsh_guard_keeps_cold_buckets_exact(spark, sf_smoke):
    """Below the threshold the guarded path must produce byte-identical
    candidates to the unguarded all-pairs join."""
    d = load_table(spark, sf_smoke, "documents")
    biggest = (lsh_bucket_stats(d, "text", "doc_id")
               .agg(F.max("n")).first()[0])
    unguarded = lsh_candidate_pairs(d, "text", "doc_id",
                                    max_bucket_size=biggest)
    default = lsh_candidate_pairs(d, "text", "doc_id")
    a = sorted((r["id_a"], r["id_b"]) for r in unguarded.collect())
    b = sorted((r["id_a"], r["id_b"]) for r in default.collect())
    assert a == b
    assert biggest <= DEFAULT_CONFIG.lsh_max_bucket, (
        "sf0.001 data already exceeds the default guard — the graded "
        "oracle would diverge")


def test_lsh_star_preserves_duplicate_groups(spark):
    """Union-find components over guarded pairs must equal components over
    unguarded pairs — the guard changes pair REPRESENTATION, not grouping."""
    import pyspark.sql.types as T
    base = [(i, f"unique document number {i} with its own words {i * 7}")
            for i in range(20)]
    dups = [(100 + i, "identical duplicated content block for grouping")
            for i in range(40)]
    docs = spark.createDataFrame(base + dups, schema=T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType())]))

    def components(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs.collect():
            ra, rb = find(r["id_a"]), find(r["id_b"])
            if ra != rb:
                parent[ra] = rb
        groups = {}
        for x in list(parent):
            groups.setdefault(find(x), set()).add(x)
        return {frozenset(g) for g in groups.values()}

    guarded = lsh_candidate_pairs(docs, "text", "doc_id", max_bucket_size=10)
    unguarded = lsh_candidate_pairs(docs, "text", "doc_id",
                                    max_bucket_size=10_000)
    assert components(guarded) == components(unguarded)


def test_star_components_keeps_self_loop_only_nodes(spark):
    """A node appearing only as a self pair must come out as its own
    component from EVERY strategy — the output node set cannot depend on
    which path ran (round-4 ADVICE: star_components dropped them)."""
    from flink_rag_spark.operators.graph import star_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 7)], "id_a long, id_b long")
    got = {(r["node"], r["group_rep"])
           for r in star_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7)}
