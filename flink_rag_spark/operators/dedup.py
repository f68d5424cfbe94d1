"""Deduplication operator family (north-star ops; ABSENT in the reference —
SURVEY.md §2.2 row "Dedup").

All variants are shuffle-conscious:

- exact: hash-groupBy on the dedup key → one shuffle, map-side partial agg.
- minhash+LSH: shingles → shared polynomial hashes → minhash signature →
  band keys → groupBy band → pairs only within buckets. Shuffle volume is
  O(rows × bands), never O(rows²); candidate verification (exact Jaccard)
  touches only bucket-mates. This is the 100 TB near-dup path.
- simhash: one 32-bit fingerprint per doc, pairs within equal fingerprint
  blocks (or ≤ d Hamming via block-permutation at scale).
- n-gram Jaccard: exact pairwise verification, used standalone only at small
  scale or as the verify stage after LSH.
- embedding cosine: near-dup via knn_join on document embeddings.

Every hash here is the oracle-shared polynomial hash (functions/hashing.py),
so each variant has a value-exact DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.functions.hashing import POLY_P, minhash_params
from flink_rag_spark.operators.util import widen_if_narrow

# combining base for rolling k-token shingle hashes (prime, big enough to
# spread, small enough that h*B stays < 2^63 with h < POLY_P)
SHINGLE_BASE = 1_000_003


def token_hashes_expr(text: str) -> str:
    """array<bigint>: polynomial hash of each whitespace token of lower(text).

    Hashing per-token (not per-shingle-string) does the char-level fold ONCE
    per token; overlapping shingles then combine token hashes in O(k) —
    ~k× less interpreted-HOF work than hashing each shingle string."""
    toks = f"split(trim(lower({text})), '\\\\s+')"
    return (
        f"transform({toks}, t -> aggregate(split(t, ''), CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * 31 + ascii(c)) % {POLY_P}))"
    )


def shingle_hashes_expr(text: str, k: int) -> str:
    """array<bigint> of rolling hashes of the k-token shingles of `text`.

    Combination: h = fold over window ((h * SHINGLE_BASE + th[i+j]) % P).
    The token-hash array is bound ONCE as a lambda variable (the
    transform(array(..))[1] trick) so it isn't recomputed per window slot.
    try_element_at (ANSI-safe) + coalesce(…, 0) pads short documents, so
    every doc yields ≥1 shingle hash."""
    comb = "CAST(0 AS BIGINT)"
    for j in range(k):
        comb = (f"(({comb} * {SHINGLE_BASE} + "
                f"coalesce(try_element_at(th, i + {j}), CAST(0 AS BIGINT))) % {POLY_P})")
    return (
        f"element_at(transform(array({token_hashes_expr(text)}), "
        f"th -> transform(sequence(1, greatest(size(th) - {k - 1}, 1)), "
        f"i -> {comb})), 1)"
    )


def exact_dedup(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Exact dedup keeping the minimum id per key group — deterministic,
    unlike dropDuplicates() whose survivor depends on partition order."""
    return (df.groupBy(*keys)
            .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("group_size")))


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       cfg: EngineConfig = DEFAULT_CONFIG,
                       shingle_sets: DataFrame | None = None) -> DataFrame:
    """id + minhash signature columns mh0..mh{n-1}.

    Physical shape: explode the shingle hashes, then ONE codegen'd
    HashAggregate computing all n min((h*a+b)%P) columns — far faster than n
    interpreted array_min(transform(...)) passes, and map-side partial
    aggregation collapses each doc to one row per partition before the
    shuffle (shuffle volume = rows × n ints, independent of doc length).

    ``shingle_sets``: optional precomputed (id_col, sh: array<bigint>)
    frame — callers that also need the shingle sets (e.g. a downstream
    Jaccard verify) hash the text ONCE and derive the signatures from the
    array. Bit-identical to the text path: min() is insensitive to the
    duplicate shingles that array_distinct removed."""
    params = minhash_params(cfg.lsh_num_hashes, cfg.seed)
    if shingle_sets is not None:
        exploded = shingle_sets.select(
            F.col(id_col), F.explode("sh").alias("h"))
    else:
        exploded = widen_if_narrow(df).select(
            F.col(id_col),
            F.explode(F.expr(
                shingle_hashes_expr(text_col, cfg.shingle_size))).alias("h"),
        )
    aggs = [F.expr(f"min((h * {a} + {b}) % {POLY_P})").alias(f"mh{i}")
            for i, (a, b) in enumerate(params)]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_band_rows(df: DataFrame, text_col: str, id_col: str,
                  cfg: EngineConfig = DEFAULT_CONFIG,
                  shingle_sets: DataFrame | None = None) -> DataFrame:
    """(id, band, band_key) — one row per doc per LSH band.

    One band-struct array exploded in a single pass — a per-band UNION would
    recompute the (expensive) signature projection once per band branch.
    ``shingle_sets`` passes through to ``minhash_signatures``."""
    sigs = minhash_signatures(df, text_col, id_col, cfg,
                              shingle_sets=shingle_sets)
    rows = cfg.lsh_num_hashes // cfg.lsh_bands
    band_structs = []
    for b in range(cfg.lsh_bands):
        cols = [f"mh{b * rows + r}" for r in range(rows)]
        key = F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
        band_structs.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
    return (sigs.select(
        F.col(id_col),
        F.explode(F.array(*band_structs)).alias("bk"))
        .select(id_col, F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key")))


def lsh_bucket_stats(df: DataFrame, text_col: str, id_col: str,
                     cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """(band, band_key, n) sizes of every LSH bucket — the observability
    surface for the hot-bucket guard: run this (cheap — one aggregate) to
    see exactly which buckets exceed ``lsh_max_bucket`` and by how much."""
    return (lsh_band_rows(df, text_col, id_col, cfg)
            .groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("n")))


def lsh_candidate_pairs(df: DataFrame, text_col: str, id_col: str,
                        cfg: EngineConfig = DEFAULT_CONFIG,
                        max_bucket_size: int | None = None,
                        band_rows: DataFrame | None = None) -> DataFrame:
    """Candidate near-duplicate pairs from banded minhash LSH.

    Docs sharing ALL rows of at least one band collide. The self-join is on
    (band_idx, band_key) — an equi-join Catalyst executes as a shuffled hash
    join keyed by the band, so only bucket-mates ever meet.
    Returns distinct (id_a, id_b) with id_a < id_b.

    Hot-bucket guard: the band self-join is O(Σ bucket²), and web-scale
    corpora ALWAYS have degenerate buckets (empty docs, boilerplate
    headers, templated pages). Buckets larger than ``max_bucket_size``
    (default ``cfg.lsh_max_bucket``) switch from the all-pairs self-join to
    a STAR reduction: every member pairs with the bucket's min-id
    representative — O(B) pairs instead of O(B²). Every hot-bucket member
    still appears in ≥1 candidate pair, and clustering run DIRECTLY on the
    candidate pairs (union-find / connected components) produces identical
    groups, because the star keeps the bucket connected.

    Two readings DO change when a bucket trips the guard: (1) the
    non-transitive one — member↔member pairs of a hot bucket are
    represented through the rep instead of directly; (2) pipelines that
    insert a similarity VERIFY between candidates and clustering (e.g.
    ``jaccard_pairs(candidates=...)`` at a threshold, as
    dedup-group-assignment and decontamination do): a member↔member edge
    with jaccard ≥ t can be lost when jaccard(rep, member) < t, splitting
    a group the all-pairs path would keep. In practice hot buckets are
    boilerplate/empty-doc clusters whose members are near-identical to the
    rep, but when that guarantee matters, verify star edges at a lower
    threshold or raise ``max_bucket_size``. Bucket sizes are observable
    via ``lsh_bucket_stats`` — the guard is a documented strategy switch,
    not a silent truncation.

    ``band_rows``: precomputed (id, band, band_key) rows — pass them when
    the caller already materialized (e.g. persisted) the same frame, so
    the expensive minhash projection isn't rebuilt from text
    (incremental.py's probe reuses its batch signature cache this way).
    """
    if max_bucket_size is None:
        max_bucket_size = cfg.lsh_max_bucket
    exploded = (band_rows.select(id_col, "band", "band_key")
                if band_rows is not None
                else lsh_band_rows(df, text_col, id_col, cfg))
    # bucket size + representative via a WINDOW over (band, band_key), not
    # a groupBy+join-back: every consumer below (cold left/right, hot)
    # shares the identical exploded→exchange(band, band_key)→window
    # subtree, so Catalyst's ReuseExchange materializes the expensive
    # hashing pipeline ONCE and the self-join needs no further shuffle
    # (rows are already partitioned by the band key)
    from pyspark.sql import Window
    wb = Window.partitionBy("band", "band_key")
    tagged = (exploded
              .withColumn("_n", F.count(F.lit(1)).over(wb))
              .withColumn("_rep", F.min(F.col(id_col)).over(wb)))
    cold = tagged.filter(F.col("_n") <= max_bucket_size)
    left = cold.alias("l")
    right = cold.alias("r")
    cold_pairs = (left.join(right, on=["band", "band_key"])
                  .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
                  .select(F.col(f"l.{id_col}").alias("id_a"),
                          F.col(f"r.{id_col}").alias("id_b")))
    hot_pairs = (tagged.filter((F.col("_n") > max_bucket_size)
                               & (F.col(id_col) != F.col("_rep")))
                 .select(F.col("_rep").alias("id_a"),
                         F.col(id_col).alias("id_b")))
    return cold_pairs.unionByName(hot_pairs).distinct()


def verify_jaccard_candidates(candidates: DataFrame, sh: DataFrame,
                              id_col: str, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidate pairs against a
    per-doc shingle-set frame ``sh`` (id_col, sh array<bigint>). O(|pairs|):
    each pair equi-joins to its two shingle sets and array_intersect is a
    hash-set probe — no exploded self-join at any scale. The shingle frame
    may come from live computation or a persisted index (incremental.py)."""
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (candidates.join(a, on="id_a").join(b, on="id_b")
            .withColumn("n_common",
                        F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn("jaccard", F.round(
                F.col("n_common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                  threshold: float, cfg: EngineConfig = DEFAULT_CONFIG,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Without `candidates` this is an all-pairs check via shingle-hash
    explode + equi-join on the shingle (shuffle keyed by shingle hash —
    only docs sharing a shingle meet, never a true cross join).

    With `candidates` (e.g. LSH output) the work is O(|candidates|): each
    candidate pair equi-joins to the two per-doc shingle sets and the
    intersection is computed directly (array_intersect is a hash-set probe,
    O(|a|+|b|) per pair) — the exploded self-join path is never built, so
    the verify stage truly touches only candidate pairs at any scale.
    """
    sh = widen_if_narrow(df).select(
        F.col(id_col),
        F.array_distinct(
            F.expr(shingle_hashes_expr(text_col, cfg.shingle_size))).alias("sh"),
    )
    if candidates is not None:
        return verify_jaccard_candidates(candidates, sh, id_col, threshold)
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n"))
    tok = sh.select(F.col(id_col), F.explode("sh").alias("h"))
    inter = (tok.alias("a").join(tok.alias("b"), on="h")
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("n_common")))
    out = (inter
           .join(sizes.withColumnRenamed(id_col, "id_a")
                      .withColumnRenamed("n", "n_a"), on="id_a")
           .join(sizes.withColumnRenamed(id_col, "id_b")
                      .withColumnRenamed("n", "n_b"), on="id_b")
           .withColumn("jaccard", F.round(
               F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str,
                         cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """(id, simhash) — 64-bit simhash over whitespace-token hashes.

    Bit i votes on ``parity((h * a_i + b_i) mod P)`` (64 independent 1-bit
    hashes — the polynomial token hash itself is mod P < 2^31, so its raw
    high bits carry no entropy; see functions.hashing.simhash_bit_params).

    Physical shape mirrors minhash_signatures: explode token hashes, one
    codegen'd HashAggregate computes all 64 bit-votes (sum of ±1 per bit),
    then the fingerprint reassembles from the vote signs. Two narrow
    projections + one keyed aggregate — no interpreted nested-HOF tree."""
    from flink_rag_spark.functions.hashing import simhash_fp_spark_terms
    vote_exprs, fp = simhash_fp_spark_terms(cfg.simhash_bits, cfg.seed)
    exploded = widen_if_narrow(df).select(
        F.col(id_col),
        F.explode(F.expr(token_hashes_expr(text_col))).alias("h"),
    )
    votes = exploded.groupBy(id_col).agg(*[
        F.expr(v).alias(f"v{i}") for i, v in enumerate(vote_exprs)])
    return votes.select(F.col(id_col), F.expr(fp).alias("simhash"))


def simhash_candidate_pairs(df: DataFrame, text_col: str, id_col: str,
                            max_hamming: int = 3,
                            cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Near-dup pairs by simhash: block on the 4 16-bit quarters of the
    fingerprint (pigeonhole: hamming ≤ 3 ⇒ at least one quarter equal),
    verify exact Hamming distance with bit_count(xor). Equi-join on
    (quarter_idx, quarter) — candidates meet only inside blocks, never a
    cross join.

    Scale geometry: 4 × 2^16 = 262,144 distinct join keys (vs 1,024 for the
    old 8-bit-byte blocking) — at 10^9 docs the expected block population is
    ~4k docs, keeping the within-block self-join bounded; and a 64-bit
    fingerprint doesn't birthday-collide unrelated docs until ~2^32 docs."""
    fps = simhash_fingerprints(df, text_col, id_col, cfg)
    n_blocks = cfg.simhash_bits // 16
    blocks = fps.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("blk"),
                # arithmetic shift + mask is sign-safe for the top quarter
                F.expr(f"shiftright(simhash, {16 * b}) & 65535")
                 .alias("quarter"))
            for b in range(n_blocks)])).alias("bb"))\
        .select(id_col, "simhash", F.col("bb.blk").alias("blk"),
                F.col("bb.quarter").alias("quarter"))
    l, r = blocks.alias("l"), blocks.alias("r")
    return (l.join(r, on=["blk", "quarter"])
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.expr("bit_count(l.simhash ^ r.simhash)").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def span_pairs(df: DataFrame, text_col: str, id_col: str,
               span_tokens: int = 8,
               max_span_docs: int = 64) -> DataFrame:
    """Exact-substring dedup: (id_a, id_b, n_spans) for every document pair
    sharing at least one identical run of ``span_tokens`` consecutive
    tokens, where ``n_spans`` counts the distinct shared spans.

    This is the substring-level dedup family (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): unlike
    minhash/Jaccard — which score WHOLE-document set overlap — a single
    long verbatim quotation inside two otherwise-different documents is
    caught here, because any shared ≥span_tokens run yields a shared span
    hash. Reuses the family's rolling shingle hash (and its short-document
    padding semantics), so the DuckDB oracle replays it exactly.

    Plan at 100 TB: one explode of per-doc DISTINCT span hashes, one
    window + one self-equi-join, both shuffling on the span hash (the
    window's exchange is reused by the join sides). The hot-span guard
    mirrors ``lsh_candidate_pairs``: a span present in more than
    ``max_span_docs`` documents (license boilerplate, navigation chrome)
    is star-reduced — each member pairs only with the span's min-id
    representative — so a span shared by 10^6 docs emits O(10^6) pairs,
    never O(10^12). Output is bounded by true-duplicate mass plus the
    star edges; the final pair aggregation map-side-combines per
    partition.
    """
    spans = widen_if_narrow(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.expr(shingle_hashes_expr(text_col, span_tokens)))).alias("sp"))
    from pyspark.sql import Window
    w = Window.partitionBy("sp")
    sized = (spans
             .withColumn("_n", F.count(F.lit(1)).over(w))
             .withColumn("_rep", F.min(F.col(id_col)).over(w)))
    cold = sized.filter(F.col("_n") <= max_span_docs).select("sp", id_col)
    l = cold.select("sp", F.col(id_col).alias("id_a"))
    r = cold.select("sp", F.col(id_col).alias("id_b"))
    cold_pairs = (l.join(r, on="sp")
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("sp", "id_a", "id_b"))
    # rep = min id in the span's doc set, so rep < member always holds
    hot_pairs = (sized.filter((F.col("_n") > max_span_docs)
                              & (F.col(id_col) != F.col("_rep")))
                 .select("sp", F.col("_rep").alias("id_a"),
                         F.col(id_col).alias("id_b")))
    return (cold_pairs.unionByName(hot_pairs)
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_spans")))


CONTAINMENT_DP = 6


def span_containment(df: DataFrame, text_col: str, id_col: str,
                     span_tokens: int = 8, max_span_docs: int = 64,
                     min_containment: float = 0.5) -> DataFrame:
    """Doc-in-doc detection: directional span CONTAINMENT, the measure
    Jaccard-family dedup structurally misses — a short document quoted
    verbatim inside a much longer one has tiny Jaccard (the union is
    dominated by the long doc) but containment ≈ 1 on the short side.
    For every pair sharing ≥1 identical ``span_tokens``-token run:

        containment_a = shared_spans / n_a   (share of a's distinct
        spans that b also has), and symmetrically containment_b

    keeping pairs where EITHER direction reaches ``min_containment``
    (the quote/subset signal). Returns (id_a, id_b, shared_spans, n_a,
    n_b, containment_a, containment_b).

    Plan: the pair frame IS ``span_pairs`` (same hashes, same hot-span
    star-reduction — shared counts for star-reduced spans are bounded
    below, documented there); per-doc distinct-span counts are a pure
    SCAN-side expression (size ∘ array_distinct — no explode, no extra
    shuffle) joined onto the k-bounded pair frame."""
    pairs = span_pairs(df, text_col, id_col, span_tokens, max_span_docs)
    counts = widen_if_narrow(df).select(
        F.col(id_col),
        F.expr(f"size(array_distinct("
               f"{shingle_hashes_expr(text_col, span_tokens)}))")
        .cast("bigint").alias("_n"))
    joined = (pairs
              .join(counts.select(F.col(id_col).alias("id_a"),
                                  F.col("_n").alias("n_a")), on="id_a")
              .join(counts.select(F.col(id_col).alias("id_b"),
                                  F.col("_n").alias("n_b")), on="id_b"))
    # threshold on the RAW ratios (the oracle does too) — filtering on
    # the rounded output would diverge on boundary-adjacent pairs
    return (joined
            .filter(F.greatest(F.col("n_spans") / F.col("n_a"),
                               F.col("n_spans") / F.col("n_b"))
                    >= F.lit(min_containment))
            .select("id_a", "id_b",
                    F.col("n_spans").alias("shared_spans"), "n_a", "n_b",
                    F.round(F.col("n_spans") / F.col("n_a"),
                            CONTAINMENT_DP).alias("containment_a"),
                    F.round(F.col("n_spans") / F.col("n_b"),
                            CONTAINMENT_DP).alias("containment_b")))


def span_containment_duck(table: str, text_col: str, id_col: str,
                          span_tokens: int = 8, max_span_docs: int = 64,
                          min_containment: float = 0.5) -> str:
    """DuckDB mirror of :func:`span_containment` — the span_pairs
    mirror joined with the same scan-side distinct-span counts."""
    from flink_rag_spark.functions.hashing import shingle_hashes_duck
    sh = shingle_hashes_duck(text_col, span_tokens)
    base = span_pairs_duck(table, text_col, id_col, span_tokens,
                           max_span_docs)
    return f"""
WITH shared AS ({base}),
counts AS (
  SELECT {id_col}, CAST(len(list_distinct({sh})) AS BIGINT) AS n
  FROM {table})
SELECT s.id_a, s.id_b, CAST(s.n_spans AS BIGINT) AS shared_spans,
       ca.n AS n_a, cb.n AS n_b,
       ROUND(s.n_spans / CAST(ca.n AS DOUBLE), {CONTAINMENT_DP})
         AS containment_a,
       ROUND(s.n_spans / CAST(cb.n AS DOUBLE), {CONTAINMENT_DP})
         AS containment_b
FROM shared s
JOIN counts ca ON ca.{id_col} = s.id_a
JOIN counts cb ON cb.{id_col} = s.id_b
WHERE GREATEST(s.n_spans / CAST(ca.n AS DOUBLE),
               s.n_spans / CAST(cb.n AS DOUBLE)) >= {min_containment}
"""


def span_pairs_duck(table: str, text_col: str, id_col: str,
                    span_tokens: int = 8,
                    max_span_docs: int = 64) -> str:
    """DuckDB mirror of ``span_pairs`` — same span hashes (family rolling
    shingle hash), same hot-span star-reduction, same distinct-span count."""
    from flink_rag_spark.functions.hashing import shingle_hashes_duck
    sh = shingle_hashes_duck(text_col, span_tokens)
    return f"""
WITH sp AS (
  SELECT {id_col}, unnest(list_distinct({sh})) AS sp FROM {table}),
sized AS (
  SELECT {id_col}, sp,
         COUNT(*) OVER (PARTITION BY sp) AS n,
         MIN({id_col}) OVER (PARTITION BY sp) AS rep
  FROM sp),
cold AS (SELECT sp, {id_col} FROM sized WHERE n <= {max_span_docs}),
pairs AS (
  SELECT a.sp, a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM cold a JOIN cold b USING (sp)
  WHERE a.{id_col} < b.{id_col}
  UNION ALL
  SELECT sp, rep AS id_a, {id_col} AS id_b
  FROM sized WHERE n > {max_span_docs} AND {id_col} <> rep)
SELECT id_a, id_b, COUNT(*) AS n_spans
FROM pairs GROUP BY id_a, id_b
"""
