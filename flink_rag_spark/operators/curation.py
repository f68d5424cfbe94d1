"""Training-data curation operators (north-star ops; ABSENT in the
reference — the reference ingests whole documents as single segments,
``StreamingStoreKnowledge.java:44-52``, which caps its corpora at
short-document scale).

- ``chunk_documents``: overlapping token-window chunking — the standard
  RAG/pre-training preprocessing step. Pure narrow projection +
  posexplode: no shuffle, embarrassingly parallel, output rows ≈
  tokens/stride per doc regardless of document length, so one pathological
  100 MB document costs O(its tokens), not O(its tokens × chunks).
- ``hash_sample``: DETERMINISTIC content-hash sampling — reproducible
  train/holdout downsampling. Unlike ``df.sample`` (seeded per-partition
  RNG: resampling after a repartition or file re-split changes the kept
  set), the keep decision is a pure function of row content, so the same
  document is kept in every run, on any cluster layout, at any scale —
  the property training-data pipelines actually need. One narrow filter,
  pushed to the scan.

Both are value-exact oracle-checkable (shared polynomial hash / identical
slice semantics in DuckDB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.functions.hashing import POLY_P, poly_hash_expr

DEFAULT_CHUNK_TOKENS = 64
DEFAULT_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    window: int = DEFAULT_CHUNK_TOKENS,
                    stride: int = DEFAULT_CHUNK_STRIDE,
                    carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, *carry_cols, chunk_id, chunk_text, chunk_tokens) — overlapping
    token windows.

    chunk i covers tokens [i·stride, i·stride + window); the last chunk
    starts at the first stride-multiple covering the tail, so every token
    appears in ≥1 chunk and consecutive chunks overlap by window - stride
    tokens. Whitespace tokenization; chunks re-join with single spaces.
    NULL text behaves like empty text — one empty chunk — so no document
    ever silently disappears from the chunked output (split(NULL) is NULL
    and posexplode of NULL emits nothing; the coalesce prevents that).
    ``carry_cols`` ride along unchanged (streaming callers use this instead
    of a join-back, which would be a stream-stream self-join)."""
    assert 0 < stride <= window, "stride must be in (0, window]"
    toks = f"split(trim(coalesce({text_col}, '')), '\\\\s+')"
    n_extra = f"CAST(ceil(greatest(size({toks}) - {window}, 0) / {stride}) AS INT)"
    chunks = (f"transform(sequence(0, {n_extra}), "
              f"i -> slice({toks}, i * {stride} + 1, {window}))")
    return (df.select(
        F.col(id_col), *[F.col(c) for c in carry_cols],
        F.posexplode(F.expr(chunks)).alias("chunk_id", "_chunk_toks"))
        .select(
            id_col, *carry_cols,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.array_join("_chunk_toks", " ").alias("chunk_text"),
            F.size("_chunk_toks").cast("bigint").alias("chunk_tokens")))


def hash_sample(df: DataFrame, key_col: str, keep_pct: int,
                buckets: int = 100) -> DataFrame:
    """Keep rows whose content-hash bucket falls below ``keep_pct`` (of
    ``buckets``) — a reproducible ~keep_pct/buckets sample.

    The bucket is ``poly_hash(key) mod buckets``: stable across runs,
    partitionings and engines (the oracle computes the identical fold), and
    consistent BETWEEN datasets — sampling two tables by the same key keeps
    aligned rows, which seeded RNG sampling cannot do."""
    assert 0 <= keep_pct <= buckets
    bucket = F.expr(f"pmod({poly_hash_expr(key_col)}, {buckets})")
    return (df.withColumn("sample_bucket", bucket.cast("bigint"))
            .filter(F.col("sample_bucket") < keep_pct))


def quality_filter(df: DataFrame, text_col: str, id_col: str,
                   min_tokens: int = 24, max_punct_ratio: float = 0.2,
                   min_stop_ratio: float = 0.03,
                   max_chars_per_token: float = 5.75,
                   carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Composite document-quality verdict — the keep/drop decision stage of
    a training-data pipeline, built from the engine's text signals:

    - too_short: fewer than ``min_tokens`` whitespace tokens
    - too_punctuated: punctuation ratio above ``max_punct_ratio``
    - low_stopword: the BEST stopword ratio across all known languages
      below ``min_stop_ratio`` (language-agnostic naturalness test —
      gibberish scores near zero in every language)
    - long_tokens: mean chars/token above ``max_chars_per_token``
      (base64 blobs, URLs, code)

    Returns (id, n_tokens, keep, reasons_csv) with reasons in a fixed
    order — fully deterministic SQL, value-exact against the DuckDB
    mirror. One narrow projection: at 100 TB this is a single scan with
    every signal computed in one pass, no shuffle."""
    from flink_rag_spark.functions.textfns import (
        LANG_MARKERS,
        punct_ratio_expr,
        stopword_ratio_expr,
        token_count_expr,
    )
    nt = token_count_expr(text_col)
    best_stop = "greatest(" + ", ".join(
        stopword_ratio_expr(text_col, LANG_MARKERS[c])
        for c in sorted(LANG_MARKERS)) + ")"
    cpt = f"length({text_col}) / greatest({nt}, 1)"
    checks = [
        ("too_short", f"{nt} < {min_tokens}"),
        ("too_punctuated", f"{punct_ratio_expr(text_col)} > {max_punct_ratio}"),
        ("low_stopword", f"{best_stop} < {min_stop_ratio}"),
        ("long_tokens", f"{cpt} > {max_chars_per_token}"),
    ]
    reasons = ("filter(array(" + ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for name, cond in checks)
        + "), x -> x IS NOT NULL)")
    # carry_cols: composed pipelines keep original columns in the SAME
    # one-pass scan instead of joining the verdict back to the source
    # (which would scan the text twice at 100 TB)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.expr(nt).cast("bigint").alias("n_tokens"),
        F.expr(f"size({reasons}) = 0").alias("keep"),
        F.expr(f"array_join({reasons}, ',')").alias("reasons_csv"))


def quality_filter_duck(text_col: str, min_tokens: int = 24,
                        max_punct_ratio: float = 0.2,
                        min_stop_ratio: float = 0.03,
                        max_chars_per_token: float = 5.75) -> str:
    """DuckDB SELECT-fragment mirror of quality_filter (same checks, same
    fixed reason order); caller prepends the id column."""
    from flink_rag_spark.functions.textfns import (
        LANG_MARKERS,
        punct_ratio_duck,
        stopword_ratio_duck,
        token_count_duck,
    )
    nt = token_count_duck(text_col)
    best_stop = "greatest(" + ", ".join(
        stopword_ratio_duck(text_col, LANG_MARKERS[c])
        for c in sorted(LANG_MARKERS)) + ")"
    cpt = f"length({text_col}) / greatest({nt}, 1)"
    checks = [
        ("too_short", f"{nt} < {min_tokens}"),
        ("too_punctuated", f"{punct_ratio_duck(text_col)} > {max_punct_ratio}"),
        ("low_stopword", f"{best_stop} < {min_stop_ratio}"),
        ("long_tokens", f"{cpt} > {max_chars_per_token}"),
    ]
    reasons = ("list_filter([" + ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for name, cond in checks)
        + "], x -> x IS NOT NULL)")
    # COALESCE: DuckDB's array_to_string of an empty list is NULL, Spark's
    # array_join is ''
    return (f"CAST({nt} AS BIGINT) AS n_tokens, "
            f"len({reasons}) = 0 AS keep, "
            f"COALESCE(array_to_string({reasons}, ','), '') AS reasons_csv")


def stratified_cap(df: DataFrame, group_cols: list[str], key_col: str,
                   id_col: str, n_per_group: int) -> DataFrame:
    """Cap every group at ``n_per_group`` rows, chosen DETERMINISTICALLY:
    rows rank by (content-hash of ``key_col``, id) within the group, so the
    kept set is a pure function of the data — stable across runs, layouts
    and engines — while the hash ordering makes it an unbiased draw rather
    than 'first N in storage order'. The balanced-per-class downsampling
    step of training-data curation (e.g. cap every language at N docs).

    One shuffle on the group key; a pathologically hot group is bounded by
    the window's per-partition sort, and the output is ≤ groups × n rows."""
    from pyspark.sql import Window
    w = Window.partitionBy(*group_cols).orderBy(
        F.expr(poly_hash_expr(key_col)), F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per_group).drop("_rn"))


def hash_bucket_duck(key_col: str, buckets: int = 100) -> str:
    """DuckDB mirror of hash_sample's bucket expression (pmod semantics)."""
    from flink_rag_spark.functions.hashing import poly_hash_duck
    h = poly_hash_duck(key_col)
    return f"((({h}) % {buckets} + {buckets}) % {buckets})"


def hash_sample_duck(key_col: str, keep_pct: int, buckets: int = 100) -> str:
    """DuckDB WHERE-clause mirror of hash_sample's keep decision."""
    return f"{hash_bucket_duck(key_col, buckets)} < {keep_pct}"


#: above this n the TakeOrderedAndProject driver merge (partitions × n
#: rows) stops being "driver comfort" and the quantile two-pass kicks in
TWO_PASS_SAMPLE_MIN_N = 100_000

#: decimal places the A-Res sampling key is quantized to — engine ln()
#: implementations disagree at the last ulp, and 12 dp is far below any
#: real weight resolution while far above double noise
SAMPLE_KEY_DP = 12


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    n: int, id_col: str | None = None,
                    two_pass: bool | None = None,
                    margin: float = 1.5,
                    rel_err: float = 1e-4) -> DataFrame:
    """DETERMINISTIC weighted sampling without replacement (temperature /
    quality-weighted corpus selection): keep the ``n`` rows with the
    largest ``ln(u) / w`` where ``u`` is a content-hash uniform in (0, 1]
    and ``w`` the row's weight — the A-Res (Efraimidis-Spirakis) reservoir
    key, under which row i wins with probability proportional to w_i.

    Same contract as ``hash_sample``: the keep decision is a pure function
    of row content + weight, so the kept set survives repartitioning,
    re-runs and engine changes (the oracle computes the identical key).

    Small n (the default path): ``orderBy(...).limit(n)`` plans as
    TakeOrderedAndProject — each partition ships only its local top-n,
    never a full sort; the driver merges partitions × n candidate rows.

    Large n (``two_pass=True``, auto above ``TWO_PASS_SAMPLE_MIN_N``): the
    driver merge itself is the bottleneck, so an approx-quantile cutoff on
    the SAME key first filters to ~``margin``·n candidates distributed
    across executors, and only that bounded set enters the top-n. The
    margin makes an undershoot (approx quantile slightly too selective)
    statistically negligible; if it still happens the operator falls back
    to the exact single-pass path, so the result set is IDENTICAL either
    way (asserted in tests/test_curation.py). Costs two extra bounded
    jobs (count + quantile sketch), the standard trade at corpus scale.
    """
    u = f"(({poly_hash_expr(key_col)}) + 1) / CAST({POLY_P + 1} AS DOUBLE)"
    # the key is quantized to SAMPLE_KEY_DP: ln is a libm transcendental
    # whose last ulp differs between the JVM and other engines, so the
    # raw double is NOT engine-portable — the 12-dp round keeps ~9
    # significant digits on the smallest keys (|key| ≤ ln(P+1)/w) while
    # the id tiebreak keeps the order deterministic under any ties
    k = F.round(F.expr(f"ln({u})") / F.col(weight_col), SAMPLE_KEY_DP)
    out = df.withColumn("samp_key", k)
    order = [F.desc("samp_key")] + ([F.col(id_col)] if id_col else [])
    if two_pass is None:
        two_pass = n >= TWO_PASS_SAMPLE_MIN_N
    if two_pass:
        total = out.count()
        if total > n:
            frac = min(1.0, (n * margin) / total)
            (cut,) = out.stat.approxQuantile(
                "samp_key", [max(0.0, 1.0 - frac)], rel_err)
            cand = out.filter(F.col("samp_key") >= cut)
            if cand.count() >= n:
                out = cand
    return out.orderBy(*order).limit(n)


def weighted_sample_key_duck(key_col: str, weight_col: str) -> str:
    """DuckDB mirror of weighted_sample's ranking key — same 12-dp
    quantization killing the engines' ln() ulp disagreement."""
    from flink_rag_spark.functions.hashing import poly_hash_duck
    return (f"ROUND(ln((({poly_hash_duck(key_col)}) + 1) "
            f"/ CAST({POLY_P + 1} AS DOUBLE)) / {weight_col}, "
            f"{SAMPLE_KEY_DP})")


def mixture_sample(df: DataFrame, domain_col: str, key_col: str,
                   target_weights: dict[str, float]) -> DataFrame:
    """Downsample domains so the OUTPUT mixture matches ``target_weights``
    — the data-mixing stage of a training pipeline (e.g. re-weight web vs
    books vs code before tokenization).

    No domain is upsampled: the output total T is the largest achievable
    under the targets, T = min_d(n_d / w_d), and each domain keeps rows
    with probability p_d = (w_d · T) / n_d via the shared content-hash
    uniform — deterministic across runs/partitionings/engines, and
    consistent BETWEEN datasets like hash_sample. The bottleneck domain
    (the arg-min) keeps everything (p = 1 exactly). Domains absent from
    ``target_weights`` are dropped (weight 0); weights need not sum to 1
    (only ratios matter). Per-domain realized counts are binomial around
    w_d · T — exact-count mixing would need a per-domain rank, one more
    shuffle, for no practical gain at corpus scale.

    Cost: one bounded groupBy-collect (rows = |domains|) + one narrow
    filtered scan. The p_d thresholds enter the plan as literals, so the
    scan stays a single pass with a pushable domain filter.
    """
    if not target_weights or any(w <= 0 for w in target_weights.values()):
        raise ValueError("target_weights must be non-empty and positive")
    counts = {r["d"]: r["n"] for r in
              (df.groupBy(F.col(domain_col).alias("d"))
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    missing = [d for d in target_weights if counts.get(d, 0) == 0]
    if missing:
        raise ValueError(
            f"target domains absent from the data: {sorted(missing)}")
    # float expression order mirrors the DuckDB oracle exactly:
    # T = min(n/w); p = (w * T) / n  — IEEE-identical on both engines
    total = min(float(counts[d]) / w for d, w in target_weights.items())
    u = f"(({poly_hash_expr(key_col)}) + 1) / CAST({POLY_P + 1} AS DOUBLE)"
    keep = None
    for d, w in sorted(target_weights.items()):
        p = (w * total) / float(counts[d])
        cond = (F.col(domain_col) == d) & (F.expr(u) < F.lit(p))
        keep = cond if keep is None else (keep | cond)
    return df.filter(keep)


def mixture_sample_duck(table: str, domain_col: str, key_col: str,
                        target_weights: dict[str, float],
                        select_cols: str) -> str:
    """DuckDB mirror of mixture_sample: same T/p arithmetic (n cast to
    DOUBLE, p = (w * T) / n), same content-hash uniform."""
    from flink_rag_spark.functions.hashing import poly_hash_duck
    vals = ", ".join(f"('{d}', {w!r})"
                     for d, w in sorted(target_weights.items()))
    u = f"((({poly_hash_duck(key_col)}) + 1) / CAST({POLY_P + 1} AS DOUBLE))"
    return f"""
WITH w({domain_col}, wt) AS (VALUES {vals}),
c AS (SELECT {domain_col}, CAST(COUNT(*) AS DOUBLE) AS n
      FROM {table} GROUP BY {domain_col}),
t AS (SELECT MIN(n / wt) AS total FROM c JOIN w USING ({domain_col})),
p AS (SELECT {domain_col}, (wt * (SELECT total FROM t)) / n AS p
      FROM c JOIN w USING ({domain_col}))
SELECT {select_cols} FROM {table} d JOIN p USING ({domain_col})
WHERE {u} < p.p
"""


def split_assignments(df: DataFrame, key_col: str,
                      fractions: dict[str, float],
                      buckets: int = 10_000) -> DataFrame:
    """Deterministic dataset splitting (train/val/test): assign every row
    a split label from its content-hash bucket, with cumulative-fraction
    thresholds over ``buckets`` — the splitting stage of a training
    pipeline.

    Hash-based (like ``hash_sample``), so the assignment is stable across
    runs, partitionings, engines AND datasets: any table split by the
    same key puts aligned rows in the same split — the property that
    keeps a document and its embedding row on the same side of the
    train/test wall, which RNG splitting cannot guarantee. Fractions
    need not sum to 1 (the remainder gets no label → dropped);
    thresholds are integer bucket counts (floor), so realized sizes are
    exact to 1/buckets. Split names assign in sorted order — stable
    under dict reordering.
    """
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-empty and non-negative")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("fractions sum above 1")
    bucket = F.expr(f"pmod({poly_hash_expr(key_col)}, {buckets})")
    out = df.withColumn("_sb", bucket)
    expr = None
    lo = 0
    for name in sorted(fractions):
        hi = lo + int(fractions[name] * buckets)
        cond = (F.col("_sb") >= lo) & (F.col("_sb") < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    out = (out.withColumn("split", expr)
           .filter(F.col("split").isNotNull()).drop("_sb"))
    return out


def split_assignments_duck(key_col: str, fractions: dict[str, float],
                           buckets: int = 10_000) -> str:
    """DuckDB mirror of split_assignments' CASE thresholds (same floor
    arithmetic, same sorted-name order); yields a `split` expression to
    select alongside the row."""
    from flink_rag_spark.functions.hashing import poly_hash_duck
    b = f"(({poly_hash_duck(key_col)}) % {buckets} + {buckets}) % {buckets}"
    cases = []
    lo = 0
    for name in sorted(fractions):
        hi = lo + int(fractions[name] * buckets)
        cases.append(f"WHEN {b} >= {lo} AND {b} < {hi} THEN '{name}'")
        lo = hi
    return "CASE " + " ".join(cases) + " END"


#: the canonical n-gram size for benchmark decontamination (the GPT-3
#: recipe removed training text sharing any 13-gram with an eval set)
DECON_NGRAM = 13


def ngram_decontaminate(train: DataFrame, bench: DataFrame, text_col: str,
                        id_col: str, n: int = DECON_NGRAM) -> DataFrame:
    """ANY-overlap n-gram decontamination: drop every train document that
    shares at least one n-token shingle with the benchmark set — the
    GPT-3-style contamination rule, stricter than the single-fingerprint
    membership pass (``membership.decontaminate_exact`` matches whole-doc
    min-fingerprints; this matches any shared PASSAGE).

    Plan at 100 TB: the benchmark n-gram set is aggregated once and
    BROADCAST (eval sets are small by nature), the train side's explode →
    semi join runs map-side against that broadcast — no shuffle ever
    carries the exploded n-grams — and the contaminated-id set (bounded
    by true contamination) anti-joins the corpus. Shares the rolling
    shingle hash (and its short-doc padding semantics) with the dedup
    family, so the DuckDB oracle replays it exactly."""
    from flink_rag_spark.operators.dedup import shingle_hashes_expr

    grams = F.array_distinct(F.expr(shingle_hashes_expr(text_col, n)))
    bench_grams = (bench.select(F.explode(grams).alias("_g")).distinct())
    contaminated = (train
                    .select(id_col, F.explode(grams).alias("_g"))
                    .join(F.broadcast(bench_grams), on="_g",
                          how="left_semi")
                    .select(id_col).distinct())
    return train.join(contaminated, on=id_col, how="left_anti")


def fuzzy_decontaminate(train: DataFrame, bench: DataFrame,
                        text_col: str, id_col: str,
                        threshold: float = 0.5,
                        cfg=None) -> DataFrame:
    """FUZZY benchmark decontamination: drop every train document whose
    n-gram Jaccard similarity to ANY benchmark document reaches
    ``threshold`` — the near-duplicate contamination rule (GPT-2's 8-gram
    overlap heuristic generalized; Dolma/RedPajama ship the same
    MinHash-based variant) that catches paraphrased or lightly-edited
    benchmark leakage the exact 13-gram pass (``ngram_decontaminate``)
    misses.

    Plan at 100 TB — the dedup family's machinery pointed ACROSS corpora,
    which removes its hardest scaling problem: candidates come from
    joining the train side's LSH band rows against the BENCHMARK side's
    band rows (eval sets are small by nature → broadcast), so there is
    NO train-side self-join, no O(bucket²) blowup, no hot-bucket guard
    needed — per train doc the work is its colliding bench docs. The
    verify stage is exact Jaccard over candidate pairs only
    (array_intersect hash-set probes, O(|sh_a|+|sh_b|) per pair); its
    train-side shingles are recomputed for CANDIDATE docs only (the
    tiny collision set broadcast into a second id+text scan) rather
    than re-deriving the corpus-sized shingle frame a second time — a
    100 TB corpus can't persist its shingles, so full-corpus hashing
    happens exactly once, in the band pass. The small bench side reuses
    one shingle frame for signatures AND verification
    (dedup.minhash_signatures' shingle_sets seam). Same shingle hash
    and band layout as the dedup family, so the DuckDB oracle replays
    candidates and verification exactly."""
    from flink_rag_spark.config import DEFAULT_CONFIG
    from flink_rag_spark.operators.dedup import (
        lsh_band_rows,
        shingle_hashes_expr,
    )
    from flink_rag_spark.operators.util import widen_if_narrow
    if cfg is None:
        cfg = DEFAULT_CONFIG
    sh_arr = F.array_distinct(
        F.expr(shingle_hashes_expr(text_col, cfg.shingle_size)))
    t_sh = widen_if_narrow(train).select(F.col(id_col), sh_arr.alias("sh"))
    b_sh = widen_if_narrow(bench).select(F.col(id_col), sh_arr.alias("sh"))
    t_bands = lsh_band_rows(train, text_col, id_col, cfg,
                            shingle_sets=t_sh)
    b_bands = (lsh_band_rows(bench, text_col, id_col, cfg,
                             shingle_sets=b_sh)
               .select("band", "band_key", F.col(id_col).alias("_bid")))
    cand = (t_bands.join(F.broadcast(b_bands), on=["band", "band_key"])
            .select(F.col(id_col), F.col("_bid")).distinct())
    cand_sh = (widen_if_narrow(train)
               .select(F.col(id_col), F.col(text_col))
               .join(F.broadcast(cand), on=id_col)
               .select(F.col(id_col), F.col("_bid"), sh_arr.alias("sh_a")))
    ver = (cand_sh
           .join(F.broadcast(b_sh.select(F.col(id_col).alias("_bid"),
                                         F.col("sh").alias("sh_b"))),
                 on="_bid")
           .withColumn("n_common",
                       F.size(F.array_intersect("sh_a", "sh_b")))
           .withColumn("jaccard", F.round(
               F.col("n_common")
               / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
               6))
           .filter(F.col("jaccard") >= threshold))
    contaminated = ver.select(id_col).distinct()
    return train.join(contaminated, on=id_col, how="left_anti")


def fuzzy_decontaminate_duck(train_pred: str, bench_pred: str,
                             threshold: float,
                             select_cols: str,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             table: str = "documents",
                             cfg=None) -> str:
    """DuckDB mirror: cross-corpus LSH candidates + exact-Jaccard verify
    + anti join, with the two corpora defined by SQL predicates over one
    table. Same minhash params, band layout, rounding, threshold."""
    from flink_rag_spark.config import DEFAULT_CONFIG
    from flink_rag_spark.functions.hashing import (
        minhash_params,
        minhash_sig_duck,
        shingle_hashes_duck,
    )
    if cfg is None:
        cfg = DEFAULT_CONFIG
    params = minhash_params(cfg.lsh_num_hashes, cfg.seed)
    hashes = shingle_hashes_duck(text_col, cfg.shingle_size)
    mh_cols = ", ".join(
        f"{minhash_sig_duck('hs', a, b)} AS mh{i}"
        for i, (a, b) in enumerate(params))
    rows = cfg.lsh_num_hashes // cfg.lsh_bands
    band_selects = []
    for b in range(cfg.lsh_bands):
        cols = ", ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        band_selects.append(
            f"SELECT {id_col}, side, {b} AS band, "
            f"concat_ws('_', {cols}) AS band_key FROM sigs")
    bands = " UNION ALL ".join(band_selects)
    return f"""
WITH corp AS (
  SELECT {id_col}, {text_col}, 't' AS side FROM {table}
  WHERE {train_pred}
  UNION ALL
  SELECT {id_col}, {text_col}, 'b' AS side FROM {table}
  WHERE {bench_pred}),
shs AS (SELECT {id_col}, side,
               list_distinct({hashes}) AS sh FROM corp),
sigs AS (
  SELECT {id_col}, side, {mh_cols}
  FROM (SELECT {id_col}, side, sh AS hs FROM shs) t),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT l.{id_col} AS tid, r.{id_col} AS bid
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_key = r.band_key
  WHERE l.side = 't' AND r.side = 'b'),
ver AS (
  SELECT c.tid
  FROM cand c
  JOIN shs a ON a.{id_col} = c.tid AND a.side = 't'
  JOIN shs b ON b.{id_col} = c.bid AND b.side = 'b'
  WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (len(a.sh) + len(b.sh)
                 - len(list_intersect(a.sh, b.sh))), 6) >= {threshold!r})
SELECT {select_cols} FROM {table}
WHERE ({train_pred})
  AND {id_col} NOT IN (SELECT tid FROM ver)
"""


def temperature_mixture_sample(df: DataFrame, domain_col: str,
                               key_col: str,
                               alpha: float = 0.7) -> DataFrame:
    """Temperature-based mixture re-weighting: downsample so the output
    domain shares follow p_d ∝ n_d^α — the multilingual/multi-domain
    sampling rule of mT5/XLM-R (α < 1 flattens the head domains toward
    the tail without ever upsampling; α = 1 keeps natural proportions).
    ``mixture_sample`` takes explicit target weights; this derives them
    from the data itself, which is how mixing is actually configured when
    the domain histogram is not known in advance.

    Fully declarative (no driver collect): the |domains|-row count/weight
    table and its 1-row Σ n^α summary broadcast back onto the scan, and
    each row keeps when the shared content-hash uniform falls below
    p_d = (w_d · T) / (n_d · S) with w_d = n_d^α, S = Σ w_d and
    T = min_d(n_d · S / w_d) — the largest output with no upsampled
    domain (the arg-min domain keeps everything). One narrow scan + two
    tiny broadcast joins; deterministic across runs, partitionings and
    engines, like every content-hash sampler in this family.
    """
    c = (df.groupBy(F.col(domain_col).alias("_d"))
         .agg(F.count(F.lit(1)).cast("double").alias("_n"))
         .withColumn("_w", F.pow(F.col("_n"), F.lit(alpha))))
    # T = min over domains of n_d * S / w_d (computed against the same S
    # every engine derives from the same doubles, same operation order)
    cs = c.crossJoin(F.broadcast(c.agg(F.sum("_w").alias("_s"))))
    t = cs.agg(F.min(F.col("_n") * F.col("_s") / F.col("_w")).alias("_t"))
    p = (cs.crossJoin(F.broadcast(t))
         .select(F.col("_d"),
                 ((F.col("_w") * F.col("_t"))
                  / (F.col("_n") * F.col("_s"))).alias("_p")))
    u = f"(({poly_hash_expr(key_col)}) + 1) / CAST({POLY_P + 1} AS DOUBLE)"
    return (df.join(F.broadcast(p), df[domain_col] == F.col("_d"))
            .filter(F.expr(u) < F.col("_p"))
            .drop("_d", "_p"))


def temperature_mixture_duck(table: str, domain_col: str, key_col: str,
                             alpha: float, select_cols: str) -> str:
    """DuckDB mirror of ``temperature_mixture_sample`` — same w = n^α,
    S, T = min(n·S/w) and p = (w·T)/(n·S) arithmetic over doubles, same
    content-hash uniform."""
    from flink_rag_spark.functions.hashing import poly_hash_duck
    u = f"((({poly_hash_duck(key_col)}) + 1) / CAST({POLY_P + 1} AS DOUBLE))"
    return f"""
WITH c AS (SELECT {domain_col} AS d, CAST(COUNT(*) AS DOUBLE) AS n,
                  POW(CAST(COUNT(*) AS DOUBLE), {alpha!r}) AS w
           FROM {table} GROUP BY {domain_col}),
s AS (SELECT SUM(w) AS s FROM c),
t AS (SELECT MIN(c.n * s.s / c.w) AS t FROM c, s),
p AS (SELECT c.d, (c.w * t.t) / (c.n * s.s) AS p FROM c, s, t)
SELECT {select_cols} FROM {table} x JOIN p ON x.{domain_col} = p.d
WHERE {u} < p.p
"""


def stratified_sample(df: DataFrame, strata_cols: list[str],
                      quota: int, key_col: str,
                      seed: int = 0) -> DataFrame:
    """Exact-quota stratified sampling: up to ``quota`` rows PER
    STRATUM, chosen as the stratum's lowest seeded-hash keys — the
    balanced-subset primitive (per-language eval slices, per-source
    caps, class-balanced finetuning sets) that a global `sample()`
    can't give: fractions under-fill small strata and over-fill big
    ones, and RNG sampling isn't reproducible across layouts.

    Sibling of :func:`stratified_cap`, which draws by CONTENT hash (one
    fixed, content-stable draw — re-ingesting identical text keeps the
    same survivors): this one draws by a SEEDED key hash, so repeated
    experiments get independent balanced subsets from the same corpus
    by changing ``seed`` — the capability the content-hash cap can't
    express (its draw has exactly one realization).

    Selection is h = (poly_hash(key)·a_seed + b_seed) mod P ranked per
    stratum (ties on h break by key) — the minhash universal-hash
    scramble, NOT a seed-prefix concat: prefixing a same-length seed
    onto the linear polynomial hash only ADDS a constant (order-
    preserving except at the rare mod-P wrap), so two seeds would pick
    nearly the same rows; the multiplicative (a, b) pair genuinely
    permutes the order per seed. Deterministic, layout-independent,
    uniformly random-in-expectation within each stratum — the same
    hash-ordered take-N idiom as the pair-rules hub cap. Strata with
    fewer than ``quota`` rows are kept whole.

    Plan at 100 TB: one window on the strata key (rank within stratum
    by (h, key)) over one exchange; the filter is scan-shaped after
    that. No collects, no per-stratum jobs."""
    from pyspark.sql import Window

    from flink_rag_spark.functions.hashing import minhash_params
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    a, b = minhash_params(1, seed)[0]
    h = F.expr(
        f"(({poly_hash_expr(f'cast({key_col} as string)')}) "
        f"* {a} + {b}) % {POLY_P}")
    w = (Window.partitionBy(*strata_cols)
         .orderBy(F.col("_h"), F.col(key_col)))
    return (df.withColumn("_h", h)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= quota)
            .drop("_h", "_rk"))


def stratified_sample_duck(inner_sql: str, strata_cols: list[str],
                           quota: int, key_col: str,
                           seed: int = 0) -> str:
    """DuckDB mirror of :func:`stratified_sample` — same universal-hash
    scramble, same per-stratum (h, key) rank cut."""
    from flink_rag_spark.functions.hashing import (POLY_P, minhash_params,
                                                   poly_hash_duck)
    a, b = minhash_params(1, seed)[0]
    h = (f"(({poly_hash_duck(f'CAST({key_col} AS VARCHAR)')}) "
         f"* {a} + {b}) % {POLY_P}")
    parts = ", ".join(strata_cols)
    return f"""
SELECT * EXCLUDE (_rk) FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {parts}
                               ORDER BY {h}, {key_col}) AS _rk
  FROM ({inner_sql}))
WHERE _rk <= {quota}
"""


def deterministic_shuffle(df: DataFrame, key_col: str, seed: int = 0,
                          buckets: int = 1024) -> DataFrame:
    """Seeded, layout-independent global shuffle order for training:
    adds (shuffle_bucket, shuffle_pos) such that sorting by
    (shuffle_bucket, shuffle_pos) is a deterministic pseudo-random
    permutation of the rows — the corpus-shuffling stage before
    tokenization/packing, where epoch order must be reproducible and
    independent of file layout (an RNG ``orderBy(rand())`` is neither).

    Each row's mix hash h = poly_hash(seed || ':' || key) drives both
    coordinates: bucket = h mod ``buckets`` and pos = rank within the
    bucket by (h, key). At 100 TB the write is
    ``repartition(buckets, shuffle_bucket)`` + ``sortWithinPartitions``
    — every bucket's rank computes in parallel and NO single-task global
    sort ever exists; ``buckets`` should be O(cluster parallelism × a
    few). Ties on h break by key, so the permutation is total even under
    hash collisions.
    """
    from pyspark.sql import Window
    h = F.expr(poly_hash_expr(
        f"concat('{seed}', ':', cast({key_col} as string))"))
    out = df.withColumn("_h", h).withColumn(
        "shuffle_bucket", F.pmod(F.col("_h"), F.lit(buckets)))
    w = (Window.partitionBy("shuffle_bucket")
         .orderBy(F.col("_h"), F.col(key_col)))
    return (out.withColumn("shuffle_pos", F.row_number().over(w))
            .drop("_h"))


def deterministic_shuffle_duck(table: str, key_col: str, seed: int = 0,
                               buckets: int = 1024,
                               select_cols: str = "*") -> str:
    """DuckDB mirror of ``deterministic_shuffle`` — same mix hash, same
    bucket/rank coordinates."""
    from flink_rag_spark.functions.hashing import poly_hash_duck
    h = poly_hash_duck(f"concat('{seed}', ':', CAST({key_col} AS VARCHAR))")
    return f"""
WITH h AS (SELECT *, ({h}) AS _h FROM {table}),
b AS (SELECT *, _h % {buckets} AS shuffle_bucket FROM h)
SELECT {select_cols},
       shuffle_bucket,
       CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_bucket
                               ORDER BY _h, {key_col}) AS INT)
         AS shuffle_pos
FROM b
"""


def curriculum_order(scored: DataFrame, score_col: str, key_col: str,
                     n_bands: int = 4, seed: int = 0,
                     buckets: int = 1024) -> DataFrame:
    """Curriculum ordering (Bengio et al. 2009 applied to corpus prep):
    arrange training data from highest- to lowest-quality BANDS while
    keeping each band internally pseudo-random — sorting by
    (band, shuffle_bucket, shuffle_pos) is the epoch order.

    Deliberately a composition of two existing scale-safe pieces, not a
    new physical op: equal-frequency bands come from broadcast
    ``quantile_bins`` boundaries over ``score_col`` (band 1 = highest
    score; NO global sort — the naive ntile-over-everything window
    would be a single-task sort at 100 TB), and the within-band order
    is ``deterministic_shuffle``'s seeded (bucket, pos) coordinates —
    layout-independent and reproducible across runs/engines."""
    from flink_rag_spark.operators.profiling import quantile_bins
    binned = quantile_bins(scored, score_col, n_bins=n_bands,
                           out_col="_qb")
    banded = (binned.withColumn(
        "band", (F.lit(n_bands + 1) - F.col("_qb")).cast("int"))
        .drop("_qb"))
    return deterministic_shuffle(banded, key_col, seed=seed,
                                 buckets=buckets)


def decontamination_report(train: DataFrame, bench: DataFrame,
                           text_col: str, id_col: str,
                           bench_id_col: str = "bench_id",
                           n: int = DECON_NGRAM) -> DataFrame:
    """Per-benchmark contamination audit — the REPORT companion to
    ``ngram_decontaminate``'s filter: for EVERY benchmark in ``bench``
    (tagged by ``bench_id_col``) in one pass, how many train documents
    share ≥1 n-gram with it, how many of its grams leak, and the
    contamination rate. The eval-integrity dashboard a lab publishes
    next to its training runs (GPT-3 appendix C ships exactly this
    table); running B benchmarks through B separate filter passes would
    scan the corpus B times — this scans it once.

    Plan at 100 TB: the (bench_id, gram) set aggregates once and
    BROADCASTS (eval suites are small by nature); the train side's
    explode joins map-side against it, so only true hits — bounded by
    contamination, not corpus size — reach the per-bench distinct
    aggregation. Corpus totals ride a separate 1-row aggregate."""
    from flink_rag_spark.operators.dedup import shingle_hashes_expr

    grams = F.array_distinct(F.expr(shingle_hashes_expr(text_col, n)))
    bg = (bench.select(bench_id_col, F.explode(grams).alias("_g"))
          .distinct())
    bench_docs = bench.groupBy(bench_id_col).agg(
        F.count(F.lit(1)).alias("n_bench_docs"))
    bench_grams = bg.groupBy(bench_id_col).agg(
        F.count(F.lit(1)).alias("n_bench_grams"))
    hits = (train.select(id_col, F.explode(grams).alias("_g"))
            .join(F.broadcast(bg), on="_g"))
    per_bench = hits.groupBy(bench_id_col).agg(
        F.countDistinct(id_col).alias("n_contaminated"),
        F.countDistinct("_g").alias("n_hit_grams"))
    tot = train.agg(F.count(F.lit(1)).alias("n_train"))
    return (bench_docs
            .join(bench_grams, on=bench_id_col, how="left")
            .join(per_bench, on=bench_id_col, how="left")
            .fillna({"n_bench_grams": 0, "n_contaminated": 0,
                     "n_hit_grams": 0})
            .crossJoin(F.broadcast(tot))
            .select(bench_id_col, "n_bench_docs", "n_bench_grams",
                    "n_hit_grams", "n_contaminated", "n_train",
                    F.round(F.col("n_contaminated")
                            / F.col("n_train").cast("double"), 6)
                    .alias("contamination_rate")))
