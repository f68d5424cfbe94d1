"""Gopher-style repetition signals — the document-quality heuristics a
training-data pipeline filters on (Rae et al. 2021 §A1.1: repetitious
documents correlate with low quality; ABSENT in the reference, north-star
text-analysis surface SURVEY.md §2.2).

Per document:

- ``n_tokens`` / ``distinct_ratio`` — vocabulary coverage;
- ``top_word_frac`` — most frequent token's share of all tokens;
- ``top_bigram_frac`` — most frequent word-bigram's share of all bigrams;
- ``dup_line_frac`` — fraction of newline-lines that repeat an earlier
  line.

Plan shape: the token and bigram passes are wordcount-shaped —
explode → (doc, gram) partial-agg → per-doc aggregate — so shuffle volume
is distinct grams per doc (map-side combine collapses repeats, which is
exactly what repetitious documents have most of); the line signal is a
pure narrow projection. This keeps per-doc work LINEAR in document length
— the no-shuffle alternative (a higher-order-function count per distinct
token inside one projection) is O(len²) per row and melts on 100k-token
documents. Everything has an exact DuckDB mirror (same tokens, same
rounding)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.functions.textfns import TOKENS_DUCK, TOKENS_SPARK

ROUND_DP = 6


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, distinct_ratio, top_word_frac, top_bigram_frac,
    dup_line_frac) — all rounded to 6 dp."""
    toks = TOKENS_SPARK.format(s=f"lower({text_col})")
    # the token array binds ONCE as a lambda variable (the
    # transform(array(..))[1] trick shingle_hashes_expr uses) so it isn't
    # recomputed per bigram slot; the size guard matters because Spark's
    # sequence(1, 0) counts DOWN instead of returning empty
    bigrams = (
        f"CASE WHEN size({toks}) < 2 THEN array() ELSE "
        f"element_at(transform(array({toks}), t -> "
        f"transform(sequence(1, size(t) - 1), "
        f"i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))), 1) END"
    )
    tok = docs.select(F.col(id_col), F.explode(F.expr(toks)).alias("g"))
    word_agg = (tok.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
                .groupBy(id_col)
                .agg(F.sum("c").alias("n_tokens"),
                     F.max("c").alias("top_word"),
                     F.count(F.lit(1)).alias("n_distinct")))
    big = docs.select(F.col(id_col),
                      F.explode(F.expr(bigrams)).alias("g"))
    big_agg = (big.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
               .groupBy(id_col)
               .agg(F.sum("c").alias("n_bigrams"),
                    F.max("c").alias("top_bigram")))
    lines = f"split({text_col}, '\\n')"
    per_row = docs.select(
        F.col(id_col),
        F.round(F.lit(1.0)
                - F.expr(f"size(array_distinct({lines}))")
                / F.expr(f"size({lines})"), ROUND_DP).alias("dup_line_frac"))
    return (word_agg
            .join(big_agg, on=id_col, how="left")
            .join(per_row, on=id_col)
            .select(
                F.col(id_col),
                F.col("n_tokens").cast("bigint").alias("n_tokens"),
                F.round(F.col("n_distinct") / F.col("n_tokens"),
                        ROUND_DP).alias("distinct_ratio"),
                F.round(F.col("top_word") / F.col("n_tokens"),
                        ROUND_DP).alias("top_word_frac"),
                F.round(F.coalesce(F.col("top_bigram") / F.col("n_bigrams"),
                                   F.lit(0.0)),
                        ROUND_DP).alias("top_bigram_frac"),
                F.col("dup_line_frac")))


def repetition_signals_duck(text_col: str = "text", id_col: str = "doc_id",
                            table: str = "documents") -> str:
    """DuckDB mirror (same tokens, bigrams, rounding)."""
    toks = TOKENS_DUCK.format(s=f"lower({text_col})")
    return f"""
WITH tok AS (
  SELECT {id_col}, unnest({toks}) AS g FROM {table}
),
word_agg AS (
  SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_word,
         COUNT(*) AS n_distinct
  FROM (SELECT {id_col}, g, COUNT(*) AS c FROM tok GROUP BY {id_col}, g) t
  GROUP BY {id_col}
),
big AS (
  SELECT {id_col}, unnest(
    list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1])) AS g
  FROM (SELECT {id_col}, {toks} AS t FROM {table}) s
),
big_agg AS (
  SELECT {id_col}, SUM(c) AS n_bigrams, MAX(c) AS top_bigram
  FROM (SELECT {id_col}, g, COUNT(*) AS c FROM big GROUP BY {id_col}, g) t
  GROUP BY {id_col}
),
per_row AS (
  SELECT {id_col},
         ROUND(1.0 - CAST(len(list_distinct(string_split({text_col}, chr(10))))
                          AS DOUBLE)
                   / len(string_split({text_col}, chr(10))), {ROUND_DP})
           AS dup_line_frac
  FROM {table}
)
SELECT w.{id_col}, w.n_tokens,
       ROUND(CAST(w.n_distinct AS DOUBLE) / w.n_tokens, {ROUND_DP})
         AS distinct_ratio,
       ROUND(CAST(w.top_word AS DOUBLE) / w.n_tokens, {ROUND_DP})
         AS top_word_frac,
       ROUND(COALESCE(CAST(b.top_bigram AS DOUBLE) / b.n_bigrams, 0.0),
             {ROUND_DP}) AS top_bigram_frac,
       p.dup_line_frac
FROM word_agg w
LEFT JOIN big_agg b ON b.{id_col} = w.{id_col}
JOIN per_row p ON p.{id_col} = w.{id_col}
"""


def unigram_lm_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", vocab_size: int = 30_000,
                      alpha: float = 0.5,
                      model_docs: DataFrame | None = None) -> DataFrame:
    """Statistical quality scoring: per-document mean log-probability under
    an add-α-smoothed unigram language model — the perplexity-proxy filter
    of CCNet-style curation (Wenzek et al. 2020 score documents with a
    corpus LM and drop the high-perplexity tail; the heuristics in
    ``repetition_signals``/``text_features`` are rule-based, this is the
    model-based complement). The model trains on ``model_docs`` (a clean
    reference corpus) or, self-supervised, on ``docs`` itself.

    Tokens are the family's polynomial token hashes (frequencies over
    hashes equal frequencies over tokens), the vocabulary is the top
    ``vocab_size`` tokens by (count DESC, hash ASC) — a total order, so
    boundary ties resolve identically on any engine — and every
    out-of-vocabulary token scores ln(α/D) with
    D = N_vocab + α·(V+1).

    Plan at 100 TB: the vocabulary aggregation is wordcount-shaped
    (map-side combine → |distinct tokens| rows → TakeOrdered top-K) and
    the resulting codebook + its 1-row (V, N) summary BROADCAST to the
    scoring scan, which is one explode → map-side broadcast join → one
    per-doc aggregate: token traffic never crosses a shuffle carrying the
    model. The scoring identity Σ ln((c+α)/D) = Σ ln(c+α) + oov·ln(α)
    − n·ln(D) keeps the per-token work to one conditional log.

    Returns (id, n_tokens, oov_ratio, avg_logprob) rounded to 6 dp.
    """
    from flink_rag_spark.operators.dedup import token_hashes_expr

    model = docs if model_docs is None else model_docs
    th = token_hashes_expr(text_col)
    freq = (model.select(F.explode(F.expr(th)).alias("h"))
            .groupBy("h").agg(F.count(F.lit(1)).alias("c")))
    vocab = (freq.orderBy(F.desc("c"), F.asc("h")).limit(vocab_size)
             .persist())
    vstats = vocab.agg(F.count(F.lit(1)).alias("_V"),
                       F.sum("c").alias("_N"))
    toks = docs.select(F.col(id_col), F.explode(F.expr(th)).alias("h"))
    per_doc = (toks.join(F.broadcast(vocab), on="h", how="left")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
                     .alias("_oov"),
                    F.sum(F.when(F.col("c").isNotNull(),
                                 F.log(F.col("c") + F.lit(alpha)))
                          .otherwise(F.lit(0.0))).alias("_sk")))
    d = F.log(F.col("_N") + F.lit(alpha) * (F.col("_V") + F.lit(1)))
    out = (per_doc.crossJoin(F.broadcast(vstats))
           .select(
               F.col(id_col), F.col("n_tokens"),
               F.round(F.col("_oov") / F.col("n_tokens").cast("double"),
                       ROUND_DP).alias("oov_ratio"),
               F.round((F.col("_sk")
                        + F.col("_oov") * F.lit(float(__import__("math").log(alpha)))
                        - F.col("n_tokens") * d) / F.col("n_tokens"),
                       ROUND_DP).alias("avg_logprob")))
    from flink_rag_spark.operators.util import track_cached_deps
    return track_cached_deps(out, [vocab])


def unigram_lm_scores_duck(table: str, text_col: str = "text",
                           id_col: str = "doc_id",
                           vocab_size: int = 30_000,
                           alpha: float = 0.5) -> str:
    """DuckDB mirror of the self-supervised ``unigram_lm_scores``: same
    token hashes, same (count DESC, hash ASC) vocabulary order, same
    scoring identity and rounding."""
    import math

    from flink_rag_spark.functions.hashing import token_hashes_duck
    th = token_hashes_duck(text_col)
    ln_alpha = repr(math.log(alpha))
    return f"""
WITH tok AS (SELECT {id_col}, unnest({th}) AS h FROM {table}),
freq AS (SELECT h, COUNT(*) AS c FROM tok GROUP BY h),
vocab AS (SELECT h, c FROM freq ORDER BY c DESC, h ASC LIMIT {vocab_size}),
vs AS (SELECT COUNT(*) AS v, SUM(c) AS n FROM vocab),
per AS (
  SELECT t.{id_col},
         COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.c IS NULL THEN 1 ELSE 0 END) AS oov,
         SUM(CASE WHEN v.c IS NOT NULL THEN ln(v.c + {alpha!r})
                  ELSE 0.0 END) AS sk
  FROM tok t LEFT JOIN vocab v USING (h)
  GROUP BY t.{id_col})
SELECT per.{id_col}, per.n_tokens,
       ROUND(oov / CAST(n_tokens AS DOUBLE), {ROUND_DP}) AS oov_ratio,
       ROUND((sk + oov * {ln_alpha}
              - n_tokens * ln(vs.n + {alpha!r} * (vs.v + 1)))
             / n_tokens, {ROUND_DP}) AS avg_logprob
FROM per, vs
"""


def ngram_novelty(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 13) -> DataFrame:
    """Per-document n-gram duplication/novelty score — the
    "fraction of duplicate n-grams" signal corpus reports publish
    (Gopher's repetition analysis and Dolma's dedup stats both report
    it): for each document, what share of its distinct n-gram shingles
    occurs in at least one OTHER document. High dup_fraction = boilerplate
    or near-copied text; complements the pairwise dedup families with a
    per-doc scalar that needs no pair enumeration at all.

    Plan at 100 TB: wordcount-shaped — explode each doc's DISTINCT
    shingle hashes once, count per-gram document frequency (map-side
    combined), and join the df frame back on the gram hash; both sides
    shuffle on the same gram key, and the per-doc fold is one more
    groupBy(id). No pairwise work anywhere: cost is O(total grams), not
    O(dup_pairs). When only the boolean df>1 matters at extreme scale,
    the df frame compresses to a bloom filter exactly like
    ``membership.decontaminate_exact``'s bitmap.

    Returns (id, n_grams, n_dup_grams, dup_fraction, max_gram_df):
    dup_fraction rounded to 6 dp; max_gram_df = how many documents share
    the doc's most-duplicated gram (1 = fully novel)."""
    from flink_rag_spark.operators.dedup import shingle_hashes_expr

    grams = (docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.expr(shingle_hashes_expr(text_col, n)))).alias("_g")))
    df_counts = grams.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_df"))
    return (grams.join(df_counts, on="_g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.when(F.col("_df") > 1, 1).otherwise(0))
                 .alias("n_dup_grams"),
                 F.max("_df").alias("max_gram_df"))
            .select(id_col, "n_grams", "n_dup_grams",
                    F.round(F.col("n_dup_grams")
                            / F.col("n_grams").cast("double"), 6)
                    .alias("dup_fraction"),
                    "max_gram_df"))


def ngram_novelty_duck(table: str, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 13) -> str:
    """DuckDB mirror of ``ngram_novelty`` — same shingle hashes, same
    distinct-per-doc gram sets, same df fold."""
    from flink_rag_spark.functions.hashing import shingle_hashes_duck
    sh = shingle_hashes_duck(text_col, n)
    return f"""
WITH g AS (
  SELECT {id_col}, unnest(list_distinct({sh})) AS _g FROM {table}),
dfc AS (SELECT _g, CAST(COUNT(*) AS BIGINT) AS _df FROM g GROUP BY 1)
SELECT g.{id_col},
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN _df > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       ROUND(SUM(CASE WHEN _df > 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_fraction,
       CAST(MAX(_df) AS BIGINT) AS max_gram_df
FROM g JOIN dfc USING (_g)
GROUP BY g.{id_col}
"""


# ------------------------------------------- readability scoring

READABILITY_DP = 6


def readability_scores(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document readability — Flesch reading ease and
    Flesch–Kincaid grade (the classic curation signal beside the
    Gopher-style quality stats: templated/boilerplate text scores
    abnormally easy, OCR soup abnormally hard):

        ease  = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
        grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    with W = whitespace tokens (the engine's tokenizer family),
    S = max(1, runs of [.!?]) and Y = vowel-group runs ([aeiouy]+
    over the lowercased text) — the standard DETERMINISTIC syllable
    heuristic (true syllabification needs a dictionary; the vowel-run
    estimate is the portable classic, stated as the contract).
    Output: (id, n_words, n_sentences, n_syllables, flesch_ease,
    fk_grade) — W = 0 (empty/whitespace text) emits NULL scores.

    Exactness: W/S/Y are exact integers from one scan (regexp run
    counts — identical POSIX classes in both engines); the two scores
    are one double expression each, rounded ``READABILITY_DP``.

    Plan at 100 TB: pure per-row projection over the scan — no
    shuffle, no join, whole-stage codegen."""
    toks = TOKENS_SPARK.format(s=f"lower({text_col})")
    w = F.size(F.filter(F.expr(toks), lambda x: x != ""))
    s = F.greatest(F.expr(f"regexp_count({text_col}, '[.!?]+')"),
                   F.lit(1))
    y = F.expr(f"regexp_count(lower({text_col}), '[aeiouy]+')")
    wd = w.cast("double")
    wps = wd / s.cast("double")
    spw = y.cast("double") / wd
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return docs.select(
        F.col(id_col),
        w.cast("bigint").alias("n_words"),
        s.cast("bigint").alias("n_sentences"),
        y.cast("bigint").alias("n_syllables"),
        F.round(F.when(w > 0, ease), READABILITY_DP)
        .alias("flesch_ease"),
        F.round(F.when(w > 0, grade), READABILITY_DP)
        .alias("fk_grade"))


def readability_scores_duck(text_col: str = "text",
                            id_col: str = "doc_id",
                            table: str = "documents") -> str:
    """DuckDB mirror of :func:`readability_scores` — same tokenizer,
    same regexp run counts, same double expressions."""
    toks = TOKENS_DUCK.format(s=f"lower({text_col})")
    dp = READABILITY_DP
    return f"""
WITH rd AS (
  SELECT {id_col},
         CAST(len(list_filter({toks}, x -> x <> '')) AS BIGINT) AS w,
         CAST(GREATEST(len(regexp_extract_all({text_col}, '[.!?]+')),
                       1) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower({text_col}), '[aeiouy]+'))
              AS BIGINT) AS y
  FROM {table})
SELECT {id_col}, w AS n_words, s AS n_sentences, y AS n_syllables,
       ROUND(CASE WHEN w > 0 THEN
         206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                 - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)) END,
         {dp}) AS flesch_ease,
       ROUND(CASE WHEN w > 0 THEN
         0.39 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
         + 11.8 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)) - 15.59 END,
         {dp}) AS fk_grade
FROM rd
"""
