"""PMI collocation mining — corpus-level phrase detection.

A large-scale training-data pipeline mines multi-word expressions
("new york", "machine learning") to drive tokenizer vocab induction and
phrase-aware chunking; word2vec's phrase pass (Mikolov et al. 2013,
arXiv:1310.4546 §4) and the classic pointwise-mutual-information
collocation score (Church & Hanks 1990) are the standard recipes. The
reference pipeline has no phrase stage (its tokenizer is OpenAI's,
``EmbeddingConfig.java``), so this is a pipeline-extension operator in
the same family as vocab induction (operators/encoding.py).

Spark-first shape — everything is wordcount:

- ONE corpus scan: each document's token array binds once and emits a
  tagged union of unigram structs and adjacent-bigram structs (the
  same bound-once ``transform(sequence(...))`` trick as
  quality.repetition_signals); one explode → partial-agg
  ``groupBy(tag, term)`` produces both count frames, and the
  vocabulary-sized grouped result is persisted so its four consumers
  (unigram join ×2, pair filter, totals) never re-tokenize the corpus
  — the same persist-the-small-derived-frame discipline as
  quality.unigram_lm_quality's vocab;
- corpus totals: 1-row aggregates OVER THE GROUPED frame (vocabulary-
  sized inputs, never a second corpus pass), broadcast;
- the PMI join attaches the two unigram counts to the ``min_count``-
  filtered pair vocabulary — both sides shuffle on the word, the same
  postings-bounded discipline as BM25's df join;
- top-n is ``orderBy().limit(n)`` (parallel TakeOrdered) with
  ``row_number`` over only the n survivors.

At 100 TB nothing here ever shuffles raw text: the exchanges carry
(term, count) and (pair, count) rows whose cardinality is the corpus
VOCABULARY, crushed further by map-side partial aggregation, and
``min_count`` prunes the long tail before the join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from flink_rag_spark.functions.textfns import TOKENS_DUCK, TOKENS_SPARK

ROUND_DP = 6


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     min_count: int = 5,
                     top_n: int = 50) -> DataFrame:
    """Top-``top_n`` adjacent word pairs by pointwise mutual information:
    pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) = pairs(a,b)/|pairs|
    and p(w) = count(w)/|tokens|, restricted to pairs seen at least
    ``min_count`` times (rare-pair PMI is noise — Church & Hanks).
    Returns (w1, w2, n_pair, pmi, rank); deterministic tie-break on
    (w1, w2). ``min_count`` is the scale knob: it bounds the join input
    to the frequent-pair vocabulary."""
    toks = TOKENS_SPARK.format(s=f"lower({text_col})")
    # One corpus scan: tag 0 = unigram, tag 1 = adjacent bigram. The
    # token array binds ONCE as the lambda variable t (CollapseProject
    # would inline a projected alias and re-split; a lambda binding it
    # cannot); both term streams ride one explode into one (tag, term)
    # aggregate, and the vocabulary-sized grouped frame is persisted
    # for its four downstream consumers. slice(.., 1, 0) is the
    # correctly-typed empty struct array for single-token docs.
    tagged = (
        f"element_at(transform(array({toks}), t -> concat("
        "transform(t, w -> named_struct('tag', 0, 'term', w)), "
        "CASE WHEN size(t) < 2 THEN "
        "slice(transform(t, w -> named_struct('tag', 1, 'term', w)), 1, 0) "
        "ELSE transform(sequence(1, size(t) - 1), "
        "i -> named_struct('tag', 1, 'term', "
        "concat(element_at(t, i), ' ', element_at(t, i + 1)))) END)), 1)")
    # persisted for the life of the returned (lazy) plan: a catalog
    # operator can't unpersist what its caller hasn't collected yet, so
    # the vocabulary-sized cache stays pinned until Spark's LRU evicts
    # it — the same accepted tradeoff as quality.unigram_lm_quality's
    # vocab (both are the smallest frame that stops corpus re-scans)
    counts = (docs.select(F.explode(F.expr(tagged)).alias("x"))
              .groupBy(F.col("x.tag").alias("tag"),
                       F.col("x.term").alias("term"))
              .agg(F.count(F.lit(1)).alias("c"))
              .persist())
    uni = counts.filter(F.col("tag") == 0).select(
        F.col("term").alias("w"), F.col("c").alias("cu"))
    pair_counts = counts.filter(F.col("tag") == 1).select(
        F.col("term").alias("g"), F.col("c").alias("n_pair"))
    total_u = uni.agg(F.sum("cu").cast("double").alias("t_tokens"))
    total_p = pair_counts.agg(F.sum("n_pair").cast("double")
                              .alias("t_pairs"))
    pairs = (pair_counts.filter(F.col("n_pair") >= min_count)
             .select(F.split(F.col("g"), " ")[0].alias("w1"),
                     F.split(F.col("g"), " ")[1].alias("w2"),
                     "n_pair"))
    scored = (pairs
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("cu").alias("c1")), on="w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("cu").alias("c2")), on="w2")
              .crossJoin(F.broadcast(total_u))
              .crossJoin(F.broadcast(total_p))
              .select(
                  "w1", "w2", "n_pair",
                  F.round(F.log((F.col("n_pair") / F.col("t_pairs"))
                                / ((F.col("c1") / F.col("t_tokens"))
                                   * (F.col("c2") / F.col("t_tokens")))),
                          ROUND_DP).alias("pmi")))
    topn = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(top_n)
    return topn.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("pmi"), "w1", "w2")))


def pmi_collocations_duck(text_col: str = "text", min_count: int = 5,
                          top_n: int = 50,
                          table: str = "documents") -> str:
    """DuckDB mirror — same tokens, bigrams, formula, rounding,
    tie-breaks."""
    toks = TOKENS_DUCK.format(s=f"lower({text_col})")
    return f"""
WITH uni AS (
  SELECT w, COUNT(*) AS cu
  FROM (SELECT unnest({toks}) AS w FROM {table}) t GROUP BY w
),
tot_u AS (SELECT CAST(SUM(cu) AS DOUBLE) AS t_tokens FROM uni),
big AS (
  SELECT unnest(
    list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1])) AS g
  FROM (SELECT {toks} AS t FROM {table}) s
),
pc AS (SELECT g, COUNT(*) AS n_pair FROM big GROUP BY g),
tot_p AS (SELECT CAST(SUM(n_pair) AS DOUBLE) AS t_pairs FROM pc),
pairs AS (
  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
         n_pair
  FROM pc WHERE n_pair >= {min_count}
),
scored AS (
  SELECT p.w1, p.w2, p.n_pair,
         ROUND(ln((p.n_pair / tp.t_pairs)
                  / ((u1.cu / tu.t_tokens) * (u2.cu / tu.t_tokens))),
               {ROUND_DP}) AS pmi
  FROM pairs p
  JOIN uni u1 ON u1.w = p.w1
  JOIN uni u2 ON u2.w = p.w2
  CROSS JOIN tot_u tu CROSS JOIN tot_p tp
),
ranked AS (
  SELECT w1, w2, n_pair, pmi,
         CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank
  FROM scored)
SELECT w1, w2, n_pair, pmi, rank FROM ranked WHERE rank <= {top_n}
"""
