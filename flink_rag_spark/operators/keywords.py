"""Per-document keyword extraction — TF-IDF top-N terms.

The classic corpus-statistics summarizer: a document's most
characteristic terms are the ones frequent in it and rare elsewhere.
BM25 (`operators/ranking.py`) scores documents FOR a query; this is the
query-free inverse — per-document salient terms for tagging, faceting,
weak labels, and index-time term boosting. Tokenization matches the
engine's word-level family (`operators/encoding.py` `_TOKS`), so
keyword terms align with the induced vocabulary.

Plan at 100 TB: wordcount-shaped — explode → (doc, token) partial+final
aggregate for TF, a vocabulary-sized re-aggregation for DF, and the
(token, idf) table joined back BROADCAST. The broadcast is BOUNDED BY
CONSTRUCTION, not by hope: the idf table is capped at the ``max_vocab``
highest-df terms (the same 30k discipline as `encoding.build_vocab`
and the unigram-LM vocab), because a web-scale corpus's min_df≥2
vocabulary is 10⁸+ tokens — several GB per executor if broadcast raw.
`min_df` prunes the hapax tail first; the top-``max_vocab`` cut is a
TakeOrderedAndProject (K-bounded, never a global sort of the corpus).
The per-document top-N is a window over each document's OWN terms —
partitioned by doc id.

Semantics of the cap — stated honestly: it is the sklearn
``max_features`` cut (keep the ``max_vocab`` HIGHEST-df terms), so
terms that passed ``min_df`` but fall outside the cap — the rare,
high-idf end of the vocabulary — do not participate as keywords. That
biases the output toward more common terms when the corpus vocabulary
exceeds the cap; it is the price of a construction-bounded broadcast,
the same contract as every other vocab-capped operator here (OOV
tokens in encoding, the unigram LM's unscored tail). Deployments that
need deeper rare-term coverage raise ``max_vocab`` (the broadcast
budget, not the data, is the constraint) or raise ``min_df`` so the
cap stops binding.

Determinism: idf = ln((1+N)/(1+df)) + 1 (the sklearn smooth-idf form)
over exact integer counts; the vocab cut orders by (df DESC, token
ASC) and score ties break by token ASC, so both cuts are total."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SCORE_DP = 6
MAX_VOCAB = 30_000


def tfidf_keywords(docs: DataFrame, text_col: str, id_col: str,
                   top_n: int = 5, min_df: int = 2,
                   max_vocab: int = MAX_VOCAB) -> DataFrame:
    """Top-``top_n`` TF-IDF terms per document: (id, token, tf,
    doc_freq, score, rank). Terms appearing in fewer than ``min_df``
    documents are excluded (typos/noise), and the idf table is capped
    at the ``max_vocab`` highest-df terms (ties by token ASC) so the
    broadcast join is ≤ max_vocab rows at ANY corpus size."""
    from flink_rag_spark.operators.encoding import _TOKS

    tf = (docs.select(F.col(id_col),
                      F.explode(F.expr(_TOKS.format(s=text_col)))
                      .alias("token"))
          .filter(F.col("token") != "")
          .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf")))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    dfreq = (tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
             .filter(F.col("doc_freq") >= min_df)
             # K-bounded cut (TakeOrderedAndProject), the broadcast bound
             .orderBy(F.desc("doc_freq"), F.asc("token")).limit(max_vocab)
             .crossJoin(F.broadcast(n_docs))
             .select("token", "doc_freq",
                     (F.log((F.lit(1.0) + F.col("n_docs").cast("double"))
                            / (F.lit(1.0) + F.col("doc_freq").cast("double")))
                      + F.lit(1.0)).alias("idf")))
    scored = (tf.join(F.broadcast(dfreq), "token")
              .withColumn("score", F.col("tf").cast("double") * F.col("idf")))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select(id_col, "token", "tf", "doc_freq",
                    F.round("score", SCORE_DP).alias("score"), "rank"))


def tfidf_keywords_duck(inner_sql: str, text_col: str, id_col: str,
                        top_n: int = 5, min_df: int = 2,
                        max_vocab: int = MAX_VOCAB) -> str:
    """DuckDB mirror of :func:`tfidf_keywords` — same tokenizer, same
    smooth idf, same (df DESC, token ASC) vocab cut, same
    (score DESC, token ASC) total rank order."""
    return f"""
WITH src AS (SELECT * FROM ({inner_sql})),
tf AS (
  SELECT {id_col}, t.token, COUNT(*) AS tf
  FROM src, UNNEST(string_split_regex(trim(lower({text_col})), '\\s+'))
       AS t(token)
  WHERE t.token <> ''
  GROUP BY {id_col}, t.token),
nd AS (SELECT COUNT(*) AS n_docs FROM src),
dfreq_all AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq,
         LN((1.0 + CAST((SELECT n_docs FROM nd) AS DOUBLE))
            / (1.0 + CAST(COUNT(*) AS DOUBLE))) + 1.0 AS idf
  FROM tf GROUP BY token HAVING COUNT(*) >= {min_df}),
dfreq AS (
  SELECT token, doc_freq, idf FROM dfreq_all
  QUALIFY ROW_NUMBER() OVER (ORDER BY doc_freq DESC, token ASC)
          <= {max_vocab}),
scored AS (
  SELECT tf.{id_col}, tf.token, tf.tf, dfreq.doc_freq,
         CAST(tf.tf AS DOUBLE) * dfreq.idf AS score
  FROM tf JOIN dfreq USING (token)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {id_col}
                               ORDER BY score DESC, token ASC) AS rank
  FROM scored)
SELECT {id_col}, token, tf, doc_freq, ROUND(score, {SCORE_DP}) AS score,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top_n}
"""


# ---------------------------------------------- TextRank keywords

TEXTRANK_WINDOW = 2
TEXTRANK_ITERS = 4
TEXTRANK_DP = 6


def textrank_cooccurrence_edges(docs: DataFrame, text_col: str,
                                id_col: str,
                                window: int = TEXTRANK_WINDOW
                                ) -> DataFrame:
    """The TextRank word graph (Mihalcea & Tarau 2004): directed
    co-occurrence edges between distinct terms whose positions in a
    document lie within ``window`` tokens, weight = corpus-wide
    co-occurrence count (INTEGER — the weighted-pagerank exactness
    contract). Both directions are emitted, so the graph is symmetric
    and never dangling. One posexplode + one per-doc self-join whose
    position band rides as EQUI-join keys (each position explodes its
    ≤ ``window`` offsets, joining on p₂ = p₁ + δ — exactly n·window
    pairs per doc by construction, never an n² enumerate-then-filter)
    + one count aggregate."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = f"split(trim(lower({text_col})), '\\\\s+')"
    pos = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.expr(toks)).alias("_p", "_t")).filter(
        F.col("_t") != "")
    right = pos.select(F.col("_d").alias("_d2"),
                       F.col("_p").alias("_p2"),
                       F.col("_t").alias("_t2"))
    offs = F.explode(F.array(*[F.lit(i) for i in
                               range(1, window + 1)]))
    left = (pos.select("_d", "_p", "_t", offs.alias("_o"))
            .withColumn("_tp", F.col("_p") + F.col("_o")))
    pairs = left.join(
        right,
        (F.col("_d") == F.col("_d2"))
        & (F.col("_tp") == F.col("_p2"))
        & (F.col("_t") != F.col("_t2")))
    und = pairs.select(F.col("_t").alias("src"),
                       F.col("_t2").alias("dst"))
    both = und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
    return both.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("w"))


def textrank_keywords(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 20,
                      window: int = TEXTRANK_WINDOW,
                      iters: int = TEXTRANK_ITERS) -> DataFrame:
    """Corpus-level TextRank keywords — the GRAPH-centrality
    complement of :func:`tfidf_keywords` (TF-IDF scores terms by
    rarity-weighted frequency; TextRank scores them by how central
    they sit in the co-occurrence graph): weighted PageRank
    (``graph.pagerank`` — the same power iterations, dangling check
    short-circuited by the symmetric construction) over the word
    graph, top-k terms by rank. Output: (term, pr, rank) — pr rounded
    at the pagerank family's terminal 6 dp, ties broken by term.

    Pure composition: the edge builder + the existing iterative
    pagerank; the oracle replays the same edges SQL through the
    unrolled pagerank mirror. Classic TextRank ranks per document —
    at corpus scale the aggregated graph is the useful variant
    (corpus salience for tagging/stopword mining); a per-doc run is
    the same composition grouped by id."""
    from flink_rag_spark.operators.graph import pagerank
    edges = textrank_cooccurrence_edges(docs, text_col, id_col, window)
    pr = pagerank(edges, iters=iters, weight="w")
    return (pr.orderBy(F.desc("pr"), F.col("node")).limit(k)
            .select(F.col("node").alias("term"), "pr")
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("pr"), F.col("term")))))


def textrank_edges_duck(text_col: str, id_col: str,
                        window: int = TEXTRANK_WINDOW,
                        table: str = "documents") -> str:
    """The edge builder's DuckDB rendering — (src, dst, w)."""
    toks = f"string_split_regex(trim(lower({text_col})), '\\s+')"
    return f"""
SELECT src, dst, COUNT(*) AS w FROM (
  SELECT a.t AS src, b.t AS dst
  FROM (SELECT {id_col} AS d, UNNEST({toks}) AS t,
               generate_subscripts({toks}, 1) AS p FROM {table}) a
  JOIN (SELECT {id_col} AS d, UNNEST({toks}) AS t,
               generate_subscripts({toks}, 1) AS p FROM {table}) b
    ON a.d = b.d AND b.p > a.p AND b.p <= a.p + {window}
   AND a.t <> b.t AND a.t <> '' AND b.t <> ''
  UNION ALL
  SELECT b.t AS src, a.t AS dst
  FROM (SELECT {id_col} AS d, UNNEST({toks}) AS t,
               generate_subscripts({toks}, 1) AS p FROM {table}) a
  JOIN (SELECT {id_col} AS d, UNNEST({toks}) AS t,
               generate_subscripts({toks}, 1) AS p FROM {table}) b
    ON a.d = b.d AND b.p > a.p AND b.p <= a.p + {window}
   AND a.t <> b.t AND a.t <> '' AND b.t <> ''
) GROUP BY src, dst
"""


def textrank_keywords_duck(text_col: str = "text",
                           id_col: str = "doc_id", k: int = 20,
                           window: int = TEXTRANK_WINDOW,
                           iters: int = TEXTRANK_ITERS,
                           table: str = "documents") -> str:
    """DuckDB mirror of :func:`textrank_keywords` — the same edges SQL
    through the unrolled weighted-pagerank mirror, same top-k tie
    order."""
    from flink_rag_spark.operators.graph import pagerank_duck
    inner = pagerank_duck(
        textrank_edges_duck(text_col, id_col, window, table),
        iters=iters, weighted=True)
    return f"""
SELECT node AS term, pr,
       ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS rank
FROM ({inner}) _tr
ORDER BY pr DESC, term LIMIT {k}
"""


# ------------------------------------------------ Zipf-law fit

ZIPF_LN_DP = 9
ZIPF_DP = 6
ZIPF_TOP_N = 1000


def zipf_fit(docs: DataFrame, text_col: str = "text",
             top_n: int = ZIPF_TOP_N) -> DataFrame:
    """Zipf-law fit of the corpus term-frequency distribution — the
    text-quality diagnostic beside the per-doc scores (natural text's
    rank-frequency plot is near-linear in log-log with slope ≈ −1;
    templated/generated/boilerplate corpora bend it — a cheap
    corpus-level generated-text smell):

        ln f_r = intercept + slope · ln r      (OLS over the top-N)

    Output ONE row: (n_terms, slope, intercept, r2). Ranks tie-break
    by (count DESC, term ASC) — deterministic.

    Exactness: the top-N cut is a TakeOrderedAndProject (K-bounded —
    the tfidf_keywords broadcast-bound pattern, never a global sort);
    ln r and ln f quantize to ``ZIPF_LN_DP``-dp DECIMAL (the G-test
    discipline), the OLS sums are exact decimal products, and the
    closed form runs on floor-split doubles.

    Plan at 100 TB: one token-count aggregate (the only full-data
    shuffle), a K-row ordered cut, one K-row fold."""
    from flink_rag_spark.functions.textfns import TOKENS_SPARK
    from flink_rag_spark.operators.util import dec_to_double

    if top_n < 3:
        raise ValueError(f"top_n must be >= 3, got {top_n}")
    toks = TOKENS_SPARK.format(s=f"lower({text_col})")
    counts = (docs.select(F.explode(F.expr(toks)).alias("term"))
              .filter(F.col("term") != "")
              .groupBy("term").agg(F.count(F.lit(1)).alias("f"))
              .orderBy(F.desc("f"), F.asc("term")).limit(top_n))
    w = Window.orderBy(F.desc("f"), F.asc("term"))
    # (14,9) so the OLS cross products type exactly (29,18) in Spark
    # instead of being precision-loss-adjusted (the ANOVA_DEC note)
    lndec = f"decimal(14,{ZIPF_LN_DP})"
    g = (counts.withColumn("_r", F.row_number().over(w))
         .select(
             F.round(F.log(F.col("_r").cast("double")), ZIPF_LN_DP)
             .cast(lndec).alias("_x"),
             F.round(F.log(F.col("f").cast("double")), ZIPF_LN_DP)
             .cast(lndec).alias("_y")))
    agg = g.agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
                F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
                F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
                F.sum(F.col("_y") * F.col("_y")).alias("_syy"))
    n = F.col("n_terms").cast("double")

    def d(c):
        return dec_to_double(F.col(c))

    vx = n * d("_sxx") - d("_sx") * d("_sx")
    vy = n * d("_syy") - d("_sy") * d("_sy")
    cov = n * d("_sxy") - d("_sx") * d("_sy")
    slope = F.when(vx > 0, cov / vx)
    intercept = F.when(vx > 0, (d("_sy") - slope * d("_sx")) / n)
    r2 = F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))
    return agg.select(
        "n_terms",
        F.round(slope, ZIPF_DP).alias("slope"),
        F.round(intercept, ZIPF_DP).alias("intercept"),
        F.round(r2, ZIPF_DP).alias("r2"))


def zipf_fit_duck(text_col: str = "text", top_n: int = ZIPF_TOP_N,
                  table: str = "documents") -> str:
    """DuckDB mirror of :func:`zipf_fit` — same deterministic cut,
    quantized lns, exact decimal OLS sums."""
    from flink_rag_spark.functions.textfns import TOKENS_DUCK
    from flink_rag_spark.operators.util import dec_to_double_duck

    toks = TOKENS_DUCK.format(s=f"lower({text_col})")
    dp, odp = ZIPF_LN_DP, ZIPF_DP
    d = dec_to_double_duck
    return f"""
WITH zf_t AS (
  SELECT UNNEST({toks}) AS term FROM {table}),
zf_c AS (
  SELECT term, COUNT(*) AS f FROM zf_t WHERE term <> ''
  GROUP BY term ORDER BY f DESC, term ASC LIMIT {top_n}),
zf_g AS (
  SELECT CAST(ROUND(LN(CAST(ROW_NUMBER() OVER
                (ORDER BY f DESC, term ASC) AS DOUBLE)), {dp})
              AS DECIMAL(14,{dp})) AS x,
         CAST(ROUND(LN(CAST(f AS DOUBLE)), {dp})
              AS DECIMAL(14,{dp})) AS y
  FROM zf_c),
zf_a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM zf_g),
zf_s AS (
  SELECT n_terms,
         CAST(n_terms AS DOUBLE) AS n,
         {d('sx')} AS sxd, {d('sy')} AS syd, {d('sxy')} AS sxyd,
         {d('sxx')} AS sxxd, {d('syy')} AS syyd
  FROM zf_a),
zf_f AS (
  SELECT n_terms, n,
         n * sxxd - sxd * sxd AS vx,
         n * syyd - syd * syd AS vy,
         n * sxyd - sxd * syd AS cov,
         sxd, syd
  FROM zf_s)
SELECT n_terms,
       ROUND(CASE WHEN vx > 0 THEN cov / vx END, {odp}) AS slope,
       ROUND(CASE WHEN vx > 0
             THEN (syd - (cov / vx) * sxd) / n END, {odp}) AS intercept,
       ROUND(CASE WHEN vx > 0 AND vy > 0
             THEN cov * cov / (vx * vy) END, {odp}) AS r2
FROM zf_f
"""
