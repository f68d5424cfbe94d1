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
