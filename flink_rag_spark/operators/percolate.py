"""Percolation — reverse search: STORED queries matched against each
incoming document (the OpenSearch/Elasticsearch percolator, the engine
family the reference fronts for retrieval). Forward search asks "which
docs match this query?"; an alerting/routing pipeline asks the reverse —
"which of my standing queries does this NEW doc match?" — for every
document, continuously.

Spark-first shape:

- stored queries are a tiny table (query_id, terms array, min_match) —
  alert definitions number in the thousands, not the corpus scale — so
  the term join BROADCASTS the query side after exploding it once into
  (query_id, term, n_terms) rows;
- each document pays ONE scan: distinct-token explode → map-side
  broadcast join on the term → per-(doc, query) matched-term count —
  the exchange carries only (doc, query, count) rows for doc/query
  pairs that share at least one term, never full text;
- the match predicate is count ≥ min_match, an ABSOLUTE matched-term
  count (n_terms = AND, 1 = OR, m = m-of-n — Elasticsearch's
  minimum_should_match with an absolute value; percentage forms are
  one ceil(frac·n_terms) away and deliberately not guessed at here).

At 100 TB/day the cost is the tokenize scan plus a broadcast join —
the same shape as the 13-gram decontaminator (curation.py), pointed at
standing queries instead of benchmark n-grams. The streaming twin is
one ``foreachBatch`` of this operator (batch ≡ stream by construction,
like the quality gate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.functions.textfns import TOKENS_DUCK, TOKENS_SPARK


def match_stored_queries(docs: DataFrame, queries: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(doc id, query_id, n_matched, n_terms, matched) for every
    (document, stored query) pair sharing at least one term, with
    ``matched`` = n_matched ≥ min_match. ``queries`` carries
    (query_id, terms array<string>, min_match int — an ABSOLUTE matched-
    term count: NULL/absent means ALL terms (AND), 1 means any (OR), m
    gives m-of-n). Both sides compare DISTINCT LOWERCASE term sets:
    query terms dedupe AFTER case-folding (so ["Fast","fast"] is one
    term, not two), and a document's tokens dedupe per document id even
    when the id spans multiple rows — set semantics, term frequency
    never counts, exactly the percolator's boolean contract."""
    qcols = queries.columns
    mm = (F.col("min_match") if "min_match" in qcols
          else F.lit(None).cast("int"))
    terms_lc = F.array_distinct(F.expr("transform(terms, t -> lower(t))"))
    qx = (queries
          .select("query_id",
                  F.size(terms_lc).alias("n_terms"),
                  mm.alias("_mm"),
                  F.explode(terms_lc).alias("term"))
          .select("query_id", "n_terms",
                  F.coalesce("_mm", "n_terms").alias("min_match"),
                  "term"))
    toks = TOKENS_SPARK.format(s=f"lower({text_col})")
    dx = (docs.select(F.col(id_col),
                      F.explode(F.array_distinct(F.expr(toks)))
                      .alias("term"))
          .filter(F.col("term") != "")
          .distinct())  # ids spanning rows still count each term once
    return (dx.join(F.broadcast(qx), on="term")
            .groupBy(id_col, "query_id")
            .agg(F.count(F.lit(1)).alias("n_matched"),
                 F.first("n_terms").alias("n_terms"),
                 F.first("min_match").alias("min_match"))
            .select(id_col, "query_id", "n_matched", "n_terms",
                    (F.col("n_matched") >= F.col("min_match"))
                    .alias("matched")))


def percolate_duck(queries: list[tuple], text_col: str = "text",
                   id_col: str = "doc_id",
                   table: str = "documents") -> str:
    """DuckDB mirror with the stored queries inlined as VALUES rows.
    ``queries`` = [(query_id, [terms...], min_match | None)]. Terms
    dedupe after case-folding, like the operator."""
    if not queries:
        raise ValueError("queries must be non-empty")
    rows = []
    for qid, terms, mm in queries:
        uniq = list(dict.fromkeys(t.lower() for t in terms))
        arr = "[" + ", ".join(
            "'" + t.replace("'", "''") + "'" for t in uniq) + "]"
        rows.append(f"({qid}, {arr}, {mm if mm is not None else len(uniq)})")
    toks = TOKENS_DUCK.format(s=f"lower({text_col})")
    return f"""
WITH q(query_id, terms, min_match) AS (VALUES {", ".join(rows)}),
qx AS (SELECT query_id, len(terms) AS n_terms, min_match,
              unnest(terms) AS term FROM q),
dx AS (SELECT DISTINCT {id_col}, unnest(list_distinct({toks})) AS term
       FROM {table}),
m AS (SELECT dx.{id_col}, qx.query_id, COUNT(*) AS n_matched,
             MIN(qx.n_terms) AS n_terms, MIN(qx.min_match) AS min_match
      FROM dx JOIN qx ON dx.term = qx.term AND dx.term <> ''
      GROUP BY 1, 2)
SELECT {id_col}, query_id, CAST(n_matched AS BIGINT) AS n_matched,
       CAST(n_terms AS INT) AS n_terms,
       (n_matched >= min_match) AS matched
FROM m
"""
