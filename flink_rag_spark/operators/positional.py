"""Positional phrase search — exact multi-word phrase matching.

The engine's lexical tier is bag-of-words (BM25 postings carry term
frequencies, `operators/ranking.py`; the percolator matches term SETS,
`operators/percolate.py`). Lucene's remaining lexical capability — the
backend the reference actually queries through OpenSearch — is the
POSITIONAL index: "match documents containing these words ADJACENT and
IN ORDER". This module adds that: a phrase table (like the percolator's
standing queries) matched against every document in one pass.

Plan at 100 TB:

- documents tokenize ONCE into (doc, pos, token) via posexplode — the
  same word-level tokenizer as the encoding/keywords family, so phrase
  terms align with the induced vocabulary;
- phrases explode into (phrase, offset, token) — a TINY frame (queries
  are human-authored), BROADCAST;
- one equi-join on the token key keeps only (doc, phrase) position
  pairs whose token matches — the corpus-side frame is pre-pruned by
  the broadcast join to rows whose token appears in ANY phrase (the
  percolator's distinct-token discipline), so the shuffle carries
  candidate hits only;
- a hit at anchor p requires every phrase offset k to match at p+k:
  group by (doc, phrase, anchor = pos − offset) and count distinct
  offsets — a phrase of length m matches where the count equals m.
  No self-join per word, no m−1 join chain: ONE aggregate whatever the
  phrase length;
- output: (doc, phrase, n_occurrences, first_pos) per matching pair.

Determinism: exact integer arithmetic end to end; ``first_pos`` is the
smallest matching anchor. The DuckDB mirror replays the same
tokenize → offset-join → anchor-count plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: the encoding-family tokenizer — IMPORTED, not re-declared, so phrase
#: terms can never drift from the induced vocabulary's tokenization
from flink_rag_spark.operators.encoding import _TOKS  # noqa: E402


def phrase_match(docs: DataFrame, phrases: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 phrase_id: str = "phrase_id",
                 phrase_col: str = "phrase") -> DataFrame:
    """Match every stored phrase against every document: (id,
    phrase_id, n_occurrences, first_pos) for each (document, phrase)
    pair where the phrase's tokens occur adjacent and in order.
    ``first_pos`` is the 0-based token position of the earliest
    occurrence. Single-token phrases degenerate to term lookup;
    documents shorter than a phrase can never match it."""
    toks = (docs.select(
        F.col(id_col),
        F.posexplode(F.expr(_TOKS.format(s=text_col)))
        .alias("pos", "token"))
        .filter(F.col("token") != ""))
    ptoks = (phrases.select(
        F.col(phrase_id),
        F.posexplode(F.expr(_TOKS.format(s=phrase_col)))
        .alias("off", "token"))
        .filter(F.col("token") != ""))
    plen = ptoks.groupBy(phrase_id).agg(
        F.count(F.lit(1)).alias("_m"))
    hits = (toks.join(F.broadcast(ptoks), on="token")
            .select(id_col, phrase_id,
                    (F.col("pos") - F.col("off")).alias("anchor"),
                    "off"))
    anchored = (hits.groupBy(id_col, phrase_id, "anchor")
                # one row per (anchor, off) is guaranteed: a given doc
                # position matches a given phrase offset at most once —
                # count(*) IS the distinct-offset count
                .agg(F.count(F.lit(1)).alias("_k"))
                .filter(F.col("anchor") >= 0))
    return (anchored.join(F.broadcast(plen), on=phrase_id)
            .filter(F.col("_k") == F.col("_m"))
            .groupBy(id_col, phrase_id)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
                 F.min("anchor").cast("bigint").alias("first_pos")))


def phrase_match_duck(docs_sql: str, phrases_sql: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      phrase_id: str = "phrase_id",
                      phrase_col: str = "phrase") -> str:
    """DuckDB mirror of :func:`phrase_match` — same tokenizer, same
    anchor-count plan. DuckDB has no UNNEST WITH ORDINALITY, so
    positions come from the indexed list_transform idiom (1-based,
    normalized to the 0-based positions the Spark side emits)."""
    pos_list = ("list_transform(range(1, len(_l) + 1), "
                "i -> {{'token': _l[i], 'pos': i - 1}})")
    return f"""
WITH d AS (SELECT * FROM ({docs_sql})),
p AS (SELECT * FROM ({phrases_sql})),
toks AS (
  SELECT {id_col}, u.pos AS pos, u.token AS token
  FROM (SELECT {id_col}, unnest({pos_list.format()}) AS u
        FROM (SELECT {id_col},
                     string_split_regex(trim(lower({text_col})), '\\s+')
                     AS _l FROM d)) q
  WHERE u.token <> ''),
ptoks AS (
  SELECT {phrase_id}, u.pos AS off, u.token AS token
  FROM (SELECT {phrase_id}, unnest({pos_list.format()}) AS u
        FROM (SELECT {phrase_id},
                     string_split_regex(trim(lower({phrase_col})), '\\s+')
                     AS _l FROM p)) q
  WHERE u.token <> ''),
plen AS (SELECT {phrase_id}, COUNT(*) AS m FROM ptoks GROUP BY 1),
anchored AS (
  SELECT toks.{id_col}, ptoks.{phrase_id},
         toks.pos - ptoks.off AS anchor, COUNT(*) AS k
  FROM toks JOIN ptoks USING (token)
  WHERE toks.pos - ptoks.off >= 0
  GROUP BY 1, 2, 3)
SELECT a.{id_col}, a.{phrase_id},
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(a.anchor) AS BIGINT) AS first_pos
FROM anchored a JOIN plen USING ({phrase_id})
WHERE a.k = plen.m
GROUP BY 1, 2
"""
