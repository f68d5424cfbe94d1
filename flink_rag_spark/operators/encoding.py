"""Vocabulary induction + token-id encoding — the tokenization stage of a
training-data pipeline (ABSENT in the reference; north-star text surface,
SURVEY.md §2.2): turn a text corpus into fixed-id integer sequences a
trainer consumes, with the vocabulary derived from the corpus itself.

Word-level (whitespace tokens, matching the engine's token family); a BPE
learner is iterative-merge-loop-shaped and belongs in a trainer, but the
id-assignment / encoding plumbing here is exactly what any tokenizer's
Spark-side application looks like: broadcast vocab, one explode + map-side
join, one per-document re-aggregation.

Plan at 100 TB:

- vocabulary: wordcount-shaped aggregation (map-side combine collapses
  repeated tokens before the shuffle) → top-K by (count DESC, token ASC)
  → id assignment by a window over the K-row result. The window is a
  single-partition sort over the VOCABULARY (≤ ~10^6 rows at any corpus
  size), never over the corpus — bounded by construction.
- encoding: posexplode (keeps token positions) → broadcast-hash join
  against the vocabulary (token traffic never shuffles carrying the
  vocab) → one groupBy(doc) re-aggregation whose order is restored by
  array_sort over (pos, id) structs — collect_list alone is
  partition-order-dependent and would break determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: id 0 is reserved for out-of-vocabulary tokens (the UNK convention)
UNK_ID = 0

_TOKS = "split(trim(lower({s})), '\\\\s+')"


def build_vocab(docs: DataFrame, text_col: str,
                vocab_size: int = 30_000,
                min_count: int = 1) -> DataFrame:
    """(token, token_id, n) — ids 1..K assigned by (count DESC, token
    ASC), a total order so the assignment is engine- and run-stable;
    id 0 stays reserved for UNK."""
    from pyspark.sql import Window
    freq = (docs.select(F.explode(
        F.expr(_TOKS.format(s=text_col))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count))
    top = freq.orderBy(F.desc("n"), F.asc("token")).limit(vocab_size)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return top.select("token", F.row_number().over(w).alias("token_id"),
                      "n")


def encode_documents(docs: DataFrame, text_col: str, id_col: str,
                     vocab: DataFrame) -> DataFrame:
    """(id, n_tokens, token_ids array<int>) — every token mapped through
    the broadcast vocabulary, OOV → UNK_ID, original order preserved."""
    toks = (docs.select(
        F.col(id_col),
        F.posexplode(F.expr(_TOKS.format(s=text_col)))
        .alias("pos", "token")))
    mapped = (toks.join(F.broadcast(vocab.select("token", "token_id")),
                        on="token", how="left")
              .select(id_col, "pos",
                      F.coalesce(F.col("token_id"), F.lit(UNK_ID))
                      .cast("int").alias("tid")))
    return (mapped.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                 F.expr("transform(array_sort(collect_list(struct(pos, "
                        "tid))), x -> x.tid)").alias("token_ids")))


def vocab_coverage(docs: DataFrame, text_col: str, id_col: str,
                   vocab: DataFrame) -> DataFrame:
    """(id, n_tokens, n_oov, oov_rate) — per-document tokenizer
    coverage: how much of each document the induced vocabulary fails to
    express. The gating statistic for vocab sizing (raise vocab_size /
    lower min_count until the corpus-wide OOV mass is acceptable) and a
    per-doc quality signal (high OOV ⇒ non-linguistic or wrong-language
    content).

    Same plan skeleton as ``encode_documents`` minus the order-restoring
    re-aggregation: one explode, one broadcast-hash join against the
    vocabulary (OOV = no match), one count aggregate per document — the
    token stream never shuffles carrying the vocab, and the groupBy is
    map-side combined. At 100 TB this is strictly cheaper than encoding
    (no position structs, no array_sort)."""
    toks = (docs.select(
        F.col(id_col),
        F.explode(F.expr(_TOKS.format(s=text_col))).alias("token")))
    mapped = toks.join(F.broadcast(vocab.select("token", "token_id")),
                       on="token", how="left")
    return (mapped.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.sum(F.when(F.col("token_id").isNull(), 1)
                       .otherwise(0)).cast("bigint").alias("n_oov"))
            .withColumn("oov_rate",
                        F.round(F.col("n_oov") / F.col("n_tokens"), 6)))


def vocab_coverage_duck(table: str, text_col: str, id_col: str,
                        vocab_size: int = 30_000,
                        min_count: int = 1) -> str:
    """DuckDB mirror of build_vocab + vocab_coverage over one corpus —
    same tokenization, same (count DESC, token ASC) top-K vocabulary,
    same per-doc OOV fold."""
    toks = f"string_split_regex(trim(lower({text_col})), '\\s+')"
    return f"""
WITH tok AS (
  SELECT {id_col}, unnest({toks}) AS token FROM {table}),
freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token
         HAVING COUNT(*) >= {min_count}),
vocab AS (SELECT token FROM freq
          ORDER BY n DESC, token ASC LIMIT {vocab_size}),
mapped AS (
  SELECT tok.{id_col},
         CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok LEFT JOIN vocab v USING (token))
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
FROM mapped GROUP BY {id_col}
"""


def encoded_documents_duck(table: str, text_col: str, id_col: str,
                           vocab_size: int = 30_000,
                           min_count: int = 1) -> str:
    """DuckDB mirror of build_vocab + encode_documents over one corpus:
    same tokenization, same (count DESC, token ASC) id order, same UNK=0,
    same position-ordered output arrays."""
    toks = f"string_split_regex(trim(lower({text_col})), '\\s+')"
    return f"""
WITH tok AS (
  SELECT {id_col}, t.token, t.pos
  FROM {table},
       LATERAL (SELECT unnest({toks}) AS token,
                       generate_subscripts({toks}, 1) AS pos) t),
freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token
         HAVING COUNT(*) >= {min_count}),
vocab AS (SELECT token,
                 ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS token_id
          FROM (SELECT * FROM freq ORDER BY n DESC, token ASC
                LIMIT {vocab_size})),
mapped AS (
  SELECT tok.{id_col}, tok.pos,
         CAST(COALESCE(v.token_id, {UNK_ID}) AS INT) AS tid
  FROM tok LEFT JOIN vocab v USING (token))
SELECT {id_col}, CAST(COUNT(*) AS INT) AS n_tokens,
       array_to_string(list(tid ORDER BY pos), ' ') AS token_ids_str
FROM mapped GROUP BY {id_col}
"""
