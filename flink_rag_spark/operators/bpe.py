"""BPE tokenizer induction — byte-pair-encoding merge learning at
corpus scale (Sennrich et al. 2016, arXiv:1508.07909; the GPT-2/RoBERTa
tokenizer family). The engine's vocab induction (operators/encoding.py)
ranks whole words; BPE learns SUBWORD units, the piece an actual
pretraining pipeline ships.

Scale shape — the classic trick that makes BPE trainable on 100 TB:

- the corpus is scanned ONCE into a (word, count) frequency table; all
  M merge iterations run over that VOCAB-bounded frame (≈10⁷ rows for
  web corpora), never touching the corpus again;
- each iteration is one Spark job on the vocab frame: adjacent-pair
  explode weighted by word count → map-side-combined groupBy(l, r) →
  argmax (orderBy + limit 1 — a 1-row collect, bounded driver
  metadata), then the winning merge applies to every word's symbol
  array as a pure Catalyst ``aggregate`` fold (greedy left-to-right,
  non-overlapping — the reference semantics);
- the evolving word→symbols frame is eagerly ``localCheckpoint``-ed per
  iteration (vocab-bounded) and the previous iteration's blocks freed —
  a cache alone is NOT enough, because the LOGICAL plan would still
  nest all M fold expressions and every AQE plan-string render walks
  the whole stack (measured: driver OOM at 24 merges on default heap);
  the checkpoint truncates lineage to a constant-size LogicalRDD. On a
  cluster, swap in reliable ``checkpoint()`` if executor loss during
  training must be survivable;
- the trained state is (a) the M-row merge table and (b) the final
  word→symbols table; ENCODING a document is then a posexplode → join
  on the word → position-ordered re-aggregation (the same shape as
  encoding.encode_documents) — no per-token python, no merge replay.

The merge loop is a genuinely iterative algorithm (each step depends on
the argmax of the last), so the catalog entry is rows-only by the
driver contract; the DEFINITION is pinned by a pure-python BPE replica
test that must reproduce the exact merge sequence and symbol tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


END_OF_WORD = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercased whitespace tokens — the ONE corpus
    scan; everything downstream is vocab-bounded."""
    toks = f"split(trim(lower({text_col})), '\\\\s+')"
    return (docs.select(F.explode(F.expr(toks)).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _init_symbols(words: DataFrame) -> DataFrame:
    """word → [c1, c2, ..., '</w>'] initial symbol arrays."""
    return words.select(
        "word", "cnt",
        F.expr(f"concat(split(word, ''), array({_sql_str(END_OF_WORD)}))")
        .alias("syms"))


def _merge_expr(left: str, right: str) -> str:
    """Catalyst fold applying one merge greedily left-to-right without
    overlap: pending symbol + current symbol match (left, right) →
    emit the fused symbol, else flush pending."""
    fused = _sql_str(left + right)
    ll, rr = _sql_str(left), _sql_str(right)
    return (
        "aggregate(syms, "
        "named_struct('out', CAST(array() AS array<string>), "
        "'pend', CAST(NULL AS string)), "
        "(acc, s) -> CASE "
        "WHEN acc.pend IS NULL THEN named_struct('out', acc.out, 'pend', s) "
        f"WHEN acc.pend = {ll} AND s = {rr} THEN "
        f"named_struct('out', array_append(acc.out, {fused}), "
        "'pend', CAST(NULL AS string)) "
        "ELSE named_struct('out', array_append(acc.out, acc.pend), "
        "'pend', s) END, "
        "acc -> CASE WHEN acc.pend IS NULL THEN acc.out "
        "ELSE array_append(acc.out, acc.pend) END)")


def _pair_counts(word_syms: DataFrame) -> DataFrame:
    """(l, r, n) adjacent-symbol pair counts weighted by word count —
    overlapping occurrences included (reference BPE counting)."""
    pairs = ("transform(sequence(1, size(syms) - 1), "
             "i -> named_struct('l', element_at(syms, i), "
             "'r', element_at(syms, i + 1)))")
    return (word_syms.filter(F.size("syms") >= 2)
            .select(F.explode(F.expr(pairs)).alias("p"), "cnt")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n")))


def train_bpe(docs: DataFrame, text_col: str = "text",
              n_merges: int = 32,
              min_pair_count: int = 2) -> tuple[list[tuple], DataFrame]:
    """Learn ``n_merges`` BPE merges over ``docs``. Returns
    (merges, word_syms): merges = [(rank, left, right, pair_count)]
    in learned order (stops early when no pair reaches
    ``min_pair_count``); word_syms = the final (word, cnt, syms)
    frame — the trained state encoding joins against. Ties break on
    (l, r) ascending so the sequence is deterministic and
    python-replayable."""
    # eager localCheckpoint: materializes AND truncates the logical plan
    # to a LogicalRDD, so iteration i+1's plan never nests iteration i's
    # fold expression (a bare persist leaves the lineage in the plan and
    # the driver OOMs rendering it after ~24 merges)
    cur = _init_symbols(word_frequencies(docs, text_col)).localCheckpoint()
    merges: list[tuple] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (_pair_counts(cur)
                   .orderBy(F.desc("n"), "l", "r").limit(1).collect())
            if not top or top[0]["n"] < min_pair_count:
                break
            l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
            merges.append((rank, l, r, n))
            nxt = cur.select(
                "word", "cnt",
                F.expr(_merge_expr(l, r)).alias("syms")).localCheckpoint()
            cur.unpersist()
            cur = nxt
    except Exception:
        cur.unpersist()
        raise
    return merges, cur


def bpe_encode(docs: DataFrame, word_syms: DataFrame, text_col: str,
               id_col: str) -> DataFrame:
    """(id, pieces) — each document's BPE symbol sequence via
    posexplode of its words, a join on the trained word→symbols table
    (words unseen at train time fall back to characters + '</w>'), and
    position-ordered re-aggregation. The join shuffles on the word —
    vocab-keyed, never carrying documents' full text through more than
    the one explode."""
    toks = f"split(trim(lower({text_col})), '\\\\s+')"
    wpos = (docs
            .select(F.col(id_col),
                    F.posexplode(F.expr(toks)).alias("pos", "word"))
            .filter(F.col("word") != ""))
    joined = (wpos.join(word_syms.select("word", "syms"),
                        on="word", how="left")
              .withColumn("syms", F.coalesce(
                  F.col("syms"),
                  F.expr(f"concat(split(word, ''), "
                         f"array({_sql_str(END_OF_WORD)}))"))))
    return (joined.groupBy(id_col)
            .agg(F.flatten(F.expr(
                "transform(array_sort(collect_list("
                "named_struct('pos', pos, 'syms', syms))), x -> x.syms)"))
                .alias("pieces")))
