"""Sequence packing: assign documents to fixed-token-budget packs.

Training pipelines pack variable-length documents into fixed-size context
windows (e.g. 8k tokens) to avoid padding waste. Exact GLOBAL first-fit is
inherently sequential — a fold over the whole corpus — so the scalable
form every real pipeline uses is SHARDED greedy packing: documents are
split into shards (hash of id, or a natural key like source), packing is
greedy first-fit in id order WITHIN each shard, and shards pack in
parallel. Packing quality is unaffected at scale (waste per shard is at
most one partial pack; with millions of tokens per shard that's noise)
while the work distributes embarrassingly.

Physical shape: one narrow pass to count tokens (pure-JVM regex split, no
UDF), one shuffle keyed by shard, then ``applyInPandas`` runs the
sequential fold per shard — each group is shard-bounded, never
corpus-bounded. Deterministic: (shard, doc order) fully determines the
assignment, which is what lets DuckDB's recursive CTE replay the exact
greedy fold as the grading oracle (plans/catalog_extra.py).

Semantics (pinned by tests and the oracle):
- docs pack in ascending ``id_col`` order within a shard;
- a doc whose tokens alone exceed ``budget`` still gets (its own) pack —
  packing never drops data; truncation is a separate downstream choice;
- ``pack_id`` is (shard, local pack ordinal) — globally unique, stable
  under re-runs.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.operators.util import widen_if_narrow


def with_token_counts(df: DataFrame, text_col: str,
                      out_col: str = "tok") -> DataFrame:
    """Whitespace token count, JVM-side — EXACTLY the shared counting rule
    (functions/textfns.token_count_expr) so the DuckDB oracle replays it."""
    from flink_rag_spark.functions.textfns import token_count_expr
    return df.withColumn(
        out_col, F.expr(token_count_expr(text_col)).cast("bigint"))


def pack_documents(df: DataFrame, text_col: str, id_col: str,
                   budget: int, n_shards: int = 64,
                   shard_expr=None) -> DataFrame:
    """(id, shard, tok, pack_id, pack_tokens): greedy first-fit packing
    within shards.

    ``pack_tokens`` is the running total of the doc's pack AFTER its own
    tokens — the final row of a pack carries the pack's full size.
    ``shard_expr``: Column overriding the default murmur-hash sharding —
    pass an engine-portable expression (e.g. ``pmod(id, n)``) when a SQL
    oracle must replay the same shard split.
    """
    if shard_expr is None:
        shard_expr = F.pmod(F.hash(F.col(id_col)), F.lit(n_shards))
    docs = (with_token_counts(widen_if_narrow(df), text_col)
            .select(F.col(id_col),
                    shard_expr.cast("int").alias("shard"),
                    "tok"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        packs, totals = [], []
        pack, acc = 0, 0
        for t in pdf["tok"]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                pack += 1
                acc = 0
            acc += t
            packs.append(pack)
            totals.append(acc)
        pdf["local_pack"] = packs
        pdf["pack_tokens"] = totals
        return pdf

    schema = (f"{id_col} long, shard int, tok long, "
              f"local_pack long, pack_tokens long")
    packed = docs.groupBy("shard").applyInPandas(pack, schema=schema)
    return packed.select(
        id_col, "shard", "tok",
        F.concat_ws("_", F.col("shard"), F.col("local_pack"))
        .alias("pack_id"),
        "pack_tokens")


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing efficiency: packs used, mean fill ratio. The
    observability half — a pipeline tunes budget/sharding from this."""
    per_pack = (packed.groupBy("shard", "pack_id")
                .agg(F.sum("tok").alias("pack_total")))
    return (per_pack.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_packs"),
                 F.round(F.avg(F.col("pack_total") / F.lit(float(budget))),
                         4).alias("mean_fill")))
