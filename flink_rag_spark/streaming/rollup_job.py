"""Streaming rollup maintenance: the continuous-aggregate job.

Wires ``operators/rollup.py`` into Structured Streaming the same way
``streaming/ingest.py`` maintains the vector store and the dedup index:
``foreachBatch`` runs the batch maintenance op per micro-batch, so the
materialized rollup stays fresh while every write touches only the day
partitions the micro-batch lands in (dynamic partition overwrite — never
O(history)).

Delivery: the merge is additive, so REPLAYING a micro-batch would
double-count — unlike the content-hash vector store, a partial aggregate
is not naturally idempotent. Structured Streaming's checkpointed
``foreachBatch`` gives at-least-once batch delivery with exactly-once
BATCH IDS, so the job skips batch ids it has already applied (the standard
idempotent-foreachBatch pattern: a tiny ``_applied/`` marker directory per
batch id next to the rollup, written AFTER the merge commits — replay of a
committed batch sees its marker and no-ops). Boundary stated honestly: a
crash in the instant between the merge's file commit and the marker write
would double-count that one batch on replay — closing that last window
needs an atomic data+marker commit, i.e. a transactional table format
(README "Single-writer boundary"). Single-writer assumptions as per the
same section.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.operators.rollup import append_to_rollup
from flink_rag_spark.session import ensure_runtime_confs


def run_rollup(spark: SparkSession, events_stream: DataFrame, path: str,
               checkpoint_dir: str, ts_col: str = "ts",
               keys: list[str] | None = None, value_col: str = "value",
               bucket: str = "1 hour",
               available_now: bool = False):
    """Maintain the materialized rollup at ``path`` from a streaming
    events frame. Returns the StreamingQuery."""
    ensure_runtime_confs(spark)
    keys = keys or []
    marker_dir = path.rstrip("/") + "_applied"
    os.makedirs(marker_dir, exist_ok=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, str(batch_id))
        if os.path.exists(marker):  # replayed, already merged — no-op
            return
        append_to_rollup(spark, batch_df, path, ts_col=ts_col, keys=keys,
                         value_col=value_col, bucket=bucket)
        with open(marker, "w") as f:
            f.write("applied")

    writer = (events_stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
