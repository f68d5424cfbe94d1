"""Persisted ANN index for the embeddings table.

``build_ivf_index`` materializes what the in-line IVF path computes per
query batch: the trained centroids (tiny JSON) and the cell-assigned
vectors, written as parquet PARTITIONED BY cell. A probe then reads only
``cell=i/`` directories — partition pruning turns n_probe/n_centroids into
an I/O ratio, which is the entire point at 100 TB (the reference gets the
same effect from OpenSearch's inverted index; here it is plain columnar
storage layout).

Rebuild cadence is the ingest pipeline's compaction cadence
(operators/maintenance.py); between rebuilds, fresh vectors are served by
unioning the (small) un-indexed tail exactly like plans/rag.py unions the
live store.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.operators.similarity import ivf_centroids, with_ivf_cells


def build_ivf_index(spark: SparkSession, embeddings: DataFrame, path: str,
                    n_centroids: int | None = None,
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    files_per_cell: int = 1) -> list[list[float]]:
    """Train centroids, assign cells, write `path/cells/` (partitioned by
    cell) + `path/centroids.json`. Returns the centroids.

    The write is repartitioned on (cell, salt) first: a naive
    ``partitionBy("cell")`` write has every upstream task emit a file into
    every cell directory — tasks × cells small files (measured 1271 files
    vs 64 at sf0.1, and a ~4× slower commit). ``files_per_cell`` is the
    per-cell write parallelism: 1 locally; on a cluster raise it so each
    task writes ~128-512 MB (e.g. 100 TB / 1024 cells / 256 MB ≈ 400)."""
    import math
    n = None
    if n_centroids is None:
        n = embeddings.count()
        n_centroids = min(1024, max(cfg.ivf_n_centroids, int(math.sqrt(n))))
    cents = ivf_centroids(embeddings, n_centroids=n_centroids, cfg=cfg,
                          n_rows=n)
    cells = with_ivf_cells(embeddings, cents)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in embeddings.columns]),
                  F.lit(files_per_cell))
    (cells.repartition(n_centroids * files_per_cell, F.col("cell"), salt)
     .write.mode("overwrite").partitionBy("cell").parquet(
         os.path.join(path, "cells")))
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(cents, f)
    return cents


def load_ivf_index(spark: SparkSession, path: str) -> tuple[list[list[float]], DataFrame]:
    """(centroids, cells DataFrame). A `cell IN (probes)` filter on the
    returned frame prunes partition directories at the scan."""
    with open(os.path.join(path, "centroids.json")) as f:
        cents = json.load(f)
    cells = spark.read.parquet(os.path.join(path, "cells"))
    return cents, cells
