"""Iterative graph operators: connected components for duplicate-group
resolution (north-star surface; the reference has no notion of dedup).

Near-dup pairs (LSH→Jaccard, simhash, embedding-cosine) are EDGES; turning
them into duplicate GROUPS — every doc labeled with its group representative
— is transitive closure, the one step of the dedup pipeline the DataFrame
API cannot express in a single plan. It runs as driver-coordinated
min-label propagation: each round every node takes the minimum label among
itself and its neighbors (one join + one aggregate per round, both
shuffle-partitioned on the node id), until a round changes nothing.

Scale notes: rounds needed = graph diameter. Near-dup graphs are unions of
near-cliques (docs sharing LSH buckets), so diameter is tiny (2-4) and the
loop runs a handful of rounds regardless of corpus size. For adversarial
long-chain graphs the literature's large-star/small-star alternating rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond") converge
in O(log n) rounds with the same per-round join shape — the drop-in upgrade
if diameter ever becomes the bottleneck. Each round persists its result and
unpersists the previous one, so lineage stays one round deep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(node, group_rep) for every node appearing in ``pairs``; group_rep
    is the component's minimum id — the same deterministic survivor rule
    as exact_dedup. Raises if not converged within ``max_iter`` rounds
    (near-dup graphs converge in ~diameter rounds)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (edges.union(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
             .distinct().persist())
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("rep", F.col("node")).persist())
    try:
        for _ in range(max_iter):
            nbr_min = (edges.join(labels, edges.src == labels.node)
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.min("rep").alias("nbr_rep")))
            new_labels = (labels.join(nbr_min, on="node", how="left")
                          .select("node",
                                  F.least(F.col("rep"),
                                          F.coalesce("nbr_rep", "rep"))
                                   .alias("rep"))
                          .persist())
            changed = (labels.withColumnRenamed("rep", "old_rep")
                       .join(new_labels, on="node")
                       .filter(F.col("old_rep") != F.col("rep")).count())
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels.select("node", F.col("rep").alias("group_rep"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "pathological graph diameter; switch to large-star/small-star")
    finally:
        edges.unpersist()
