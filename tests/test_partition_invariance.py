"""Partition-count invariance: graded results must not depend on the
session's shuffle-partition setting. The driver owns its own session
shape; any query whose values shift with partitioning (a non-deterministic
sample, an unseeded tie-break, partition-order-dependent survivor choice)
would pass pytest and fail the grade — this sweep catches that class
directly by running value-sensitive queries under two partition counts
and comparing canonical values."""

import pytest

from flink_rag_spark.plans.catalog import query_fns
from tests.oracle_check import canon

# the queries where partition sensitivity has somewhere to hide:
# sampling survivors, window tie-breaks, iterative group resolution,
# driver-side index builds, fused rankings, sequential packing
SENSITIVE = [
    "weighted_sample_docs",
    "dedup_group_assignment",
    "gapfill_hourly_user_values",
    "hybrid_rrf_vec7",
    "incremental_neardup_batch",
    "packed_documents",
    "heavy_hitters_users",
    "rollup_incremental_hourly",
    # round-7 families: survivor choice (semantic dedup), store rewrite
    # (upsert), rank tie-breaks (projected knn), any-overlap drop set
    "semantic_dedup_docs",
    "upserted_documents",
    "projected_knn_vec7",
    "ngram_decontaminated_docs",
    "rollup_hll_users_hourly",
    "curated_packed_training_set",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_values_invariant_under_partitioning(spark, sf_oracle, name):
    fn = query_fns()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        a = canon(fn(spark, sf_oracle).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = canon(fn(spark, sf_oracle).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b and a
