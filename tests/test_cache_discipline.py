"""Cache-leak discipline for the prefix-sum operator family.

The KS / Mann-Whitney / Spearman / Kruskal-Wallis / RFM machinery pins a
range-repartitioned distinct-value frame (spark_partition_id must be
identical for the offsets consumer and the join consumer, so the frame
persists). A long-lived serving session running thousands of these must
not accumulate cached RDDs — every operator records its pins via
``util.track_cached_deps`` and ``unpersist_cached_deps(result)`` after
the action releases them all (bench.py and the oracle sweep both do).

This test is the round-14 ADVICE contract: no net growth in
``sc.getPersistentRDDs`` across a loop of build -> collect -> release.
"""

import pyspark.sql.functions as F

from flink_rag_spark.operators.hypothesis import (
    kruskal_wallis,
    ks_two_sample_split,
    mann_whitney_u,
    spearman_corr,
)
from flink_rag_spark.operators.profiling import rfm_scores
from flink_rag_spark.operators.util import unpersist_cached_deps


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_prefix_sum_family_releases_cache(spark):
    src = spark.range(400).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 13).cast("double").alias("v"),
        (F.col("id") % 11).cast("double").alias("w"),
        F.col("id").alias("k"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") * 3600)
        .alias("ts"))
    a = src.filter(F.col("g") < 3)
    b = src.filter(F.col("g") >= 3)

    builders = [
        lambda: ks_two_sample_split(src, "v", F.col("g") < 3,
                                    F.col("g") >= 3),
        lambda: mann_whitney_u(a, b, "v", 1.96),
        lambda: spearman_corr(src, "v", "w"),
        lambda: kruskal_wallis(src, "g", "v", 12.59),
        lambda: rfm_scores(src, "k", "ts", "v"),
    ]
    # warm up once so any session-level lazily-cached state is counted
    # in the baseline, then loop: every subsequent round must return the
    # persistent-RDD registry to the baseline
    for build in builders:
        out = build()
        out.collect()
        assert getattr(out, "_cached_deps", []), \
            "operator no longer records its pins - update this test"
        unpersist_cached_deps(out, blocking=True)
    base = _n_persistent(spark)
    for _ in range(3):
        for build in builders:
            out = build()
            out.collect()
            unpersist_cached_deps(out, blocking=True)
        assert _n_persistent(spark) == base, \
            "prefix-sum family leaked cached RDDs across calls"
