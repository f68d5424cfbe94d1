"""Heavy hitters (frequent items) with bounded shuffle — exact results via
the two-phase sketch pattern (part of the approximate/sketch aggregate
family SURVEY.md §2.2 requires; ABSENT in the reference, which has no
aggregation at all).

The problem with `groupBy(key).count()` for "items above φ·N frequency"
at 100 TB is not the counting — it's that the shuffle carries EVERY
distinct key (billions of groups for, say, URL or token keys) to compute a
result with at most ⌊1/φ⌋ rows. The classic fix:

1. **Per-partition Misra-Gries summaries** (one narrow Arrow pass, no
   shuffle): each task keeps m = ⌈1/φ⌉ counters; merging a batch in and
   compacting to m counters subtracts the (m+1)-th largest count from all
   — the standard mergeable-summary step. Guarantee: an item whose
   partition count exceeds n_p/(m+1) survives that partition's summary, so
   an item with GLOBAL count > N/(m+1) ≥ φ·N must survive in at least one
   partition (if it were dropped everywhere, its total count would be
   ≤ Σ n_p/(m+1) = N/(m+1) < φ·N + 1 — contradiction). Candidates are
   therefore a SUPERSET of the true heavy hitters, and there are at most
   partitions × m of them.
2. **Exact recount of candidates only**: broadcast the candidate set, semi
   join (the big side is scanned, never shuffled on the full key space),
   and aggregate — the shuffle now carries ≤ partitions × m keys.

The result is EXACT (phase 2 uses true counts; phase 1 can only
over-include), unlike count-min/space-saving used alone. Total cost: two
scans, one bounded shuffle — vs one scan and one unbounded shuffle for the
naive plan. The per-partition row count rides along in the summary pass as
a sentinel row, so N needs no extra job: the summaries are COLLECTED
(bounded by partitions × (m+1) rows — the same driver budget the
candidate broadcast costs anyway, since a broadcast is a collect plus a
re-ship) and the candidate set + threshold become literals in the recount
plan, so nothing is persisted and the summary pass runs exactly once.

The two-phase shape only pays for itself when the full distinct-key
shuffle would actually hurt. For a table the parquet footers say is small
(≤ ``DIRECT_MAX_ROWS``), the direct plan — ONE scan: groupBy + a scalar
total over the (already tiny) grouped frame — is strictly cheaper than two
scans plus an Arrow crossing, and its shuffle is bounded by the row count
anyway. ``strategy="auto"`` (the default) makes that call from the footer
estimate, treating "unknown size" as "large" so the scale-safe plan is
the fallback, never the exception — the same size-gated plan switch the
k-NN top-k uses (operators/similarity.py).

NULL-key contract: NULL keys are ignored entirely — excluded from N and
never a heavy hitter (matching ``WHERE key IS NOT NULL`` + COUNT(key)
semantics). A column where NULL itself might be frequent needs an explicit
sentinel value before calling this.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

#: candidate sets up to this size recount via an InSet scan predicate
#: (pushed to parquet); larger ones via broadcast semi join
MAX_ISIN_CANDIDATES = 10_000

#: strategy="auto" runs the direct one-scan plan when the footer estimate
#: says the input has at most this many rows. The direct plan funnels the
#: GROUPED frame (≤ distinct keys ≤ rows) through a single-partition
#: window to derive N without a second base-table scan, so the gate is
#: sized to keep that buffer ~100 MB even in the worst all-keys-distinct
#: case. Above it (or when the size is unknowable: in-memory frames,
#: non-parquet sources) the Misra-Gries path runs.
DIRECT_MAX_ROWS = 4_000_000


def _mg_summaries(items: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: emits (item, np) rows where
    candidate rows carry (value, null) and one sentinel per partition
    carries (null, partition_row_count)."""
    from pyspark.sql.types import LongType, StructField, StructType

    item_type = items.schema[col].dataType
    schema = StructType([StructField(col, item_type),
                         StructField("_np", LongType())])

    def summarize(batches):
        import pandas as pd_
        acc: dict = {}
        n_rows = 0
        for b in batches:
            s = b[col].dropna()
            n_rows += len(s)  # NULL keys excluded from N (see module doc)
            for val, cnt in s.value_counts().items():
                acc[val] = acc.get(val, 0) + int(cnt)
            if len(acc) > m:
                # compact: subtract the (m+1)-th largest, keep positive —
                # the mergeable-summaries step (Agarwal et al.)
                cut = sorted(acc.values(), reverse=True)[m]
                acc = {k: v - cut for k, v in acc.items() if v > cut}
        out = pd_.DataFrame({col: list(acc.keys()),
                             "_np": [None] * len(acc)})
        sentinel = pd_.DataFrame({col: [None], "_np": [n_rows]})
        yield pd_.concat([out, sentinel], ignore_index=True)

    return items.select(col).mapInPandas(summarize, schema=schema)


def _heavy_hitters_direct(df: DataFrame, col: str,
                          threshold_frac: float) -> DataFrame:
    """One-scan exact plan for small inputs: group, then derive N as an
    unordered full-partition window sum over the GROUPED frame (≤
    distinct-key rows — never a second pass over the base table; a
    broadcast-scalar subtree would re-run the groupBy as a separate job,
    doubling the scan). No ORDER BY means no sort — just one bounded
    single-partition buffer, which the DIRECT_MAX_ROWS gate keeps small."""
    from pyspark.sql import Window

    g = (df.filter(F.col(col).isNotNull())
         .groupBy(col).agg(F.count(F.lit(1)).alias("cnt")))
    return (g.withColumn("_n", F.sum("cnt").over(Window.partitionBy()))
            .filter(F.col("cnt") > F.col("_n") * F.lit(threshold_frac))
            .select(col, "cnt",
                    (F.col("cnt") / F.col("_n")).alias("frac")))


def heavy_hitters(df: DataFrame, col: str, threshold_frac: float,
                  m: int | None = None,
                  strategy: str = "auto") -> DataFrame:
    """Exactly the items with count > ``threshold_frac`` × N (N = non-NULL
    row count of ``col``), as (col, cnt, frac) — without shuffling the full
    distinct-key space when the input is large. ``m`` defaults to
    ⌈1/threshold_frac⌉, the smallest summary satisfying the
    no-false-negative guarantee. ``strategy``: "auto" (footer-estimate
    gated), "direct" (one-scan groupBy), or "mg" (two-phase Misra-Gries);
    all three return identical results."""
    import math

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if strategy not in ("auto", "direct", "mg"):
        raise ValueError(f"unknown heavy_hitters strategy: {strategy!r}")
    if strategy == "auto":
        from flink_rag_spark.operators.util import estimated_scan_rows
        est = estimated_scan_rows(df)
        strategy = "direct" if (est is not None
                                and est <= DIRECT_MAX_ROWS) else "mg"
    if strategy == "direct":
        return _heavy_hitters_direct(df, col, threshold_frac)

    if m is None:
        m = int(math.ceil(1.0 / threshold_frac))
    # one bounded driver step: ≤ partitions × m candidates + one sentinel
    # per partition — the candidate set reaches the recount as a predicate
    # or broadcast either way, so materializing it here costs nothing
    # extra and lets the summary pass run once with no persist
    rows = _mg_summaries(df, col, m).collect()
    n_total = sum(r["_np"] for r in rows if r["_np"] is not None)
    cand_vals = sorted({r[col] for r in rows if r[col] is not None})
    spark = df.sparkSession
    if n_total == 0:  # all-NULL or empty input: no item can exceed 0·frac
        return spark.createDataFrame([], StructType(
            [StructField(col, df.schema[col].dataType),
             StructField("cnt", LongType()),
             StructField("frac", DoubleType())]))
    if len(cand_vals) <= MAX_ISIN_CANDIDATES:
        # small candidate sets become an InSet predicate: pure JVM, no
        # extra frame/exchange, and the In filter PUSHES DOWN to the
        # parquet scan — the recount reads only row groups that can
        # contain a candidate
        recount = df.filter(F.col(col).isin(cand_vals))
    else:
        # wide clusters (many partitions × m) would bloat the plan as
        # literals — fall back to a broadcast semi join
        cands = spark.createDataFrame(
            [(v,) for v in cand_vals],
            StructType([StructField(col, df.schema[col].dataType)]))
        recount = df.join(broadcast(cands), on=col, how="left_semi")
    return (recount
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > F.lit(float(n_total) * threshold_frac))
            .select(col, "cnt",
                    (F.col("cnt") / F.lit(float(n_total))).alias("frac")))


def cms_build(df: DataFrame, col: str, eps: float = 0.001,
              confidence: float = 0.99, seed: int = 42,
              group_col: str | None = None) -> DataFrame:
    """Count-min sketches of ``col`` as MERGEABLE binary partials — the
    point-frequency-estimation member of the sketch-aggregate family
    (HLL covers distinct counts, Misra-Gries covers top-k; CMS answers
    "how often does THIS item occur" in O(1/eps) space at any scale).

    One row per ``group_col`` value (or one total row): (group?, sketch
    binary, n). Spark's ``count_min_sketch`` aggregate computes the
    sketch with map-side partial merges — the shuffle carries
    O(groups × sketch_size), never the key space — and the binaries
    re-merge associatively (``cms_merge``), so stored per-partition/
    per-day sketches roll up exactly like the rollup family's HLL
    partials."""
    agg = [F.expr(f"count_min_sketch({col}, {eps}d, {confidence}d, "
                  f"{seed})").alias("cms"),
           F.count(F.col(col)).alias("n")]
    if group_col is not None:
        return df.groupBy(group_col).agg(*agg)
    return df.agg(*agg)


def _jvm_cms(spark: SparkSession, blob: bytes):
    bio = spark._jvm.java.io.ByteArrayInputStream(bytearray(blob))
    return spark._jvm.org.apache.spark.util.sketch.CountMinSketch \
        .readFrom(bio)


def cms_merge(spark: SparkSession, blobs: list[bytes]) -> "object":
    """Merge sketch binaries (same eps/confidence/seed) into one JVM
    CountMinSketch — associative and lossless, the property that makes
    stored partials maintainable."""
    if not blobs:
        raise ValueError("nothing to merge")
    base = _jvm_cms(spark, blobs[0])
    for b in blobs[1:]:
        base.mergeInPlace(_jvm_cms(spark, b))
    return base


def cms_estimate(spark: SparkSession, blobs: list[bytes],
                 items: list) -> dict:
    """Point-frequency estimates for ``items`` from (merged) sketch
    binaries. Guarantee: estimate ≥ true count always, and
    estimate ≤ true + eps·N with probability ≥ confidence (the
    contract tests/test_round7b_ops.py pins)."""
    sk = cms_merge(spark, blobs)
    return {it: sk.estimateCount(it) for it in items}
