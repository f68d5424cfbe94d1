"""Z-order (Morton-curve) data layout — multi-column file skipping for
100 TB scans (the capability behind Delta's OPTIMIZE ZORDER BY; ABSENT in
the reference, which delegates storage layout to OpenSearch/Lucene).

Sorting a table by one column makes parquet row-group min/max stats
razor-sharp for THAT column and useless for every other; interleaving the
bits of several columns' rank spaces gives every participating column
partially-sorted runs, so predicates on ANY of them prune files. The key
is a pure Catalyst expression (shift/mask/or — whole-stage codegen, no
UDF), built over min/max-scaled column ranks from a one-row stats
aggregate broadcast onto the scan.

At scale the write is ``repartitionByRange(n_files, zkey)`` +
``sortWithinPartitions(zkey)``: range partitioning keeps curve-adjacent
rows in the same file (the locality that makes the stats tight), every
file sorts independently, and no global single-task sort exists.
``tests/test_round7b_ops.py`` measures the effect directly from parquet
footer stats: z-ordered files carry narrow min/max ranges on BOTH
dimensions, a linear sort only on its own.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: bits per dimension in the interleaved key (2 dims × 16 = 32-bit key;
#: 16 bits ≈ 65k rank buckets per column — far below double precision,
#: far above any realistic file count)
ZORDER_BITS = 16


def _scaled_rank(col: str, lo: str, hi: str, bits: int) -> F.Column:
    """Column value min/max-scaled to an integer rank in [0, 2^bits)."""
    span = F.col(hi).cast("double") - F.col(lo).cast("double")
    frac = F.when(span > 0,
                  (F.col(col).cast("double") - F.col(lo).cast("double"))
                  / span).otherwise(F.lit(0.0))
    return F.least(F.lit((1 << bits) - 1),
                   F.floor(frac * ((1 << bits) - 1)).cast("long"))


def with_zorder_key(df: DataFrame, cols: list[str],
                    bits: int = ZORDER_BITS,
                    out_col: str = "zkey") -> DataFrame:
    """Add the Morton-interleaved key over ``cols`` (2+ numeric columns).
    One stats aggregate (min/max per column, a single broadcast row) +
    one narrow projection; the bit interleave unrolls to shift/mask/or
    terms inside codegen."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least two columns")
    stats = df.agg(*[f for c in cols for f in
                     (F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}"))])
    ranked = df.crossJoin(F.broadcast(stats))
    ranks = [_scaled_rank(c, f"_lo_{c}", f"_hi_{c}", bits) for c in cols]
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)),
                            b * n + i))
    drop = [f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols]
    return ranked.withColumn(out_col, key).drop(*drop)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 32, bits: int = ZORDER_BITS) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    z-curve of ``cols``: range-partition by the key (curve locality →
    tight per-file stats), sort within each file, drop the key."""
    out = with_zorder_key(df, cols, bits)
    (out.repartitionByRange(n_files, F.col("zkey"))
     .sortWithinPartitions("zkey")
     .drop("zkey")
     .write.mode("overwrite").parquet(path))
