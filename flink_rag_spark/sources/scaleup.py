"""Synthetic scale-up of the testdata for capacity rehearsal.

The driver ships sf ≤ 0.1; the engine targets 100 TB. The gap is bridged
two ways: plan audits (does the shape survive 100×?) and this module —
a FOREIGN-KEY-CONSISTENT k× replication of a scale dir, so the bench can
actually RUN the headline queries at ~k× the rows and record per-query
scaling factors (a super-linear factor flags a plan that won't survive
the next 100×; see bench.py's scale-rehearsal section).

Replication scheme: every copy i shifts each key column by i × stride of
its KEY DOMAIN (stride = max(key)+1 of the domain's base table), so
orders.o_custkey keeps pointing at a customer row of the SAME copy and
join fan-outs stay realistic instead of multiplying k× per join.
region/nation are schema-constant dimensions and are copied unshifted —
exactly how a real corpus grows (facts multiply, enums don't). Attribute
columns (dates, texts, vectors) repeat verbatim: value distributions per
key stay identical to the source, which is what the timing rehearsal
needs. (Replicated texts/vectors DO mean every near-dup bucket gains k
members — deliberately adversarial for the dedup family's hot-bucket
guards.)

This is bench/test tooling over DRIVER data, not an input generator:
queries still read the driver's parquet in graded runs (TESTDATA.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.sources.tables import TABLE_NAMES, load_table

#: key column → (domain base table, domain key column); stride per domain
#: is max(key)+1 so shifted copies never collide
_DOMAINS = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
}

#: table → {column: domain}. embeddings.vec_id shares the documents domain
#: so the doc_id ↔ vec_id alignment the hybrid/RAG queries rely on is
#: preserved in every copy.
_SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "documents"},
}


def _strides(spark: SparkSession, src_dir: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for dom, (table, key) in _DOMAINS.items():
        mx = (load_table(spark, src_dir, table, widen=False)
              .agg(F.max(key)).collect()[0][0])
        out[dom] = int(mx) + 1
    return out


def _shifted_copy(df: DataFrame, shifts: dict[str, str],
                  strides: dict[str, int], i: int) -> DataFrame:
    cols = [
        (F.col(c) + F.lit(i * strides[shifts[c]])).alias(c)
        if c in shifts else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def scale_up_tables(spark: SparkSession, src_dir: str, dst_dir: str,
                    k: int = 10, files_per_table: int = 8) -> None:
    """Write a k× FK-consistent replication of every testdata table from
    ``src_dir`` into ``dst_dir`` (same ``<table>.parquet`` layout, so
    ``load_table``/``bench.py`` read it like any other scale dir).
    ``files_per_table`` keeps the scans multi-file — a one-file table pins
    its scan to one task and would make every rehearsal number a
    single-core artifact."""
    strides = _strides(spark, src_dir)
    for name in TABLE_NAMES:
        df = load_table(spark, src_dir, name, widen=False)
        shifts = _SHIFTS.get(name)
        if shifts is None:  # region/nation: schema-constant dimensions
            out = df
        else:
            copies = [_shifted_copy(df, shifts, strides, i)
                      for i in range(k)]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        (out.repartition(files_per_table)
         .write.mode("overwrite").parquet(f"{dst_dir}/{name}.parquet"))
