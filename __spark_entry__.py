"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``flink_rag_spark`` package; the catalog in
``flink_rag_spark/plans/catalog.py`` is the single source of truth for the
query ↔ oracle pairing.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the driver's CWD
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full batch RAG path —
    embed questions (deterministic provider) → exact cosine top-10 retrieval
    → context assembly → prompt → chat (SURVEY.md §7.1 M1)."""
    from flink_rag_spark.plans.rag import rag_answer
    return rag_answer(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    This is the GRADED window (catalog.GRADED_QUERIES — the driver records
    a CORRECTNESS row for the first 50 entries). The full catalog is larger;
    the non-graded tail (plans/catalog_extra.py) is value-checked against
    DuckDB by pytest's full-catalog sweep instead."""
    from flink_rag_spark.plans.catalog import query_fns
    return query_fns(graded_only=True)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible graded query."""
    from flink_rag_spark.plans.catalog import oracle_sqls
    return oracle_sqls(graded_only=True)
