"""The correctness gate, run locally: every catalog query with an oracle must
match DuckDB at sf0.01 exactly (rows, columns, canonical values)."""

import pytest

from flink_rag_spark.plans.catalog import QUERIES
from tests.oracle_check import compare

WITH_ORACLE = [q for q in QUERIES if q.oracle is not None]


@pytest.mark.parametrize("qdef", WITH_ORACLE, ids=[q.name for q in WITH_ORACLE])
def test_oracle_parity(spark, sf_oracle, qdef):
    df = qdef.fn(spark, sf_oracle)
    res = compare(df, qdef.oracle, sf_oracle)
    assert res["rows_match"], res
    assert res["cols_match"], res
    assert res["values_match"], {k: v for k, v in res.items() if k != "values_match"}


def test_catalog_integrity():
    names = [q.name for q in QUERIES]
    assert len(names) == len(set(names)), "duplicate query names"
    from flink_rag_spark.plans.catalog import oracle_sqls, query_fns
    assert set(oracle_sqls()) <= set(query_fns())
    # the driver grades the first 50 catalog entries; the catalog is sized
    # to that window so EVERY query gets a CORRECTNESS row
    assert len(QUERIES) == 50


def test_doc_counts_in_sync():
    """README's advertised counts must be generated facts, not prose."""
    import os
    from flink_rag_spark.plans.catalog import oracle_sqls
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(repo, "README.md")).read()
    assert f"{len(QUERIES)} graded queries" in readme
    assert f"{len(oracle_sqls())} with" in readme


def test_rows_only_queries_run(spark, sf_oracle):
    for q in QUERIES:
        if q.oracle is None:
            assert q.fn(spark, sf_oracle).count() >= 0, q.name
