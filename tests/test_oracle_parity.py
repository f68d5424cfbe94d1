"""The correctness gate, run locally: every catalog query with an oracle must
match DuckDB at sf0.01 exactly (rows, columns, canonical values)."""

import pytest

from flink_rag_spark.plans.catalog import QUERIES
from tests.oracle_check import compare

WITH_ORACLE = [q for q in QUERIES if q.oracle is not None]

# Two-tier split (r15 verdict item 1): the driver's default run keeps
# oracle parity + plan lint for every GRADED query (the 50 driver
# CORRECTNESS rows); the non-graded sweep tail is @slow — same tests,
# same rigor, run via `pytest -m slow` before shipping operator changes.
from flink_rag_spark.plans.catalog import GRADED_QUERIES  # noqa: E402

_GRADED_NAMES = {q.name for q in GRADED_QUERIES}
_PARAMS = [
    q if q.name in _GRADED_NAMES
    else pytest.param(q, marks=pytest.mark.slow)
    for q in WITH_ORACLE
]


def _plan_lint(df, name: str) -> None:
    """Engine-wide physical-plan invariants, enforced on EVERY swept
    query: no CartesianProduct (a cross join that isn't broadcast-nested-
    loop means a small side was missed and the plan dies at scale) and no
    BatchEvalPython (a row-at-a-time Python UDF in place of an
    Arrow-batched one — the 10-100× slow path)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, \
        f"{name}: CartesianProduct in physical plan"
    # BatchEvalPythonUDTF is exempt: Spark has no Arrow execution for
    # Python UDTFs, so that node IS the UDTF surface (udtf_token_positions)
    assert not re.search(r"BatchEvalPython(?!UDTF)", plan), \
        f"{name}: row-at-a-time Python UDF in physical plan"


@pytest.mark.parametrize("qdef", _PARAMS, ids=[q.name for q in WITH_ORACLE])
def test_oracle_parity(spark, sf_oracle, qdef):
    from flink_rag_spark.operators.util import unpersist_cached_deps

    df = qdef.fn(spark, sf_oracle)
    _plan_lint(df, qdef.name)
    res = compare(df, qdef.oracle, sf_oracle)
    unpersist_cached_deps(df)
    assert res["rows_match"], res
    assert res["cols_match"], res
    assert res["values_match"], {k: v for k, v in res.items() if k != "values_match"}


def test_catalog_integrity():
    names = [q.name for q in QUERIES]
    assert len(names) == len(set(names)), "duplicate query names"
    from flink_rag_spark.plans.catalog import (
        GRADED_QUERIES,
        GRADED_WINDOW,
        oracle_sqls,
        query_fns,
    )
    assert set(oracle_sqls()) <= set(query_fns())
    # the driver grades the first GRADED_WINDOW queries() entries; the
    # graded view must fill that window exactly, while the catalog itself
    # is free to grow (catalog_extra.py)
    assert len(GRADED_QUERIES) == GRADED_WINDOW
    assert [q.name for q in QUERIES[:GRADED_WINDOW]] == \
           [q.name for q in GRADED_QUERIES]
    assert len(QUERIES) >= GRADED_WINDOW


def test_doc_counts_in_sync():
    """README's advertised counts must be generated facts, not prose."""
    import os
    from flink_rag_spark.plans.catalog import GRADED_QUERIES, oracle_sqls
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(repo, "README.md")).read()
    assert f"{len(QUERIES)} catalog queries" in readme
    assert f"{len(GRADED_QUERIES)} graded" in readme
    assert f"{len(oracle_sqls())} with" in readme


def test_rows_only_queries_run(spark, sf_oracle):
    for q in QUERIES:
        if q.oracle is None:
            df = q.fn(spark, sf_oracle)
            _plan_lint(df, q.name)
            assert df.count() >= 0, q.name
