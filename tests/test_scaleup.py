"""Scale-up rehearsal tooling (sources/scaleup.py): k× replication must be
foreign-key consistent and read back through the normal loaders."""

import pyspark.sql.functions as F
import pytest

from flink_rag_spark.sources.scaleup import scale_up_tables
from flink_rag_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def scaled(spark, sf_smoke, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfx"))
    scale_up_tables(spark, sf_smoke, dst, k=3, files_per_table=2)
    return dst


def test_fact_tables_triple_dims_stay(spark, sf_smoke, scaled):
    for name in ("customer", "orders", "lineitem", "events",
                 "documents", "embeddings"):
        base = load_table(spark, sf_smoke, name, widen=False).count()
        assert load_table(spark, scaled, name, widen=False).count() == 3 * base
    for name in ("region", "nation"):
        base = load_table(spark, sf_smoke, name, widen=False).count()
        assert load_table(spark, scaled, name, widen=False).count() == base


def test_keys_unique_and_fks_resolve(spark, scaled):
    orders = load_table(spark, scaled, "orders", widen=False)
    cust = load_table(spark, scaled, "customer", widen=False)
    li = load_table(spark, scaled, "lineitem", widen=False)
    # primary keys stay unique across copies (shift by domain stride)
    assert orders.select("o_orderkey").distinct().count() == orders.count()
    assert cust.select("c_custkey").distinct().count() == cust.count()
    # every FK resolves (no dangling references introduced by shifting)
    dangling = (orders.join(cust, orders.o_custkey == cust.c_custkey,
                            "left_anti").count())
    assert dangling == 0
    assert li.join(orders, li.l_orderkey == orders.o_orderkey,
                   "left_anti").count() == 0


def test_doc_embedding_alignment_preserved(spark, sf_smoke, scaled):
    """vec_id shares the documents key domain, so the doc_id ↔ vec_id
    alignment hybrid/RAG queries rely on holds in every copy."""
    docs = load_table(spark, scaled, "documents", widen=False)
    emb = load_table(spark, scaled, "embeddings", widen=False)
    base_docs = load_table(spark, sf_smoke, "documents", widen=False)
    base_emb = load_table(spark, sf_smoke, "embeddings", widen=False)
    base_overlap = (base_docs.join(
        base_emb, base_docs.doc_id == base_emb.vec_id).count())
    overlap = docs.join(emb, docs.doc_id == emb.vec_id).count()
    assert overlap == 3 * base_overlap and overlap > 0


def test_headline_query_runs_on_scaled_dir(spark, scaled):
    from flink_rag_spark.plans.catalog import query_fns
    out = query_fns()["q1_pricing_summary"](spark, scaled)
    rows = out.collect()
    assert len(rows) > 0
