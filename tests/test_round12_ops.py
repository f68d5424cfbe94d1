"""Round-12 operator tests: ADVICE hardening (weight validation,
weighted-LPA parallel-edge semantics, sql_str_lit non-finite floats)
plus the round's new operator families."""

import duckdb
import pytest


# ------------------------------------------------------ ADVICE fixes


def test_weight_validation_rejects_bad_weights(spark):
    """Non-positive or NULL weights would silently corrupt every rank
    (out_deg = 0 is non-NULL, so pr·w/out_deg → Infinity) — the guard
    fails loudly up front instead."""
    from flink_rag_spark.operators.graph import (
        community_labels, pagerank, personalized_pagerank,
        weighted_shortest_paths)
    zero = spark.createDataFrame([(1, 2, 3), (2, 3, 0)],
                                 "src bigint, dst bigint, w bigint")
    neg = spark.createDataFrame([(1, 2, 3), (2, 3, -1)],
                                "src bigint, dst bigint, w bigint")
    nul = spark.createDataFrame([(1, 2, 3), (2, 3, None)],
                                "src bigint, dst bigint, w bigint")
    for bad in (zero, neg, nul):
        with pytest.raises(ValueError):
            pagerank(bad, iters=1, weight="w")
        with pytest.raises(ValueError):
            personalized_pagerank(bad, [1], iters=1, weight="w")
        with pytest.raises(ValueError):
            community_labels(bad, id_a="src", id_b="dst", iters=1,
                             weight="w")
    # min-plus tolerates zero-weight edges but not negative ones
    z = zero.toDF("u", "v", "w")
    out = {r["node"]: r["dist"]
           for r in weighted_shortest_paths(z, [1], 2).collect()}
    assert out[3] == 3.0        # through the zero-weight edge
    with pytest.raises(ValueError):
        weighted_shortest_paths(neg.toDF("u", "v", "w"), [1], 2)
    with pytest.raises(ValueError):
        weighted_shortest_paths(nul.toDF("u", "v", "w"), [1], 2)


def test_weighted_lpa_parallel_edges_combine(spark):
    """Parallel (and reversed-duplicate) weighted edges pre-aggregate
    to ONE undirected edge with the summed weight — a duplicate with a
    differing weight must not double-vote or vote asymmetrically."""
    from flink_rag_spark.operators.graph import (community_labels,
                                                 community_labels_duck)
    # same graph expressed with parallel + reversed-duplicate edges …
    dup = spark.createDataFrame(
        [(1, 2, 3), (1, 2, 5), (2, 1, 2), (2, 3, 4)],
        "u bigint, v bigint, w bigint")
    # … and pre-aggregated (1-2 strength 10, 2-3 strength 4)
    flat = spark.createDataFrame([(1, 2, 10), (2, 3, 4)],
                                 "u bigint, v bigint, w bigint")
    got_dup = {r["node"]: r["label"] for r in community_labels(
        dup, id_a="u", id_b="v", iters=2, weight="w").collect()}
    got_flat = {r["node"]: r["label"] for r in community_labels(
        flat, id_a="u", id_b="v", iters=2, weight="w").collect()}
    assert got_dup == got_flat
    # the duck mirror replays the SAME pre-aggregation
    con = duckdb.connect()
    con.register("dupe", dup.toPandas())
    du = con.execute(community_labels_duck(
        "SELECT u, v, w FROM dupe", iters=2, weighted=True)).fetchdf()
    assert {(int(r.node), int(r.label))
            for r in du.itertuples()} == set(got_dup.items())


def test_sql_str_lit_rejects_non_finite():
    from flink_rag_spark.operators.util import sql_str_lit
    assert sql_str_lit(1.5) == "1.5"
    assert sql_str_lit(True) == "TRUE"
    assert sql_str_lit("o'hara") == "'o''hara'"
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError):
            sql_str_lit(bad)
