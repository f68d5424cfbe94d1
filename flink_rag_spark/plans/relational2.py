"""Relational surface, batch 2: subquery shapes (EXISTS / IN / correlated
scalar), conditional aggregation, disjunctive predicates, pivot, grouping
sets, range join, and the batch forms of session/sliding windows.

Same oracle conventions as plans/relational.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from flink_rag_spark.plans.relational import DISC_PRICE, dec2, money_sum
from flink_rag_spark.sources.tables import load_table


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated non-equi condition →
    left-semi join (the pushdown-friendly plan Catalyst picks for EXISTS)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    sat = o.join(li, (F.col("l_orderkey") == F.col("o_orderkey"))
                 & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
    return sat.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter + dim joins + top-20."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cu, F.col("o_custkey") == F.col("c_custkey"))
            .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.col("c_custkey"))
            .limit(20))


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-WHEN conditional aggregation."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    hi = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_linestatus")
            .agg(F.sum(hi).alias("high_line_count"),
                 F.sum(1 - hi).alias("low_line_count")))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio (join strategy left to
    Catalyst/AQE — part scales with SF)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO",
                         F.expr(DISC_PRICE)).otherwise(F.lit(0).cast("decimal(30,4)")))
    total = F.sum(F.expr(DISC_PRICE))
    return j.agg(F.round(
        F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
    ).alias("promo_revenue_pct"))


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part avg) →
    aggregate once, join the per-part result back against the fact table
    (AQE picks broadcast when the aggregate is small enough)."""
    li = load_table(spark, sf_dir, "lineitem")
    avgq = (li.groupBy(F.col("l_partkey").alias("pk"))
            .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("aq")))
    return (li.join(avgq, F.col("l_partkey") == F.col("pk"))
            .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
            .agg((F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0))
                 .alias("avg_yearly")))


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a HAVING subquery → semi join on the
    aggregated keys."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
           .filter(F.col("sq") > 250).select("l_orderkey"))
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(big.withColumnRenamed("l_orderkey", "bk"),
                  F.col("o_orderkey") == F.col("bk"), "left_semi")
            .join(cu, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
            .agg(F.sum("l_quantity").alias("total_qty")))


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across the join."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 30))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 25)
           & F.col("l_quantity").between(10, 40))
    )
    return j.filter(cond).agg(
        F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global avg) + anti join."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (cu.filter(F.col("c_acctbal") > 0)
               .agg((F.sum(dec2("c_acctbal")).cast("double")
                     / F.count(F.lit(1))).alias("ab")))
    return (cu.crossJoin(broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab"))
            .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_cust"),
                 money_sum("c_acctbal").alias("total_bal")))


MKT_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def pivot_segment_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: customer counts, regions × market segments. Explicit pivot
    values keep the plan single-pass (no extra distinct scan)."""
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (cu.join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")))
    return (j.groupBy("r_name").pivot("c_mktsegment", MKT_SEGMENTS)
            .agg(F.count(F.lit(1)))
            .na.fill(0, MKT_SEGMENTS))


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — via spark.sql (same Catalyst path as the DataFrame
    API; the DataFrame API has no direct grouping-sets builder)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


def groupsets_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS expressing the region→nation rollup hierarchy
    (((r),(r,n),()) ≡ ROLLUP(r, n)) over the customer⋈nation⋈region join —
    one entry covers both the explicit-grouping-sets API and hierarchical
    rollup semantics (the df.rollup / df.cube builders live in
    rollup_region_nation / cube_status_priority)."""
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (cu.join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")))
    j.createOrReplaceTempView("cust_geo")
    return spark.sql("""
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(n_name, 'ALL') AS nation_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM cust_geo
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
    """)


PRICE_BANDS = [(0.0, 100000.0, "low"), (100000.0, 300000.0, "mid"),
               (300000.0, 500000.0, "high"), (500000.0, 1e18, "xhigh")]


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi band) join: orders into static price bands. The band
    table is broadcast → BroadcastNestedLoopJoin with 4 rows, i.e. a scan +
    predicate per row; no shuffle of orders."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "lo double, hi double, band string")
    return (o.join(broadcast(bands),
                   (F.col("o_totalprice") >= F.col("lo"))
                   & (F.col("o_totalprice") < F.col("hi")))
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 money_sum("o_totalprice").alias("total_price")))


def session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window over the batch events table (same operator the
    streaming path uses — proves Spark's session semantics against the SQL
    gaps-and-islands oracle)."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "5 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(dec2("value")).cast("double").alias("sum_value"))
            .select(F.col("session_window.start").alias("sess_start"),
                    F.col("session_window.end").alias("sess_end"),
                    "user_id", "n_events", "sum_value"))


def sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window (width 10 min, slide 5 min) in batch form."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    "event_type", "n_events"))


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct, verified against its accuracy
    contract. The sketch VALUE is engine-specific (DuckDB can't replicate
    Spark's HLL++ internals), so the query returns what an oracle CAN check
    exactly: the exact distinct count per group, and a boolean verdict that
    the sketch landed within 5× its configured 1% relative standard
    deviation. The oracle asserts the same counts and `TRUE` — a sketch
    drifting outside its contract hash-mismatches."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.01).alias("_approx"),
                 F.countDistinct("user_id").alias("exact_users"))
            .select("event_type", "exact_users",
                    (F.abs(F.col("_approx") - F.col("exact_users"))
                     / F.col("exact_users") <= 0.05).alias("within_bound")))


def word_count_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic: explode tokens → count → deterministic top-50."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.col("word"))
            .limit(50))


def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (the KLL/GK-style sketch surface) verified
    against their accuracy contract — the approx_distinct_users trick for
    quantiles. approx_percentile's value is sketch-internal, so the query
    outputs what an oracle CAN check exactly: the exact interpolated
    p50/p95 (both engines define percentile as linear interpolation over
    order statistics) and a boolean per quantile asserting the sketch's
    result sits within its configured rank-error budget (n/accuracy,
    checked by RANKING the sketch value against the real data in the same
    plan — rank error is the contract approx_percentile actually makes,
    unlike value error)."""
    acc = 1000  # rank error <= n/acc = 0.1% of rows
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.expr("percentile(o_totalprice, array(0.5, 0.95))").alias("ex"),
        F.expr(f"approx_percentile(o_totalprice, array(0.5, 0.95), {acc})")
         .alias("ap"),
        F.count(F.lit(1)).alias("n"))
    ranks = (o.crossJoin(F.broadcast(agg))
             .agg(F.first("ex").alias("ex"), F.first("n").alias("n"),
                  F.sum(F.when(F.col("o_totalprice") <= F.expr("ap[0]"), 1)
                        .otherwise(0)).alias("r50"),
                  F.sum(F.when(F.col("o_totalprice") <= F.expr("ap[1]"), 1)
                        .otherwise(0)).alias("r95")))
    tol = F.col("n") / acc + 1
    return ranks.select(
        F.round(F.expr("ex[0]"), 4).alias("p50_exact"),
        F.round(F.expr("ex[1]"), 4).alias("p95_exact"),
        F.col("n").cast("bigint").alias("n"),
        (F.abs(F.col("r50") - 0.5 * F.col("n")) <= tol).alias("p50_in_bound"),
        (F.abs(F.col("r95") - 0.95 * F.col("n")) <= tol).alias("p95_in_bound"))
