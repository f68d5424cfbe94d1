"""Relational surface, batch 3: interval join, extended window analytics,
decimal-exact statistics, percentiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_rag_spark.plans.relational import dec2
from flink_rag_spark.sources.tables import load_table


def interval_join_signup_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: for each signup, the same user's clicks within the next
    10 minutes. Equi-join on user_id carries the shuffle; the time-range
    predicate filters inside each hash bucket — never a cross join. (The
    streaming twin is a stream-stream join with watermarks on both sides.)"""
    e = load_table(spark, sf_dir, "events")
    s = (e.filter(F.col("event_type") == "signup")
         .select(F.col("event_id").alias("s_id"), F.col("user_id"),
                 F.col("ts").alias("s_ts")))
    c = (e.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                 F.col("value").alias("c_value")))
    j = s.join(c, (F.col("user_id") == F.col("c_user"))
               & (F.col("c_ts") >= F.col("s_ts"))
               & (F.col("c_ts") < F.col("s_ts") + F.expr("INTERVAL 10 MINUTES")),
               "left")
    return (j.groupBy("s_id", "user_id", "s_ts")
            .agg(F.count("c_ts").alias("n_clicks"),
                 F.sum(dec2("c_value")).cast("double").alias("click_value")))


def window_analytics_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/analytic/frame surface beyond row_number: dense_rank, ntile,
    percent_rank, first/last/nth value with explicit full frames, plus the
    running-total (ROWS UNBOUNDED PRECEDING) and lag shapes — one shuffle on
    the partition key covers every analytic column."""
    o = load_table(spark, sf_dir, "orders")
    keys = [F.col("o_orderdate"), F.col("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*keys)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.first("o_totalprice").over(wfull).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
        F.sum(dec2("o_totalprice")).over(wrun).cast("double")
            .alias("running_spend"),
        F.lag(dec2("o_totalprice"), 1).over(w).cast("double")
            .alias("prev_price"),
    )


def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates (customers vs suppliers per nation),
    with COALESCE over both null sides."""
    cu = (load_table(spark, sf_dir, "customer")
          .groupBy(F.col("c_nationkey").alias("nk"))
          .agg(F.count(F.lit(1)).alias("nc")))
    s = (load_table(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("snk"))
         .agg(F.count(F.lit(1)).alias("ns")))
    return (cu.join(s, F.col("nk") == F.col("snk"), "full_outer")
            .select(F.coalesce("nk", "snk").alias("nationkey"),
                    F.coalesce("nc", F.lit(0)).alias("n_customers"),
                    F.coalesce("ns", F.lit(0)).alias("n_suppliers")))


def global_sort_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global sort (no LIMIT): plans a range-partitioning exchange +
    per-partition sort — the scalable total order (sampled range bounds, no
    single-reducer bottleneck)."""
    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice", "o_orderdate")
            .orderBy(F.desc("o_totalprice"), F.col("o_orderkey")))


def from_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing via from_json (schema-on-read into a struct) —
    complements the path-extraction surface of json_events_props."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id",
        F.col("p.k").cast("bigint").alias("k"),
        F.length("props").cast("bigint").alias("props_len"),
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of the same dimension (supplier nation vs
    customer nation — nation joined twice under different aliases), a
    symmetric pair predicate, and year extraction. Both nation sides are
    constant-size → broadcast."""
    from pyspark.sql.functions import broadcast
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    from flink_rag_spark.plans.relational import DISC_PRICE
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cu, F.col("o_custkey") == F.col("c_custkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
            .join(broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("bigint").alias("l_year"))
            .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year revenue share of one supplier nation within
    a customer region — conditional decimal sum over a 7-table join, ratio
    in double."""
    from pyspark.sql.functions import broadcast

    from flink_rag_spark.plans.relational import DISC_PRICE
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    cu = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.expr(DISC_PRICE)
    target = F.when(F.col("supp_nation") == "NATION_3", vol) \
              .otherwise(F.lit(0).cast("decimal(30,4)"))
    return (li.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cu, F.col("o_custkey") == F.col("c_custkey"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
            .join(broadcast(r), F.col("cr_key") == F.col("r_regionkey"))
            .join(broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
            .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(F.round(F.sum(target).cast("double")
                         / F.sum(vol).cast("double"), 6).alias("mkt_share"),
                 F.count(F.lit(1)).alias("n_lines")))


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + double aggregation (orders per
    customer, then customers per order-count) — the histogram pattern."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (cu.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


def rollup_hourly_from_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading time rollup (the continuous-aggregate / hypertable pattern):
    hourly aggregates computed FROM the 5-minute partials, not from raw rows.

    At scale the fine level is a materialized table maintained by streaming
    ingestion, and every coarser resolution reuses it — each cascade step
    processes windows-per-period rows instead of events-per-period. Sums
    stay DECIMAL through the cascade, so the result is bit-identical to
    aggregating raw events directly (which is what the oracle does)."""
    e = load_table(spark, sf_dir, "events")
    m5 = (e.groupBy(F.window("ts", "5 minutes"))
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum(dec2("value")).alias("sv")))
    return (m5.groupBy(F.window(F.col("window.start"), "1 hour"))
            .agg(F.sum("n").alias("n_events"),
                 F.sum("sv").cast("double").alias("sum_value"))
            .select(F.col("window.start").alias("hour_start"),
                    F.col("window.end").alias("hour_end"),
                    "n_events", "sum_value"))


def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface: JSON → typed map, key/value access, sorted key
    list."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
    )


def json_map_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing + map-function surface in one entry: from_json
    into map<string,bigint>, sorted key list, map size, typed value access,
    and the raw-length column of the schema-on-read path — merges the
    from_json_events / map_funcs_events builders into one graded query."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.length("props").cast("bigint").alias("props_len"),
    )


def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF surface: a grouped-aggregate pandas UDF (Arrow-batched,
    partial-aggregation-free — Spark ships each group's column slice to
    Python). Geometric mean of order prices per status."""
    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))

    o = load_table(spark, sf_dir, "orders")
    # a grouped-agg pandas UDF cannot mix with JVM aggregates in one agg();
    # compute each and join on the (tiny) group key
    gm = (o.groupBy("o_orderstatus")
          .agg(F.round(geomean("o_totalprice"), 2).alias("geomean_price")))
    counts = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_orders"))
    return gm.join(counts, on="o_orderstatus")


def stats_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics with cross-engine-exact arithmetic: variance/stddev from
    DECIMAL sums (sum and sum-of-squares are exact integers in disguise, so
    the only float ops are the final divisions — identical in both engines),
    plus interpolated median (Spark percentile ≡ DuckDB quantile_cont),
    COUNT DISTINCT (Catalyst's two-phase distinct-agg expansion), exact money
    sum, and timestamp min/max — the full aggregation surface in one entry."""
    o = load_table(spark, sf_dir, "orders")
    sum_d = F.sum(dec2("o_totalprice")).cast("double")
    sumsq_d = F.sum(F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * "
        "CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4))")).cast("double")
    n = F.count(F.lit(1))
    var = (sumsq_d - sum_d * sum_d / n) / (n - F.lit(1))
    return (o.groupBy("o_orderstatus").agg(
        n.alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        sum_d.alias("total_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.round(var, 4).alias("var_price"),
        F.round(F.sqrt(var), 6).alias("stddev_price"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    ))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table predicate aggregate — the canonical
    test that range filters reach the scan (PushedFilters) and the agg is
    one partial/final HashAggregate pair with no shuffle beyond it."""
    l = load_table(spark, sf_dir, "lineitem")
    rev = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
           "CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))")
    return (l.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.sum(F.expr(rev)).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines")))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar-subquery max + equality
    join back (the 'argmax via self-aggregation' pattern). The one-row max
    side broadcasts; revenue is decimal-exact so the equality is exact."""
    from pyspark.sql.functions import broadcast as _bc
    from flink_rag_spark.plans.relational import DISC_PRICE
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (l.filter((F.col("l_shipdate") >= "1997-01-01")
                    & (F.col("l_shipdate") < "1997-04-01"))
           .groupBy("l_suppkey")
           .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (s.join(rev, s.s_suppkey == rev.l_suppkey)
            .join(_bc(mx), F.col("total_rev") == F.col("mx"))
            .select("s_suppkey", "s_name", "total_rev"))


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the EXISTS + NOT-EXISTS self-join pair (the
    synthetic lineitem has no receipt/commit dates, so 'kept the order
    waiting' = this supplier's line shipped LAST in a multi-supplier 'F'
    order): a left_semi self-join proves another supplier exists on the
    order, a left_anti self-join proves nobody shipped later. Both
    self-joins are equi-keyed on l_orderkey (one shuffle key), nation
    broadcasts."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    l1 = l.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l1")
    l2 = l.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = l.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    waited = (l1
              .join(o.select("o_orderkey"),
                    F.col("l1.l_orderkey") == F.col("o_orderkey"), "left_semi")
              .join(l2, (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
                    & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
                    "left_semi")
              .join(l3, (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
                    & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
                    & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
                    "left_anti"))
    return (waited.join(s, F.col("l1.l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name", "s_name")
            .agg(F.countDistinct(F.col("l1.l_orderkey")).alias("numwait")))


def _derived_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp substitute shared by the Q2/Q9/Q11/Q20 shapes (the
    synthetic schema has no partsupp): supply facts derived from observed
    lineitem — supplycost = min unit price (raw double: identical IEEE
    divisions and min on both engines), availqty = exact-decimal sum of
    shipped quantity (float-fold-order-proof). One shuffle on
    (partkey, suppkey) with map-side partial agg."""
    l = load_table(spark, sf_dir, "lineitem")
    return (l.groupBy(F.col("l_partkey").alias("ps_partkey"),
                      F.col("l_suppkey").alias("ps_suppkey"))
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("ps_supplycost"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("ps_availqty")))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each EUROPE-supplied part of a given size/type,
    the supplier(s) offering the minimum supply cost (the correlated-min
    subquery, expressed as a per-part window min — one extra shuffle keyed
    the same as the join, so AQE coalesces). Supplier/nation/region dims
    broadcast; ties (equal min cost) keep all suppliers, as in the spec."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 35, 45)
        & (F.col("p_type") == "LARGE"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    costs = (_derived_supply(spark, sf_dir)
             .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey")))
    w = Window.partitionBy("ps_partkey")
    return (costs.withColumn("min_cost", F.min("ps_supplycost").over(w))
            .filter(F.col("ps_supplycost") == F.col("min_cost"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                    "ps_supplycost"))


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per nation per year over parts whose name
    contains 'gear', with supply cost from the derived partsupp. The
    part filter broadcasts; the lineitem↔derived-supply join shuffles on
    (partkey, suppkey) once — both sides already aggregate/scan to that
    key.

    Profit is computed in exact integer micro-dollars (price and discount
    are cent-aligned, quantity is integral, and the derived cost floors to
    whole cents), so the SUM is bit-exact on any engine in any fold order
    — double→decimal cast ties, which Spark and DuckDB break differently,
    never arise."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    cost = (l.groupBy(F.col("l_partkey").alias("ps_partkey"),
                      F.col("l_suppkey").alias("ps_suppkey"))
            .agg(F.min(F.floor(F.col("l_extendedprice") * 100
                               / F.col("l_quantity")).cast("bigint"))
                 .alias("cost_cents")))
    profit_micro = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        * F.round((1 - F.col("l_discount")) * 100, 0).cast("bigint")
        - F.col("cost_cents")
        * F.round(F.col("l_quantity"), 0).cast("bigint") * 100)
    return (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(cost, (F.col("l_partkey") == F.col("ps_partkey"))
                  & (F.col("l_suppkey") == F.col("ps_suppkey")))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("l_shipdate").cast("bigint").alias("o_year"))
            .agg((F.sum(profit_micro).cast("double") / 10000.0)
                 .alias("sum_profit")))


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value held by one nation's
    suppliers, kept only when above a fraction of that nation's total —
    the global-total scalar subquery expressed as a broadcast cross join
    of a one-row aggregate (no driver collect, stays declarative)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7")
    sup = (s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey"))
    vals = (_derived_supply(spark, sf_dir)
            .join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
            .withColumn("val", (F.col("ps_supplycost")
                                * F.col("ps_availqty")).cast("decimal(18,2)")))
    grouped = vals.groupBy("ps_partkey").agg(F.sum("val").alias("value_dec"))
    total = vals.agg(F.sum("val").alias("total_dec"))
    return (grouped.join(F.broadcast(total))
            .filter(F.col("value_dec").cast("double")
                    > F.col("total_dec").cast("double") * 0.001)
            .select("ps_partkey",
                    F.col("value_dec").cast("double").alias("value")))


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of 'red' parts whose derived availability
    exceeds half of what they shipped from 1998 on, restricted to one
    nation — the nested IN/scalar-subquery chain as semi joins + an inner
    join against the recent-shipment aggregate (inner ≡ the spec's NULL
    scalar-subquery exclusion when a pair has no recent shipments)."""
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem")
    recent = (l.filter(F.year("l_shipdate") >= 1998)
              .groupBy(F.col("l_partkey").alias("r_partkey"),
                       F.col("l_suppkey").alias("r_suppkey"))
              .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                   .cast("double").alias("recent_qty")))
    cand = (_derived_supply(spark, sf_dir)
            .join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"),
                  "left_semi")
            .join(recent, (F.col("ps_partkey") == F.col("r_partkey"))
                  & (F.col("ps_suppkey") == F.col("r_suppkey")))
            .filter(F.col("ps_availqty") > 0.5 * F.col("recent_qty"))
            .select("ps_suppkey"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3")
    return (s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
            .select("s_name", "s_acctbal"))


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp replaced by the distinct part↔supplier
    pairs observed in lineitem — the synthetic schema has no partsupp):
    negated filters + distinct-count of suppliers per part descriptor."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    return (p.filter((F.col("p_brand") != "Brand#45")
                     & (~F.col("p_type").startswith("MEDIUM"))
                     & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49)))
            .join(pairs, F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


def gapfill_hourly_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (hypertable `time_bucket_gapfill` + `locf` +
    `interpolate` surface; the reference has no event time at all,
    AiJob.java:38): hourly purchase-value series per user, dense grid over
    each user's observed span, gaps filled by last-observation-carried-
    forward AND linear interpolation (operators/timeseries.py — grid via
    sequence+explode, fill via two ignore-nulls window frames in one
    per-key sort; no Python, one shuffle).

    The observed value is an exact decimal mean (decimal sum / count) so
    Spark and DuckDB agree bit-for-bit before rounding."""
    from flink_rag_spark.operators.timeseries import gapfill_locf_interp
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    obs = (e.groupBy("user_id", F.window("ts", "1 hour"))
           .agg(F.round(F.sum(dec2("value")).cast("double")
                        / F.count(F.lit(1)), 4).alias("obs_value"))
           .select("user_id", F.col("window.start").alias("bucket"),
                   "obs_value"))
    return gapfill_locf_interp(obs, ["user_id"], "bucket", "obs_value",
                               step="1 hour")


def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-item surface: users contributing > 1/128 of all events.
    strategy="auto" (operators/frequency.py) picks the plan from the
    parquet-footer row estimate: a one-scan groupBy + scalar-total filter
    at test scales, or per-partition Misra-Gries summaries + an exact
    recount of the bounded candidate set when the table is large/unknown
    (the shuffle then carries ≤ partitions × 128 keys instead of the full
    distinct-user space). Both plans are exact, so the oracle is the plain
    GROUP BY / HAVING form. 1/128 is a negative power of two — exactly
    representable, so the threshold comparison is bit-identical across
    engines."""
    from flink_rag_spark.operators.frequency import heavy_hitters
    # widen=False: the plan is scan-bound (group-count, no compute-heavy
    # narrow stage), so the single-row-group widening exchange would be
    # pure overhead here
    e = load_table(spark, sf_dir, "events", widen=False)
    return heavy_hitters(e, "user_id", threshold_frac=1.0 / 128)


def rollup_incremental_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate surface (operators/rollup.py), oracle-checked:
    events are split at the last calendar day present — history builds the
    materialized hourly rollup, the final day appends as the 'nightly
    batch' touching only its own pday partitions (dynamic partition
    overwrite). The oracle is a plain GROUP BY over ALL events: equality
    proves the partial-merge maintenance is exact (decimal sums are
    associative), i.e. the incremental view loses nothing vs recomputing
    history every run."""
    import tempfile

    from flink_rag_spark.operators.rollup import (
        append_to_rollup,
        build_rollup,
        read_rollup,
    )
    e = load_table(spark, sf_dir, "events", widen=False)
    cutoff = e.agg(F.date_trunc("day", F.max("ts")).alias("c")) \
        .collect()[0]["c"]
    path = tempfile.mkdtemp(prefix="spark_rollup_") + "/hourly"
    build_rollup(spark, e.filter(F.col("ts") < F.lit(cutoff)), path,
                 keys=["user_id"])
    append_to_rollup(spark, e.filter(F.col("ts") >= F.lit(cutoff)), path,
                     keys=["user_id"])
    return read_rollup(spark, path, keys=["user_id"])


def rollup_hll_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counts as a CONTINUOUS aggregate: the incrementally-
    maintained rollup stores an HLL sketch partial per bucket
    (operators/rollup.py distinct_col) — the mergeable form of
    COUNT(DISTINCT user_id), which a stored exact count could never be
    (distinct doesn't merge; sketches union). History builds, the last
    day appends, and the estimate is read from the maintained store.

    Oracle contract (the approx_distinct_users pattern): the estimate is
    engine-specific, so the query emits what the oracle CAN check — the
    exact per-bucket distinct count recomputed from raw events, and a
    boolean that the maintained sketch landed within 5% of it."""
    import tempfile

    from flink_rag_spark.operators.rollup import (
        append_to_rollup,
        build_rollup,
        read_rollup,
    )
    e = load_table(spark, sf_dir, "events", widen=False)
    cutoff = e.agg(F.date_trunc("day", F.max("ts")).alias("c")) \
        .collect()[0]["c"]
    path = tempfile.mkdtemp(prefix="spark_rollup_hll_") + "/hourly"
    build_rollup(spark, e.filter(F.col("ts") < F.lit(cutoff)), path,
                 distinct_col="user_id")
    append_to_rollup(spark, e.filter(F.col("ts") >= F.lit(cutoff)), path,
                     distinct_col="user_id")
    r = read_rollup(spark, path).select("bucket_ts", "cnt",
                                        "approx_distinct")
    exact = (e.groupBy(F.window("ts", "1 hour")["start"]
                       .alias("bucket_ts"))
             .agg(F.countDistinct("user_id").alias("exact_users")))
    return (r.join(exact, on="bucket_ts")
            .select("bucket_ts", "cnt", "exact_users",
                    F.when(F.col("exact_users") == 0,
                           F.col("approx_distinct") == 0)
                    .otherwise(
                        F.abs(F.col("approx_distinct")
                              - F.col("exact_users"))
                        / F.col("exact_users") <= 0.05)
                    .alias("within_bound")))


def time_weighted_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted daily average of event values per user
    (operators/timeseries.py:time_weighted_avg): LOCF weighting by the
    seconds until the next sample, last sample held to the day edge —
    the irregular-sampling statistic a plain AVG gets wrong. event_id
    breaks equal-timestamp ties so the per-row weights (and thus the
    decimal-exact weighted sum) are engine-deterministic."""
    from flink_rag_spark.operators.timeseries import time_weighted_avg
    e = load_table(spark, sf_dir, "events", widen=False)
    return time_weighted_avg(e.filter(F.col("user_id").isNotNull()),
                             "ts", "value", keys=["user_id"],
                             bucket="1 day", order_tiebreak="event_id")


def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cascade over the incrementally-maintained rollup: build the
    hourly store (history + appended last day, as rollup_incremental_
    hourly), then serve DAILY per-user aggregates from the stored hourly
    partials alone — the oracle recomputes from raw events, so equality
    proves the cascade loses nothing while reading O(rollup) instead of
    O(events)."""
    import tempfile

    from flink_rag_spark.operators.rollup import (
        append_to_rollup,
        build_rollup,
        rollup_cascade,
    )
    e = load_table(spark, sf_dir, "events", widen=False)
    cutoff = e.agg(F.date_trunc("day", F.max("ts")).alias("c")) \
        .collect()[0]["c"]
    path = tempfile.mkdtemp(prefix="spark_rollup_") + "/hourly"
    build_rollup(spark, e.filter(F.col("ts") < F.lit(cutoff)), path,
                 keys=["user_id"])
    append_to_rollup(spark, e.filter(F.col("ts") >= F.lit(cutoff)), path,
                     keys=["user_id"])
    return rollup_cascade(spark, path, "1 day", keys=["user_id"])


def binned_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-discretization surface (profiling.quantile_bins):
    equal-frequency decile binning of order prices — exact
    percentile_cont boundaries broadcast onto one assignment scan,
    strict-> tie-breaking; the approx_percentile variant is the same
    plan at 100 TB."""
    from flink_rag_spark.operators.profiling import quantile_bins
    o = load_table(spark, sf_dir, "orders")
    return (quantile_bins(o, "o_totalprice", n_bins=10)
            .select("o_orderkey", "bin"))


def skew_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (profiling.key_skew_profile) over the
    orders→customer key: top-20 hot customers with per-key share and
    skew ratio plus whole-distribution Gini — the pre-shuffle check
    that decides whether a 100 TB join needs salting or AQE skew
    handling. One full-data pass; everything else runs on the reduced
    per-key count frame."""
    from flink_rag_spark.operators.profiling import key_skew_profile
    o = load_table(spark, sf_dir, "orders")
    return (key_skew_profile(o, "o_custkey", top_n=20)
            .orderBy("rank"))


def winsorized_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-stats surface (profiling.winsorized_stats): per-priority
    order prices clipped at the in-group [p1, p99] with mean/stddev
    before and after — percentile boundaries broadcast onto one
    clip-and-aggregate scan."""
    from flink_rag_spark.operators.profiling import winsorized_stats
    o = load_table(spark, sf_dir, "orders")
    return (winsorized_stats(o, "o_totalprice", "o_orderpriority")
            .orderBy("o_orderpriority"))
