"""Relational operator surface (SURVEY.md §2.2 — everything marked ABSENT in
the reference, required by the driver's generalized harness).

Conventions that keep the DuckDB oracle value-hash stable (SURVEY.md §7.3):

- Monetary doubles in the testdata are 2-decimal values; summing doubles is
  order-dependent, so every SUM over money goes through DECIMAL casts (exact
  integer arithmetic) and is cast to DOUBLE only at the end. Averages divide
  that exact sum by the count in double — identical in both engines.
- Derived integer columns are cast to BIGINT on both sides (Spark's year()/
  size()/levenshtein() return 32-bit, DuckDB's return 64-bit).
- Transcendental results (sqrt/ln/similarity) are ROUND()ed to 6 dp.
- Every ORDER BY ... LIMIT has a deterministic tie-break key.

Each builder returns a DataFrame given (spark, sf_dir); the matching oracle
SQL lives in plans/catalog.py next to the registration.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from flink_rag_spark.sources.tables import load_table


# --- shared decimal-exact helpers (Spark side) ---

def dec2(c: str) -> F.Column:
    return F.expr(f"CAST({c} AS DECIMAL(18,2))")


def money_sum(c: str) -> F.Column:
    """Exact sum of a 2-decimal money column, surfaced as DOUBLE."""
    return F.sum(dec2(c)).cast("double")


DISC_PRICE = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
              "CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))")
CHARGE = (f"CAST(CAST({DISC_PRICE} AS DECIMAL(18,4)) * "
          "CAST(1 + l_tax AS DECIMAL(18,2)) AS DECIMAL(30,6))")


# --- queries ---

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filter + hash aggregate. Catalyst plans a
    partial HashAggregate before the single shuffle on the 6-value group key;
    the date filter is pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity")).alias("sum_qty"),   # integral doubles: exact
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.expr(DISC_PRICE)).cast("double").alias("sum_disc_price"),
            F.sum(F.expr(CHARGE)).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec2("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(dec2("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered join chain + agg + top-k.
    Broadcast-vs-SMJ for customer is left to Catalyst/AQE statistics —
    customer GROWS with SF, so a forced broadcast() hint would be wrong at
    cluster scale; LIMIT plans as TakeOrderedAndProject."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1998-06-01").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cut)
        .join(o.filter(F.col("o_orderdate") < cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu.filter(F.col("c_mktsegment") == "BUILDING"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with the local-supplier condition
    (c_nationkey = s_nationkey). nation/region (constant 25/5 rows) carry
    explicit broadcast hints; customer/supplier scale with SF, so their join
    strategy is left to Catalyst/AQE (they still broadcast at test SF via
    the size threshold). lineitem is never shuffled before the final small
    groupBy on n_name."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(F.expr(DISC_PRICE)).cast("double").alias("revenue"))
    )


def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one order > 400k (EXISTS)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return (cu.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .select("c_custkey", "c_name", "c_mktsegment"))


def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all (NOT EXISTS)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (cu.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .select("c_custkey", "c_name", "c_acctbal"))


def agg_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with COUNT DISTINCT (Catalyst expands to two-phase
    distinct agg) + exact money sum + timestamp min/max."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        money_sum("o_totalprice").alias("total_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    ))


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy with customer facts."""
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (cu.join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
              .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")))
    return (joined.rollup("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 money_sum("c_acctbal").alias("sum_acctbal"))
            .select(F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
                    F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
                    "n_customers", "sum_acctbal"))


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two independent dimensions of orders."""
    o = load_table(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 money_sum("o_totalprice").alias("total_price"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                    "n_orders", "total_price"))


def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window — one shuffle on the partition key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey"))
    return (o.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.col("rk").cast("bigint").alias("rk")))


def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: running total + lag over each customer's order history.
    Explicit ROWS frame (DuckDB's default with ORDER BY is RANGE)."""
    o = load_table(spark, sf_dir, "orders")
    order_keys = [F.col("o_orderdate"), F.col("o_orderkey")]
    w = (Window.partitionBy("o_custkey").orderBy(*order_keys)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wl = Window.partitionBy("o_custkey").orderBy(*order_keys)
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.lag(dec2("o_totalprice"), 1).over(wl).cast("double").alias("prev_price"),
        F.row_number().over(wl).cast("bigint").alias("order_seq"),
    )


def setops_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT over customer vs supplier nations."""
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")).distinct()
    both = cu.intersect(s).withColumn("tag", F.lit("both"))
    c_only = cu.exceptAll(s).withColumn("tag", F.lit("customer_only"))
    s_only = s.exceptAll(cu).withColumn("tag", F.lit("supplier_only"))
    return both.unionByName(c_only).unionByName(s_only)


def string_part_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: lower/substring/concat_ws/regexp/levenshtein."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#13")).cast("bigint").alias("lev_to_13"),
    )


def date_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: truncation, extraction, grouping by month."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 money_sum("o_totalprice").alias("total_price"))
            .select(
                "month",
                F.year("month").cast("bigint").alias("yr"),
                F.month("month").cast("bigint").alias("mo"),
                "n_orders", "total_price"))


def math_lineitem_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function surface; transcendentals rounded to 6 dp for the oracle.
    The terminal ORDER BY (no LIMIT) is the global-sort surface: Spark plans
    a range-partitioning exchange (sampled bounds) + per-partition sort — a
    scalable total order with no single-reducer bottleneck (asserted in
    tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
    ).orderBy("l_orderkey", "l_linenumber")


def json_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props + aggregate by extracted key."""
    e = load_table(spark, sf_dir, "events")
    return (e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(dec2("value")).cast("double").alias("sum_value")))


def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window (batch form of the streaming op —
    identical semantics to the Structured Streaming version over the same
    window() expression)."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(dec2("value")).cast("double").alias("sum_value"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    "event_type", "n_events", "sum_value"))


def asof_error_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ABSENT in reference & core Spark — composed from an
    equi-join on the entity key + range predicate + ranking window, SURVEY.md
    §2.2 'Range / as-of'): for each error event, the same user's most recent
    purchase at or before it. The join is equi on user_id, so it hashes by
    user — no cross join; skewed users would be salted at scale."""
    e = load_table(spark, sf_dir, "events")
    err = (e.filter(F.col("event_type") == "error")
           .select("event_id", "user_id", "ts"))
    pur = (e.filter(F.col("event_type") == "purchase")
           .select(F.col("user_id").alias("p_user_id"),
                   F.col("event_id").alias("p_event_id"),
                   F.col("ts").alias("p_ts"),
                   F.col("value").alias("p_value")))
    j = err.join(pur, (F.col("user_id") == F.col("p_user_id"))
                 & (F.col("p_ts") <= F.col("ts")), "left")
    w = Window.partitionBy("event_id").orderBy(
        F.desc_nulls_last("p_ts"), F.desc_nulls_last("p_event_id"))
    return (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_id", "user_id", "ts", "p_ts", "p_value"))
