"""Analytics surface, round 8e: per-group OLS trends, SCD Type-2
history, two-sample KS testing, exponential time decay, categorical
association. Each builder pairs with a DuckDB oracle assembled from the
operator's ``*_duck`` twin (plans/catalog_extra.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_rag_spark.operators.association import categorical_association
from flink_rag_spark.operators.hypothesis import ks_two_sample_split
from flink_rag_spark.operators.regression import group_ols
from flink_rag_spark.operators.scd import scd2_history
from flink_rag_spark.operators.timeseries import (
    time_decayed_at_latest,
    time_decayed_stats,
)
from flink_rag_spark.sources.tables import load_table

#: fixed reference instant for decayed aggregates (just past the events
#: table's horizon) — a parameter, never wall-clock, so runs reproduce
DECAY_REF_TS = "2024-01-31 00:00:00"
DECAY_HALF_LIFE_DAYS = 7.0


def _orders_with_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → customer → nation → region, dimensions broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
            .select("c_custkey", "n_name", "r_name"))
    # customer is data-scale: equi-join on the key (AQE picks broadcast
    # when a filtered dim side turns out small), never a forced broadcast
    return o.join(dims, o.o_custkey == F.col("c_custkey"))


_ORDERS_REGION_SQL = """
SELECT o.*, n.n_name, r.r_name
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def trend_nation_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend of order value over time
    (operators/regression.py): y = o_totalprice, x = days since epoch.
    The REGR_SLOPE/REGR_R2 aggregate family from exact sums — one
    partial+final aggregate after the broadcast dimension join."""
    df = _orders_with_region(spark, sf_dir)
    x = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    return group_ols(df, ["n_name"], x, "o_totalprice")


def scd2_customer_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 fold of each customer's order-status change log
    (operators/scd.py): consecutive equal-status runs become versioned
    validity intervals — the warehouse dimension-history shape. One
    shuffle on the customer key shared by every window."""
    o = load_table(spark, sf_dir, "orders")
    return scd2_history(o, key="o_custkey", ts_col="o_orderdate",
                        attr_col="o_orderstatus", tiebreak="o_orderkey")


#: time-travel instant for the SCD2 snapshot demo — mid-history, so
#: some entities resolve to an old version and late-starting ones are
#: absent entirely
SCD2_AS_OF = "1995-06-01 00:00:00"


def customer_status_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension read (operators/scd.py as_of_snapshot):
    each customer's order-status version valid AT the snapshot instant
    under the half-open interval contract — the time-travel query an
    SCD2 store exists to answer. One filtered scan over the history."""
    from flink_rag_spark.operators.scd import as_of_snapshot
    hist = scd2_customer_status_history(spark, sf_dir)
    return as_of_snapshot(hist, SCD2_AS_OF)


def ks_order_price_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test (operators/hypothesis.py):
    are EUROPE and ASIA order-price distributions the same? Distributed
    ECDF — ONE scan tags both samples, distinct-value collapse,
    range-partitioned prefix sums, one final aggregate."""
    j = _orders_with_region(spark, sf_dir)
    return ks_two_sample_split(j, "o_totalprice",
                               F.col("r_name") == "EUROPE",
                               F.col("r_name") == "ASIA")


def decayed_user_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed per-user activity
    (operators/timeseries.py time_decayed_stats): recency-weighted value
    sums with a 7-day half-life measured back from the snapshot
    watermark — the freshness-boost primitive. One aggregate; weights
    are scan-side scalar expressions."""
    e = load_table(spark, sf_dir, "events")
    return time_decayed_stats(e, ["user_id"], "ts", "value",
                              ref_ts=DECAY_REF_TS,
                              half_life_days=DECAY_HALF_LIFE_DAYS)


def association_segment_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association grid (operators/association.py): market
    segment × region contingency table with expected counts, PMI and
    chi-square terms — the label-independence audit. The corpus
    collapses to |segments|·|regions| cells in one aggregate."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey))
    return categorical_association(j, "c_mktsegment", "r_name")


#: restrict the co-purchase graph demo to recent orders — the operator is
#: general; the query keeps the edge set presentation-sized (the 2001
#: window is ~105k edges / 20k parts at sf0.1 — avg degree ~10, a real
#: graph without benching a 650k-edge wedge join every round)
TRIANGLE_SINCE = "2001-01-01"
K_ANON_K = 10


def part_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient
    (operators/graph.py triangle_counts) over the part co-purchase
    graph (parts sharing a recent order). Degree-oriented wedge
    enumeration — each wedge generated once at its smallest vertex,
    hub fan-out bounded O(√m)."""
    from flink_rag_spark.operators.graph import triangle_counts
    # the shared builder emits DISTINCT pairs; triangle_counts
    # canonicalizes+dedups internally anyway (_canon_edges), so the
    # result is identical and the edge definition lives in ONE place
    return triangle_counts(_copurchase_pairs(spark, sf_dir), "u", "v")


_TRIANGLE_EDGES_SQL = f"""
SELECT l1.l_partkey AS u, l2.l_partkey AS v
FROM lineitem l1
JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                AND l1.l_partkey < l2.l_partkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderdate >= DATE '{TRIANGLE_SINCE}'
"""


#: the PPR oracle's symmetric DIRECTED edge relation — UNION dedups,
#: matching the Spark side's distinct-pairs-both-directions frame; the
#: heavy lineitem self-join materializes ONCE via a nested CTE (the
#: e0raw pattern the sibling graph mirrors use), not once per branch
_PPR_EDGES_SQL = (f"WITH raw AS MATERIALIZED ({_TRIANGLE_EDGES_SQL}) "
                  f"SELECT u AS src, v AS dst FROM raw "
                  f"UNION SELECT v, u FROM raw")


def _copurchase_pairs(spark: SparkSession, sf_dir: str):
    """The shared part co-purchase edge list (parts sharing a recent
    order, u < v) — feeds triangles AND community labels."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = (li.join(o.filter(F.col("o_orderdate") >= TRIANGLE_SINCE)
                    .select("o_orderkey"),
                    li.l_orderkey == F.col("o_orderkey"))
            .select("l_orderkey", "l_partkey"))
    a = keys.select(F.col("l_orderkey").alias("k"),
                    F.col("l_partkey").alias("u"))
    b = keys.select(F.col("l_orderkey").alias("k"),
                    F.col("l_partkey").alias("v"))
    return (a.join(b, "k").filter(F.col("u") < F.col("v"))
            .select("u", "v").distinct())


def _copurchase_weighted(spark: SparkSession, sf_dir: str):
    """(u, v, w): the co-purchase graph with its natural edge WEIGHT —
    the number of sharing (order, lineitem-pair) combinations, the
    co-occurrence strength the unweighted ops discard (r10 verdict
    item 6). Integer counts keep every strength sum exact."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = (li.join(o.filter(F.col("o_orderdate") >= TRIANGLE_SINCE)
                    .select("o_orderkey"),
                    li.l_orderkey == F.col("o_orderkey"))
            .select("l_orderkey", "l_partkey"))
    a = keys.select(F.col("l_orderkey").alias("k"),
                    F.col("l_partkey").alias("u"))
    b = keys.select(F.col("l_orderkey").alias("k"),
                    F.col("l_partkey").alias("v"))
    return (a.join(b, "k").filter(F.col("u") < F.col("v"))
            .groupBy("u", "v").agg(F.count(F.lit(1)).alias("w")))


#: the weighted mirrors' shared (u, v, w) edge relation
_WEDGES_SQL = (f"WITH raw0 AS MATERIALIZED ({_TRIANGLE_EDGES_SQL}) "
               f"SELECT u, v, COUNT(*) AS w FROM raw0 GROUP BY 1, 2")
#: symmetric directed weighted edges for the pagerank mirror
_WPR_EDGES_SQL = (f"WITH raw0 AS MATERIALIZED ({_TRIANGLE_EDGES_SQL}), "
                  f"wed AS MATERIALIZED (SELECT u, v, COUNT(*) AS w "
                  f"FROM raw0 GROUP BY 1, 2) "
                  f"SELECT u AS src, v AS dst, w FROM wed "
                  f"UNION ALL SELECT v, u, w FROM wed")
#: inverse-strength distances for the min-plus mirror (strongly
#: co-purchased = close); CAST keeps both engines in DOUBLE
_WSP_EDGES_SQL = (f"WITH raw0 AS MATERIALIZED ({_TRIANGLE_EDGES_SQL}), "
                  f"wed AS MATERIALIZED (SELECT u, v, COUNT(*) AS w "
                  f"FROM raw0 GROUP BY 1, 2) "
                  f"SELECT u, v, CAST(1.0 AS DOUBLE) / w AS w FROM wed "
                  f"UNION ALL "
                  f"SELECT v, u, CAST(1.0 AS DOUBLE) / w FROM wed")

WPR_ITERS = 4
WSP_ROUNDS = 3


def part_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-weighted PageRank (operators/graph.py pagerank with
    weight=): rank flows in proportion to co-purchase strength
    (pr·w/Σw) instead of splitting uniformly — the weighted random
    surfer over the part graph. Integer weights keep strength sums
    exact; the oracle unrolls all four iterations."""
    from flink_rag_spark.operators.graph import pagerank
    wed = _copurchase_weighted(spark, sf_dir)
    edges = (wed.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                        "w")
             .unionByName(wed.select(F.col("v").alias("src"),
                                     F.col("u").alias("dst"), "w")))
    return pagerank(edges, iters=WPR_ITERS, weight="w")


def part_ppr_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-weighted personalized PageRank (graph.personalized_pagerank
    weight=): seed-relevance where rank flows in proportion to
    co-purchase strength — the weighted twin of part_ppr_relevance on
    the same seeds."""
    from flink_rag_spark.operators.graph import personalized_pagerank
    wed = _copurchase_weighted(spark, sf_dir)
    edges = (wed.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                        "w")
             .unionByName(wed.select(F.col("v").alias("src"),
                                     F.col("u").alias("dst"), "w")))
    return personalized_pagerank(edges, BFS_SOURCES, iters=WPR_ITERS,
                                 weight="w")


def part_communities_weighted(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Edge-weighted label propagation (graph.community_labels
    weight=): neighbor votes sum co-purchase strengths instead of
    counting edges — a 40-order tie pulls 40× harder; integer weights
    keep the (votes DESC, label ASC) argmax order exact."""
    from flink_rag_spark.operators.graph import community_labels
    return community_labels(_copurchase_weighted(spark, sf_dir),
                            id_a="u", id_b="v", weight="w")


def part_weighted_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round weighted shortest paths (operators/graph.py
    weighted_shortest_paths — min-plus BFS): cheapest ≤3-edge path from
    the seed parts under inverse co-purchase strength, so strongly
    co-bought parts read as CLOSE — the weighted complement of
    part_bfs_hops' hop counts. Oracle unrolls the relaxation rounds."""
    from flink_rag_spark.operators.graph import weighted_shortest_paths
    wed = _copurchase_weighted(spark, sf_dir).withColumn(
        "iw", F.lit(1.0) / F.col("w"))
    edges = (wed.select(F.col("u").alias("a"), F.col("v").alias("b"),
                        F.col("iw"))
             .unionByName(wed.select(F.col("v").alias("a"),
                                     F.col("u").alias("b"), F.col("iw"))))
    return weighted_shortest_paths(edges, BFS_SOURCES, WSP_ROUNDS,
                                   src="a", dst="b", weight="iw")


#: pinned histogram bounds (order totals at any SF live inside them) —
#: pinning makes the fleet-wide binning reproducible AND lets the
#: oracle replay without the 1-row min/max aggregate
HIST_BINS, HIST_LO, HIST_HI = 25, 0.0, 500_000.0
#: correlation demo columns (quantized DECIMAL terms — exact sums)
CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
#: basket rules: pairs must co-occur in at least this many orders
RULES_MIN_PAIR = 3


def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (operators/profiling.py) of order totals:
    25 pinned-width bins, every bin present including empties. One
    scan-side bin expression + one ≤25-row aggregate."""
    from flink_rag_spark.operators.profiling import equiwidth_histogram
    o = load_table(spark, sf_dir, "orders")
    return equiwidth_histogram(o, "o_totalprice", n_bins=HIST_BINS,
                               lo=HIST_LO, hi=HIST_HI)


def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (operators/regression.py corr_matrix)
    over lineitem numerics from EXACT decimal-quantized sums — one
    aggregate pass, bit-stable under any partitioning (the group_ols
    discipline, vs built-in corr's drifting float moments)."""
    from flink_rag_spark.operators.regression import corr_matrix
    li = load_table(spark, sf_dir, "lineitem")
    return corr_matrix(li, CORR_COLS)


def basket_pair_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (operators/association.py
    itemset_pair_rules): support / confidence / lift for part pairs
    co-occurring in ≥3 orders — the depth-2 Apriori slice over the
    co-purchase baskets."""
    from flink_rag_spark.operators.association import itemset_pair_rules
    li = load_table(spark, sf_dir, "lineitem")
    return itemset_pair_rules(li, "l_orderkey", "l_partkey",
                              min_pair_count=RULES_MIN_PAIR)


SESSION_GAP_S = 1800  # 30-minute inactivity gap


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit per-event sessionization folded to session summaries
    (operators/sequences.py sessionize/session_stats): 30-minute
    inactivity gap, 1-based session ids per user, start/end/count/
    duration per session. One exchange, gaps-and-islands."""
    from flink_rag_spark.operators.sequences import session_stats
    e = load_table(spark, sf_dir, "events")
    return session_stats(e, SESSION_GAP_S)


#: every FK edge of the TPC-H-ish schema the driver ships
FK_RELATIONS = [
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
    ("events_customer", "events", "user_id", "customer", "c_custkey"),
]


def fk_audit_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (operators/validation.py
    fk_integrity_audit) across every FK edge of the schema: orphan and
    NULL-key counts per relationship — the cross-table load gate."""
    from flink_rag_spark.operators.validation import fk_integrity_audit
    rels = [(name, load_table(spark, sf_dir, ft), fk,
             load_table(spark, sf_dir, dt), dk)
            for name, ft, fk, dt, dk in FK_RELATIONS]
    return fk_integrity_audit(rels)


#: the negated funnel the graded query runs: view → click → purchase
#: with NO error event strictly between the click and the purchase
NEG_FUNNEL_STEPS = ["view", "click", "purchase"]
NEG_FUNNEL_GAPS = {2: "error"}


def negated_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP absence pattern (operators/sequences.py negated_funnel_times
    — FlinkCEP ``notFollowedBy``): per-user earliest view → click →
    purchase completion, voided when an error lands strictly between
    the click and the purchase; the earliest offending error instant is
    reported per user. One exchange — the anti layer rides the funnel's
    window sort."""
    from flink_rag_spark.operators.sequences import negated_funnel_times
    e = load_table(spark, sf_dir, "events")
    return negated_funnel_times(e, NEG_FUNNEL_STEPS, NEG_FUNNEL_GAPS)


#: the until pattern the swept query runs: a view, then THREE clicks
#: with no error interleaving the click loop, then a purchase
UNTIL_STEPS = ["view", ("click", 3), "purchase"]
UNTIL_STOPS = {2: "error"}


#: the optional() pattern the swept query runs: a view, an OPTIONAL
#: click, then a purchase — the click is reported when one landed
#: before the completing purchase, skipped otherwise
OPTIONAL_STEPS = ["view", "click", "purchase"]
OPTIONAL_IDX = [2]


def optional_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlinkCEP ``optional()`` steps (operators/sequences.py
    optional_funnel_times — the last pattern-construct straggler,
    desugared as include/exclude variant layers over the funnel
    family's single exchange): per-user earliest view → [click] →
    purchase where the click may be skipped; the reported match is the
    earliest-completing variant, ties preferring the one that includes
    the click. Mirrors FlinkCEP Pattern.optional()
    (reference runs FlinkCEP 1.18; cf. RAG.java's pipeline frame)."""
    from flink_rag_spark.operators.sequences import optional_funnel_times
    e = load_table(spark, sf_dir, "events")
    return optional_funnel_times(e, OPTIONAL_STEPS, OPTIONAL_IDX)


def group_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlinkCEP pattern GROUPS (operators/sequences.py
    group_funnel_times — ``Pattern.begin(Pattern)`` composition):
    per-user earliest signup → [(view → click) × 2] → purchase where
    the doubled view→click subsequence is OPTIONAL as a unit —
    a repeated group AND an optional group in one pattern, the two
    group modifiers FlinkCEP composes. Mirrors the engine family the
    reference ships (FlinkCEP 1.18)."""
    from flink_rag_spark.operators.sequences import (Group,
                                                     group_funnel_times)
    e = load_table(spark, sf_dir, "events")
    return group_funnel_times(
        e, ["signup", Group(["view", "click"], times=2, optional=True),
            "purchase"])


#: greedy() fixture — view, then a greedy click loop (1+ reps absorbing
#: every click before the completing purchase), then purchase; the
#: reported t2 is the run's LAST click and `absorbed` its length
GREEDY_STEPS = ["view", "click", "purchase"]
GREEDY_IDX = 2


def greedy_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlinkCEP ``greedy()`` loop modifier (operators/sequences.py
    greedy_funnel_times — the LAST Pattern.java loop construct beside
    the covered quantifier / until / consecutive surface): per-user
    earliest view → greedy click+ → purchase. Completion instants are
    the reluctant chain's (disjoint step conditions); the loop claims
    every click strictly between the view and the completing purchase,
    so t2 reports the run's last click and ``absorbed`` its length.
    Mirrors FlinkCEP Pattern.greedy() (the reference runs FlinkCEP
    1.18; cf. RAG.java's pipeline frame)."""
    from flink_rag_spark.operators.sequences import greedy_funnel_times
    e = load_table(spark, sf_dir, "events")
    return greedy_funnel_times(e, GREEDY_STEPS, GREEDY_IDX)


def until_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlinkCEP ``until`` on a looping step (operators/sequences.py
    until_funnel_times — the last uncovered pattern construct,
    expressed as composition: quantifier expansion + per-internal-gap
    absence layers): per-user earliest view → 3×click → purchase where
    no error interleaves the click loop; the earliest offending error
    instant is reported. Still one funnel-family exchange."""
    from flink_rag_spark.operators.sequences import until_funnel_times
    e = load_table(spark, sf_dir, "events")
    return until_funnel_times(e, UNTIL_STEPS, UNTIL_STOPS)


def hourly_value_anomalies(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Seasonal baseline anomalies (operators/anomaly.py
    seasonal_baseline_outliers): event values unusual FOR THEIR HOUR OF
    DAY — a 3am spike judged against the 3am baseline, the seasonal
    complement of the per-user MAD outliers. Exact decimal phase
    moments, one 24-row aggregate + a broadcast join."""
    from flink_rag_spark.operators.anomaly import (
        seasonal_baseline_outliers)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value")
    return seasonal_baseline_outliers(e, "ts", "value", phase="hour")


def user_value_ses_forecast(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Per-user simple-exponential-smoothing forecast
    (operators/timeseries.py ses_forecast — Brown 1956, the level-only
    Holt-Winters member) of the next event value: the closed-form
    weighted sum over each user's (ts, event_id)-ordered value series,
    one window + one aggregate, no iteration. The forecasting
    complement of the decay family's 'how much weight remains'
    aggregates."""
    from flink_rag_spark.operators.timeseries import ses_forecast
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    return ses_forecast(e, ["user_id"], "ts", "value", "event_id")


def user_value_holt_forecast(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Per-user Holt linear-trend forecast (operators/timeseries.py
    holt_forecast — Holt 1957, the level+trend extension of the SES
    member): next-event value as level + trend, both recurrences
    closed-formed into one window + one broadcast decimal-weight join +
    one aggregate (the SES exactness discipline, two weight vectors)."""
    from flink_rag_spark.operators.timeseries import holt_forecast
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    return holt_forecast(e, ["user_id"], "ts", "value", "event_id")


#: survival demo: time from first signup to the first SUBSEQUENT
#: purchase, right-censored at the pinned corpus horizon (the testdata
#: generator's month end) — censored users count in the at-risk sets up
#: to the horizon instead of being miscounted as never-converting
KM_HORIZON = "2024-02-01 00:00:00"


def signup_purchase_survival(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curves (operators/survival.py km_survival
    — Kaplan & Meier 1958) per signup-week cohort: S(t) = P(still not
    purchased t µs after signup), with users lacking a post-signup
    purchase right-censored at the horizon. Exact integer-µs durations
    (the sessionize discipline); one aggregate + three windows on one
    cohort partitioning."""
    from flink_rag_spark.operators.survival import km_survival
    e = load_table(spark, sf_dir, "events")
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    p = (s.join(e.filter(F.col("event_type") == "purchase")
                .select("user_id", F.col("ts").alias("p_ts")),
                "user_id")
         .filter(F.col("p_ts") > F.col("s_ts"))
         .groupBy("user_id").agg(F.min("p_ts").alias("p_ts")))
    subj = (s.join(p, "user_id", "left")
            .select(F.date_trunc("week", F.col("s_ts")).alias("cohort"),
                    F.expr("timestampdiff(MICROSECOND, s_ts, "
                           f"coalesce(p_ts, TIMESTAMP '{KM_HORIZON}'))")
                    .alias("duration_us"),
                    F.col("p_ts").isNotNull().cast("int")
                    .alias("event")))
    return km_survival(subj, "duration_us", "event", ["cohort"])


_KM_SUBJECTS_SQL = f"""
WITH sgn AS (SELECT user_id, MIN(ts) AS s_ts FROM events
             WHERE event_type = 'signup' GROUP BY 1),
pur AS (SELECT sgn.user_id, MIN(e.ts) AS p_ts
        FROM sgn JOIN events e ON e.user_id = sgn.user_id
         AND e.event_type = 'purchase' AND e.ts > sgn.s_ts GROUP BY 1)
SELECT date_trunc('week', sgn.s_ts) AS cohort,
       date_diff('microsecond', sgn.s_ts,
                 COALESCE(pur.p_ts, TIMESTAMP '{KM_HORIZON}'))
         AS duration_us,
       CASE WHEN pur.p_ts IS NOT NULL THEN 1 ELSE 0 END AS event
FROM sgn LEFT JOIN pur USING (user_id)
"""

#: the log-rank comparison's two cohorts: early-month vs late-month
#: first signups, same durations/censoring as the KM curve
_LOGRANK_SUBJECTS_SQL = f"""
WITH sgn AS (SELECT user_id, MIN(ts) AS s_ts FROM events
             WHERE event_type = 'signup' GROUP BY 1),
pur AS (SELECT sgn.user_id, MIN(e.ts) AS p_ts
        FROM sgn JOIN events e ON e.user_id = sgn.user_id
         AND e.event_type = 'purchase' AND e.ts > sgn.s_ts GROUP BY 1)
SELECT CASE WHEN day(sgn.s_ts) <= 15 THEN 'early' ELSE 'late' END
         AS grp,
       date_diff('microsecond', sgn.s_ts,
                 COALESCE(pur.p_ts, TIMESTAMP '{KM_HORIZON}'))
         AS duration_us,
       CASE WHEN pur.p_ts IS NOT NULL THEN 1 ELSE 0 END AS event
FROM sgn LEFT JOIN pur USING (user_id)
"""


def signup_purchase_logrank(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Two-cohort log-rank test (operators/hypothesis.py logrank_test —
    Mantel 1966): do early-month signups convert to purchase on a
    different survival curve than late-month signups? Same subject
    frame as the KM query, one grouped aggregate + one step-frame
    window pass + a 1-row verdict (exact integer risk sets, 9-dp
    decimal term sums)."""
    from flink_rag_spark.operators.hypothesis import logrank_test
    e = load_table(spark, sf_dir, "events")
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    p = (s.join(e.filter(F.col("event_type") == "purchase")
                .select("user_id", F.col("ts").alias("p_ts")),
                "user_id")
         .filter(F.col("p_ts") > F.col("s_ts"))
         .groupBy("user_id").agg(F.min("p_ts").alias("p_ts")))
    subj = (s.join(p, "user_id", "left")
            .select(F.when(F.dayofmonth("s_ts") <= 15, "early")
                    .otherwise("late").alias("grp"),
                    F.expr("timestampdiff(MICROSECOND, s_ts, "
                           f"coalesce(p_ts, TIMESTAMP '{KM_HORIZON}'))")
                    .alias("duration_us"),
                    F.col("p_ts").isNotNull().cast("int")
                    .alias("event")))
    return logrank_test(subj, "duration_us", "event", "grp",
                        "early", "late")


#: the strict-contiguity pattern the graded query runs: a view whose
#: IMMEDIATELY next event is a click (FlinkCEP ``next``), whose own
#: immediately-next event is NOT an error (``notNext``), then
#: eventually a purchase (``followedBy``)
STRICT_FUNNEL_STEPS = ["view", "click", "purchase"]
STRICT_FUNNEL_CONTIG = ["next", "followedBy"]
STRICT_FUNNEL_NOT_NEXT = {2: "error"}


def strict_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-contiguity CEP (operators/sequences.py
    strict_funnel_times — FlinkCEP ``next``/``notNext``): per-user
    earliest view→click→purchase chain where the click is the view's
    immediately following event, the click's immediate successor is not
    an error, and the purchase follows anywhere later. Per-anchor
    lead-adjacency block matching (earliest anchor is NOT always
    extendable under strict gaps) on the funnel family's single
    exchange."""
    from flink_rag_spark.operators.sequences import strict_funnel_times
    e = load_table(spark, sf_dir, "events")
    return strict_funnel_times(e, STRICT_FUNNEL_STEPS,
                               STRICT_FUNNEL_CONTIG,
                               STRICT_FUNNEL_NOT_NEXT)


#: the consecutive() pattern the swept query runs: a view, then TWO
#: back-to-back clicks (strictly contiguous events — any intervening
#: event of any type breaks the run), then eventually a purchase
CONSEC_STEPS = ["view", ("click", 2), "purchase"]
CONSEC_LOOPS = {2}


def consecutive_funnel_users(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """FlinkCEP ``times(n).consecutive()`` — strict contiguity INSIDE a
    looping step (operators/sequences.py consecutive_funnel_times, pure
    composition: quantifier expansion feeding the strict engine's
    per-anchor block matching): per-user earliest view → 2 back-to-back
    clicks → purchase. One funnel-family exchange."""
    from flink_rag_spark.operators.sequences import (
        consecutive_funnel_times)
    e = load_table(spark, sf_dir, "events")
    return consecutive_funnel_times(e, CONSEC_STEPS, CONSEC_LOOPS)


#: the all-matches pattern the graded query runs: EVERY completed
#: view → click → purchase chain (one row per completing view EVENT —
#: FlinkCEP's default AfterMatchSkipStrategy.noSkip()), and its
#: non-overlapping twin consumes matched events (skipPastLastEvent),
#: at most 5 matches per user (the bounded-rounds contract)
ALL_MATCHES_STEPS = ["view", "click", "purchase"]
CONSUMED_MAX_MATCHES = 5


def all_funnel_matches_users(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """All-matches CEP emission (operators/sequences.py
    all_funnel_matches — FlinkCEP AfterMatchSkipStrategy.noSkip(), the
    engine default): every completed view→click→purchase match per
    user, one row per completing view event with its greedy earliest
    continuation, where funnel_times min-collapses to one row per user.
    Backward struct-chain window layers on the funnel family's single
    exchange."""
    from flink_rag_spark.operators.sequences import all_funnel_matches
    e = load_table(spark, sf_dir, "events")
    return all_funnel_matches(e, ALL_MATCHES_STEPS)


def consumed_funnel_matches_users(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Non-overlapping CEP matches (operators/sequences.py
    consumed_funnel_matches — FlinkCEP
    AfterMatchSkipStrategy.skipPastLastEvent()): greedy leftmost
    view→click→purchase matches per user where each match CONSUMES its
    events — the next match starts strictly after the previous match's
    purchase; at most 5 matches per user (bounded rounds, oracle
    unrolled)."""
    from flink_rag_spark.operators.sequences import (
        consumed_funnel_matches)
    e = load_table(spark, sf_dir, "events")
    return consumed_funnel_matches(e, ALL_MATCHES_STEPS,
                                   CONSUMED_MAX_MATCHES)


#: skipToFirst/skipToLast pattern: the quantified click step is where
#: first (its 1st repetition) and last (its 2nd) genuinely differ
SKIP_TO_STEPS = ["view", ("click", 2), "purchase"]
SKIP_TO_STEP = 2
SKIP_TO_MAX_MATCHES = 4


def skip_to_first_funnel_users(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Re-anchored CEP matches (operators/sequences.py
    skip_to_funnel_matches — FlinkCEP
    AfterMatchSkipStrategy.skipToFirst(click)): after each
    view→click{2,}→purchase match, the next match may re-anchor at the
    matched click step's FIRST repetition or later; at most 4 matches
    per user (bounded rounds, oracle unrolled)."""
    from flink_rag_spark.operators.sequences import skip_to_funnel_matches
    e = load_table(spark, sf_dir, "events")
    return skip_to_funnel_matches(e, SKIP_TO_STEPS, SKIP_TO_STEP,
                                  SKIP_TO_MAX_MATCHES, position="first")


def skip_to_last_funnel_users(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """skipToLast(click) sibling of :func:`skip_to_first_funnel_users`:
    re-anchoring waits for the matched click step's LAST (2nd)
    repetition — strictly coarser selection than skipToFirst on the
    same pattern."""
    from flink_rag_spark.operators.sequences import skip_to_funnel_matches
    e = load_table(spark, sf_dir, "events")
    return skip_to_funnel_matches(e, SKIP_TO_STEPS, SKIP_TO_STEP,
                                  SKIP_TO_MAX_MATCHES, position="last")


#: attribution model: purchases credit the most recent prior touch
ATTR_TOUCHES = ["view", "click", "signup"]
ATTR_CONVERSION = "purchase"


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution (operators/sequences.py
    last_touch_attribution): every purchase's value credited to the
    user's most recent prior view/click/signup, with the unattributed
    NULL bucket reported; per-touch totals and value shares. One
    funnel-family exchange + a |touch types|-bounded aggregate."""
    from flink_rag_spark.operators.sequences import last_touch_attribution
    e = load_table(spark, sf_dir, "events")
    return last_touch_attribution(e, ATTR_TOUCHES, ATTR_CONVERSION)


def purchase_attribution_linear(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (operators/sequences.py
    linear_attribution): every purchase's value split equally across
    the distinct prior touch types — last-touch's fairness complement
    on the same single funnel-family exchange."""
    from flink_rag_spark.operators.sequences import linear_attribution
    e = load_table(spark, sf_dir, "events")
    return linear_attribution(e, ATTR_TOUCHES, ATTR_CONVERSION)


def ab_user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (operators/hypothesis.py
    ab_proportion_test): per-user purchase conversion compared across
    the deterministic even/odd user split — the A/B experiment readout
    beside the KS test's distribution comparison. One per-user
    aggregate + one conditional-count aggregate."""
    from flink_rag_spark.operators.hypothesis import ab_proportion_test
    e = load_table(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.max(F.col("event_type") == "purchase")
                     .alias("converted"))
                .withColumn("grp", F.pmod(F.col("user_id"), F.lit(2))))
    return ab_proportion_test(per_user, "grp", "converted", 0, 1)


_AB_USERS_SQL = """
SELECT user_id % 2 AS grp,
       MAX(CASE WHEN event_type = 'purchase' THEN TRUE ELSE FALSE END)
         AS converted
FROM events GROUP BY user_id
"""


COVIS_TOP_N = 5


def part_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-visitation recommendations (operators/
    association.py covisitation_topn): each part's top-5 co-purchase
    neighbors by popularity-normalized cosine — the "people also
    bought" serving table mined from the same hub-capped basket
    machinery as the pair rules."""
    from flink_rag_spark.operators.association import covisitation_topn
    li = load_table(spark, sf_dir, "lineitem")
    return covisitation_topn(li, "l_orderkey", "l_partkey",
                             top_n=COVIS_TOP_N,
                             min_pair_count=RULES_MIN_PAIR)


#: the conversion-speed funnel the stats query reports on
FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-speed report (operators/sequences.py
    funnel_conversion_stats): per funnel transition, type-1 (rank-picked,
    interpolation-free) min/median/p90/max of the per-user time between
    earliest step completions — the HOW-FAST axis funnel_summary lacks."""
    from flink_rag_spark.operators.sequences import funnel_conversion_stats
    e = load_table(spark, sf_dir, "events")
    return funnel_conversion_stats(e, FUNNEL_STEPS)


#: CUSUM tuning for the per-user event-value monitor: target ≈ the
#: corpus mean, slack = half a σ-ish allowance, h = the decision bound
CUSUM_TARGET = 50.0
CUSUM_SLACK = 10.0
CUSUM_H = 400.0


def cusum_user_value_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (operators/anomaly.py, Page 1954)
    over per-user event values: earliest upward/downward mean-shift
    alarms, statistic peaks and alarm counts per user. The recurrence
    runs as its running-sum − running-min closed form — one exchange,
    four windows, zero recursion — with DECIMAL-quantized deviations so
    the statistics replay bit-identically in the oracle."""
    from flink_rag_spark.operators.anomaly import cusum_first_alarms
    e = load_table(spark, sf_dir, "events")
    return cusum_first_alarms(e, ["user_id"], "ts", "value",
                              target=CUSUM_TARGET, slack=CUSUM_SLACK,
                              h=CUSUM_H, seq_col="event_id")


#: quantile-rollup contract: 5-unit value bins (events.value spans
#: 0–~500 → ≤100 bins), daily p50/p90/p99 served from hourly partials
QROLL_STEP = 5.0
QROLL_QS = [0.5, 0.9, 0.99]


def daily_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile partials in continuous aggregates (operators/
    profiling.py quantile_partials — the percentile twin of the HLL
    rollup): HOURLY quantized-bin counts cascade to DAILY bins by plain
    summation (exact, order-independent), then p50/p90/p99 finalize as
    rank-picked bin lower edges — a percentile the driver can hash-grade
    because the quantization is the contract."""
    from flink_rag_spark.operators.profiling import (quantile_partials,
                                                     quantiles_from_bins)
    e = load_table(spark, sf_dir, "events")
    hourly = quantile_partials(e, "ts", "value", "1 hour", QROLL_STEP)
    daily = (hourly.groupBy(
        F.window("bucket_ts", "1 day")["start"].alias("bucket_ts"),
        "qbin").agg(F.sum("cnt").alias("cnt")))
    return quantiles_from_bins(daily, ["bucket_ts"], QROLL_QS,
                               QROLL_STEP)


def part_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection (operators/graph.py community_labels —
    deterministic synchronous label propagation, Raghavan et al. 2007)
    over the part co-purchase graph: (node, label) after 4
    most-frequent-neighbor rounds. The dense-region refinement of the
    reachability view connected_components gives."""
    from flink_rag_spark.operators.graph import community_labels
    return community_labels(_copurchase_pairs(spark, sf_dir), "u", "v")


KCORE_K = 3


def part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (operators/graph.py kcore_nodes) of the
    part co-purchase graph: nodes surviving 6 synchronous peel rounds
    at k=3 with their in-core degrees — the embeddedness view beside
    part_communities' region labels and part_triangle_stats' density."""
    from flink_rag_spark.operators.graph import kcore_nodes
    return kcore_nodes(_copurchase_pairs(spark, sf_dir), k=KCORE_K)


L_DIVERSITY_L = 5


def l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (operators/privacy.py) over the customer
    quasi-identifier (market segment, nation) with the account-balance
    thousand-band as the sensitive attribute: per-combination sizes,
    distinct-band counts and the below-l risk flag — k-anonymity's
    necessary complement on the same QI."""
    from flink_rag_spark.operators.privacy import l_diversity_audit
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .withColumn("acct_band",
                     F.floor(F.col("c_acctbal") / 1000).cast("bigint")))
    return l_diversity_audit(j, ["c_mktsegment", "n_name"], "acct_band",
                             L_DIVERSITY_L)


#: the l-diversity oracle's inner relation — same join, same band
_L_DIVERSITY_SQL = """
SELECT c.c_mktsegment, n.n_name,
       CAST(FLOOR(c.c_acctbal / 1000) AS BIGINT) AS acct_band
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators/privacy.py) over the customer
    quasi-identifier (market segment, nation): per-combination group
    sizes with the below-k risk flag. One aggregate over the QI
    columns."""
    from flink_rag_spark.operators.privacy import k_anonymity_audit
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return k_anonymity_audit(j, ["c_mktsegment", "n_name"], k=K_ANON_K)


def keywords_tfidf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (operators/keywords.py):
    top-5 salient terms per document with smooth idf over exact counts.
    Wordcount-shaped; the idf table broadcasts; top-N is a per-document
    window, never a global sort."""
    from flink_rag_spark.operators.keywords import tfidf_keywords
    d = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(d, "text", "doc_id", top_n=5, min_df=2)


def decayed_at_latest_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user decayed activity anchored at each user's OWN latest
    event (operators/timeseries.py time_decayed_at_latest) — the exact
    state the streaming decay monitor (streaming/decay.py) converges to.
    One key exchange shared by the anchor window and the aggregate."""
    e = load_table(spark, sf_dir, "events")
    return time_decayed_at_latest(e, ["user_id"], "ts", "value",
                                  half_life_days=DECAY_HALF_LIFE_DAYS)


IVM_RELOCATE_MOD = 97


IVM_UPSERT_MOD = 191  # orderkeys rewritten by the fact-upsert demo


def ivm_upserted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side UPSERT maintenance (operators/ivm.py upsert_facts —
    the delta class append/dim-update don't cover): build the view from
    pre-1997 history, then one upsert batch that (a) REWRITES every
    orderkey % 191 == 0 row with a higher price and a +40-day date —
    rows that MOVE between month partitions — and (b) INSERTS all
    1997-01 orders as brand-new keys; replayed once to prove keyed
    idempotency. Oracle = the from-scratch join over the equivalently
    modified fact set."""
    import os
    import shutil
    import tempfile

    from flink_rag_spark.operators.ivm import (build_join_view,
                                               read_join_view,
                                               upsert_facts)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dims = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select("c_custkey", "c_mktsegment", "n_name"))
    hist = o.filter(F.col("o_orderdate") < "1997-01-01")
    path = tempfile.mkdtemp(prefix="ivm_up_") + "/view"
    build_join_view(spark, hist, dims, path, "o_custkey", "c_custkey",
                    "o_orderdate")
    changed = (hist.filter(F.col("o_orderkey") % IVM_UPSERT_MOD == 0)
               .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
               .withColumn("o_orderdate",
                           F.expr("o_orderdate + INTERVAL 40 DAYS")))
    inserts = o.filter((F.col("o_orderdate") >= "1997-01-01")
                       & (F.col("o_orderdate") < "1997-02-01"))
    batch = changed.unionByName(inserts)
    upsert_facts(spark, batch, dims, path, "o_orderkey", "o_custkey",
                 "c_custkey", "o_orderdate")
    upsert_facts(spark, batch, dims, path, "o_orderkey", "o_custkey",
                 "c_custkey", "o_orderdate")  # replay: keyed no-op
    out = (read_join_view(spark, path).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "c_mktsegment", "n_name", "pmonth").localCheckpoint())
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return out


ORACLE_IVM_UPSERT = f"""
WITH facts AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % {'{m}'} = 0
              THEN o_orderdate + INTERVAL 40 DAY ELSE o_orderdate END
           AS o_orderdate,
         CASE WHEN o_orderkey % {'{m}'} = 0
              THEN o_totalprice + 1000.0 ELSE o_totalprice END
           AS o_totalprice
  FROM orders WHERE o_orderdate < DATE '1997-01-01'
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
  FROM orders
  WHERE o_orderdate >= DATE '1997-01-01'
    AND o_orderdate < DATE '1997-02-01')
SELECT f.o_orderkey, f.o_custkey, f.o_orderdate, f.o_totalprice,
       c.c_mktsegment, n.n_name, strftime(f.o_orderdate, '%Y-%m') AS pmonth
FROM facts f
JOIN customer c ON f.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
""".replace("{m}", str(IVM_UPSERT_MOD))


IVM_DELETE_MOD = 173  # orderkeys purged by the fact-delete demo


def ivm_deleted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side DELETE maintenance (operators/ivm.py delete_facts —
    the fourth delta class, the view's right-to-be-forgotten arm):
    build the view from pre-1997 history, purge every orderkey % 173
    == 0 row, replay the purge to prove idempotency, read back. The
    oracle is the from-scratch join excluding the deleted keys."""
    import os
    import shutil
    import tempfile

    from flink_rag_spark.operators.ivm import (build_join_view,
                                               delete_facts,
                                               read_join_view)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dims = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select("c_custkey", "c_mktsegment", "n_name"))
    hist = o.filter(F.col("o_orderdate") < "1997-01-01")
    path = tempfile.mkdtemp(prefix="ivm_del_") + "/view"
    build_join_view(spark, hist, dims, path, "o_custkey", "c_custkey",
                    "o_orderdate")
    doomed = (hist.filter(F.col("o_orderkey") % IVM_DELETE_MOD == 0)
              .select("o_orderkey"))
    delete_facts(spark, doomed, path, "o_orderkey")
    delete_facts(spark, doomed, path, "o_orderkey")  # replay: no-op
    out = (read_join_view(spark, path).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "c_mktsegment", "n_name", "pmonth").localCheckpoint())
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return out


ORACLE_IVM_DELETE = f"""
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
       c.c_mktsegment, n.n_name, strftime(o.o_orderdate, '%Y-%m') AS pmonth
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate < DATE '1997-01-01'
  AND o.o_orderkey % {IVM_DELETE_MOD} <> 0
"""


#: BFS seeds for the co-purchase blast-radius demo — part keys 1 and 2
#: exist at every SF
BFS_SOURCES = [1, 2]
BFS_MAX_HOPS = 3


PPR_ITERS = 4


def part_ppr_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.py personalized_pagerank)
    from the seed parts over the co-purchase graph: seed-proximity
    scores weighing path multiplicity where part_bfs_hops counts hops —
    the "related to THESE" relevance view. Oracle replays all four
    power iterations as unrolled CTEs."""
    from flink_rag_spark.operators.graph import personalized_pagerank
    pairs = _copurchase_pairs(spark, sf_dir)
    edges = (pairs.select(F.col("u").alias("src"), F.col("v").alias("dst"))
             .union(pairs.select(F.col("v").alias("src"),
                                 F.col("u").alias("dst"))))
    return personalized_pagerank(edges, BFS_SOURCES, iters=PPR_ITERS)


LINKPRED_TOP_N = 5


def part_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction (operators/graph.py link_prediction): top-5
    Adamic–Adar candidates per part over the co-purchase graph —
    scoring ABSENT edges where part_covisitation scores existing
    co-occurrence."""
    from flink_rag_spark.operators.graph import link_prediction
    return link_prediction(_copurchase_pairs(spark, sf_dir),
                           top_n=LINKPRED_TOP_N)


def part_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS distances (operators/graph.py bfs_hops) over
    the part co-purchase graph: minimum hop count from the seed parts
    within 3 hops — the blast-radius/ego-network view beside
    reachability (connected_components) and embeddedness (k-core)."""
    from flink_rag_spark.operators.graph import bfs_hops
    return bfs_hops(_copurchase_pairs(spark, sf_dir), BFS_SOURCES,
                    BFS_MAX_HOPS)


def ivm_enriched_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN view (operators/ivm.py): build the
    enriched-orders view (orders ⋈ customer-dims) from pre-1997 history,
    append 1997 and 1998+ as two fact batches (the first replayed to
    prove marker idempotency), then relocate every custkey % 97 == 0
    customer's market segment — a dimension update re-derived from the
    view's own rows, never rescanning the fact table. The oracle is the
    from-scratch join with the dim change as a CASE, so incremental ≡
    recompute is value-verified end to end, the same way
    rollup_incremental_hourly verifies its materialized store."""
    import os
    import shutil
    import tempfile

    from pyspark.storagelevel import StorageLevel

    from flink_rag_spark.operators.ivm import (
        append_facts, apply_dim_update, build_join_view, read_join_view)
    # demo-lifecycle persist (r15 verdict item 5 / guide §5): the base
    # fact read feeds FOUR eager writes (build + three appends) and the
    # dim join FIVE consumers — each previously re-ran its parquet scan
    # (and the customer⋈nation join) from scratch. Both frames are
    # released before returning; every write still computes its own
    # enrichment join, so the incremental-maintenance work being demoed
    # is untouched.
    o = (load_table(spark, sf_dir, "orders")
         .persist(StorageLevel.MEMORY_AND_DISK))
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dims = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select("c_custkey", "c_mktsegment", "n_name")
            .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        path = tempfile.mkdtemp(prefix="ivm_view_") + "/view"
        build_join_view(spark,
                        o.filter(F.col("o_orderdate") < "1997-01-01"),
                        dims, path, "o_custkey", "c_custkey",
                        "o_orderdate")
        b1 = o.filter((F.col("o_orderdate") >= "1997-01-01")
                      & (F.col("o_orderdate") < "1998-01-01"))
        append_facts(spark, b1, dims, path, "o_custkey", "c_custkey",
                     "o_orderdate", batch_id=1)
        append_facts(spark, b1, dims, path, "o_custkey", "c_custkey",
                     "o_orderdate", batch_id=1)  # replay: must be a no-op
        append_facts(spark, o.filter(F.col("o_orderdate") >= "1998-01-01"),
                     dims, path, "o_custkey", "c_custkey",
                     "o_orderdate", batch_id=2)
        moved = (dims.filter(F.col("c_custkey") % IVM_RELOCATE_MOD == 0)
                 .withColumn("c_mktsegment", F.lit("RELOCATED")))
        apply_dim_update(spark, moved, path, "o_custkey", "c_custkey")
        out = (read_join_view(spark, path).select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
            "c_mktsegment", "n_name", "pmonth")
            # materialize before deleting the demo view directory — the
            # returned frame must not depend on the tempdir (which would
            # otherwise leak a full view copy per invocation)
            .localCheckpoint())
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
        return out
    finally:
        o.unpersist()
        dims.unpersist()


ORACLE_IVM_ENRICHED = f"""
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
       CASE WHEN c.c_custkey % {IVM_RELOCATE_MOD} = 0 THEN 'RELOCATED'
            ELSE c.c_mktsegment END AS c_mktsegment,
       n.n_name, strftime(o.o_orderdate, '%Y-%m') AS pmonth
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


def rag_answer_grounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-side RAG eval (operators/evaluation.py
    answer_grounding): per-question token-overlap faithfulness of the
    full chain's answers against their retrieved contexts — the audit a
    serving change runs next to retrieval_eval_metrics. Wordcount-
    shaped; shuffles on the question id only."""
    from flink_rag_spark.operators.evaluation import answer_grounding
    from flink_rag_spark.plans.rag import rag_answer_oracle
    chain = rag_answer_oracle(spark, sf_dir)
    return answer_grounding(chain, "question_id", "answer", "information")


def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection (operators/anomaly.py): events
    whose value sits beyond 3.5 robust z-scores of their event type's
    median — the median/MAD rule a quality gate can trust because the
    statistics themselves resist the outliers. Two key-partitioned
    aggregates + joins; exact percentile swaps for approx_percentile at
    extreme group cardinality."""
    from flink_rag_spark.operators.anomaly import robust_outliers
    e = load_table(spark, sf_dir, "events")
    return robust_outliers(e, ["event_type"], "value")


#: chi-square critical values at alpha = 0.05 for the catalog queries'
#: fixed tables (neither engine ships an inverse-chi2 — the z-test
#: threshold-verdict discipline; values from the standard table)
CHI2_CRIT_DOF16 = 26.296   # 5 segments x 5 regions -> dof 16
CHI2_CRIT_DOF8 = 15.507    # Benford's 9 digits -> dof 8


def chi2_segment_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (operators/hypothesis.py
    chi2_independence): is market segment independent of region? The
    whole-table verdict over the same contingency the PMI grid
    (association_segment_region) scores cell by cell — one grouped
    count, a |5×5|-bounded grid with unobserved cells contributing
    their full expectation, 9-dp decimal term sums, threshold verdict
    at the dof-16 critical value."""
    from flink_rag_spark.operators.hypothesis import chi2_independence
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey))
    return chi2_independence(j, "c_mktsegment", "r_name",
                             CHI2_CRIT_DOF16)


def mwu_order_price_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test (operators/hypothesis.py
    mann_whitney_u): are EUROPE order prices stochastically larger than
    ASIA's? The location complement of the KS query's shape comparison
    — exact-integer 2U over distinct values via the distributed prefix
    sum, DECIMAL tie correction, threshold verdict."""
    from flink_rag_spark.operators.hypothesis import mann_whitney_u
    j = _orders_with_region(spark, sf_dir)
    return mann_whitney_u(
        j.filter(F.col("r_name") == "EUROPE").select("o_totalprice"),
        j.filter(F.col("r_name") == "ASIA").select("o_totalprice"),
        "o_totalprice")


def gini_order_value_regions(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Per-region Gini coefficient of order value
    (operators/profiling.py gini_concentration): how concentrated is
    spend within each region — the one-number Lorenz summary beside the
    histogram/winsorized profiles. One per-region ranking window + one
    aggregate, exact decimal sums — the DOUBLE fixture column is cast
    to DECIMAL(18,2) first (the Benford pattern) so ``total`` is an
    order-independent exact sum in both engines."""
    from flink_rag_spark.operators.profiling import gini_concentration
    j = _orders_with_region(spark, sf_dir).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)"))
    return gini_concentration(j, "o_totalprice", ["r_name"])


#: ACF lags the catalog query reports (hourly-ish event series; lag 3
#: is enough to expose echo structure without padding the output)
ACF_MAX_LAG = 3


def user_value_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user autocorrelation function (operators/timeseries.py
    autocorrelation): does a user's event-value series echo its recent
    past? Lags 1..3 from one lead-window pass + one exact-decimal
    aggregate — the structure diagnostic for the SES/Holt forecasts on
    the same series."""
    from flink_rag_spark.operators.timeseries import autocorrelation
    e = load_table(spark, sf_dir, "events")
    return autocorrelation(e.filter(F.col("value").isNotNull()),
                           ["user_id"], "ts", "value", ACF_MAX_LAG,
                           seq_col="event_id")


def benford_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (operators/profiling.py
    benford_audit): do order prices' leading digits follow Benford's
    law? String digit extraction from the DECIMAL column (identical in
    both engines), Python-literal Benford shares, all nine digits
    present, goodness-of-fit verdict at the dof-8 critical value."""
    from flink_rag_spark.operators.profiling import benford_audit
    o = load_table(spark, sf_dir, "orders")
    # the stored column is DOUBLE; both engines nearest-round the same
    # IEEE value to the same DECIMAL(18,2), giving identical positional
    # strings (the operator rejects raw doubles by contract)
    o = o.withColumn("_price_dec",
                     F.col("o_totalprice").cast("decimal(18,2)"))
    return benford_audit(o, "_price_dec", CHI2_CRIT_DOF8)


def purchase_attribution_ushaped(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40-20-40) attribution
    (operators/sequences.py ushaped_attribution): first and last prior
    touches carry 40% each, middles split the 20% — the position-aware
    member of the attribution family, on the same single
    funnel-family exchange."""
    from flink_rag_spark.operators.sequences import ushaped_attribution
    e = load_table(spark, sf_dir, "events")
    return ushaped_attribution(e, ATTR_TOUCHES, ATTR_CONVERSION)


#: Holt-Winters seasonal period for the catalog query: a 4-phase cycle
#: over each user's ordered event-value sequence (the ses/holt family's
#: ordered-sequence convention)
HW_PERIOD = 4


def user_value_hw_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters forecast (operators/timeseries.py
    holt_winters_forecast): level + trend + 4-phase seasonal over each
    user's event-value series, via the SES closed-form discipline (two
    Python-precomputed decimal weight tables, one window + two
    broadcast joins + one aggregate — no iteration). Emits the
    convergent functionals only (trend, forecast) — see the operator's
    identifiability note."""
    from flink_rag_spark.operators.timeseries import holt_winters_forecast
    e = load_table(spark, sf_dir, "events")
    return holt_winters_forecast(
        e.filter(F.col("value").isNotNull()),
        ["user_id"], "ts", "value", "event_id", period=HW_PERIOD)


#: time-decay attribution knobs for the catalog query: credit halves
#: per day of touch-to-purchase gap; touches older than 7 days get none
DECAY_ATTR_HALF_LIFE_S = 86_400.0
DECAY_ATTR_WINDOW_S = 7 * 86_400


def purchase_attribution_first(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """First-touch revenue attribution (operators/sequences.py
    first_touch_attribution): every purchase's value credited to the
    user's EARLIEST prior touch — the acquisition-credit twin of the
    graded last-touch query, same single funnel-family exchange."""
    from flink_rag_spark.operators.sequences import first_touch_attribution
    e = load_table(spark, sf_dir, "events")
    return first_touch_attribution(e, ATTR_TOUCHES, ATTR_CONVERSION)


def purchase_attribution_decay(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Time-decay attribution (operators/sequences.py
    time_decay_attribution): purchase value split across prior touches
    in proportion to 2^(−gap/1 day) within a 7-day window — the
    recency-weighted member of the attribution family; one key
    equi-join with the window riding the join condition."""
    from flink_rag_spark.operators.sequences import time_decay_attribution
    e = load_table(spark, sf_dir, "events")
    return time_decay_attribution(
        e, ATTR_TOUCHES, ATTR_CONVERSION,
        half_life_seconds=DECAY_ATTR_HALF_LIFE_S,
        window_seconds=DECAY_ATTR_WINDOW_S)


def spearman_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (operators/hypothesis.py
    spearman_corr): is line-item quantity monotonically associated with
    extended price? The nonparametric complement of the exact-sum
    Pearson matrix — midranks from the KS distributed prefix sum, exact
    half-integer decimal ranks, one final aggregate."""
    from flink_rag_spark.operators.hypothesis import spearman_corr
    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_quantity", "l_extendedprice")


def user_value_decomposition(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Classical additive decomposition (operators/timeseries.py
    seasonal_decompose): each user's event-value series split into
    centered-MA trend + zero-sum 4-phase seasonal + remainder — the
    diagnostic complement of the Holt-Winters forecast on the same
    series. One ordered window + one phase aggregate + one join-back."""
    from flink_rag_spark.operators.timeseries import seasonal_decompose
    e = load_table(spark, sf_dir, "events")
    return seasonal_decompose(
        e.filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value"),
        ["user_id"], "ts", "value", "event_id", period=HW_PERIOD)


#: chi-square critical value at alpha = 0.05, dof 4 (5 regions − 1)
CHI2_CRIT_DOF4 = 9.488


def kw_order_price_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank test (operators/hypothesis.py
    kruskal_wallis): do the five regions' order-price distributions
    differ anywhere? The k-group generalization of the MWU pair test —
    midranks via the distributed prefix sum, 9-dp decimal rank-sum
    terms, tie-corrected H, verdict at the dof-4 critical value."""
    from flink_rag_spark.operators.hypothesis import kruskal_wallis
    j = _orders_with_region(spark, sf_dir)
    return kruskal_wallis(j, "r_name", "o_totalprice", CHI2_CRIT_DOF4)


#: path length + report size for the frequent-paths catalog query
PATHS_LEN = 3
PATHS_TOP_N = 25


def frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event paths (operators/sequences.py frequent_paths):
    the 25 most common 3-step consecutive event-type sequences — the
    exploratory complement of the funnel family (surfaces the patterns
    worth funnel-testing). One ordered window + one grouped count +
    TakeOrderedAndProject."""
    from flink_rag_spark.operators.sequences import frequent_paths
    e = load_table(spark, sf_dir, "events")
    return frequent_paths(e, PATHS_LEN, top_n=PATHS_TOP_N)


def embedding_drift_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) drift (operators/drift.py
    embedding_drift): did the low-label half of the corpus embed
    somewhere else than the high-label half? Centroid cosine + L2 from
    exact per-dimension decimal sums — the vector-space complement of
    PSI/KS scalar drift."""
    from flink_rag_spark.operators.drift import embedding_drift
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_drift(e.filter(F.col("label") < 5),
                           e.filter(F.col("label") >= 5))


#: RBO depth + persistence for the scorer-agreement catalog query
RBO_DEPTH = 15


def rbo_bm25_vs_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (operators/evaluation.py rbo_overlap)
    between the BM25 and LM-Dirichlet top-15 lists for the shared term
    query — "do the two lexical scorers agree, weighted toward the
    top?"; the list-similarity complement of eval_ranking's
    ground-truth metrics. Both rankings are exact and SQL-replayable,
    so the whole composition hash-verifies.

    r15 optimization note: a shared-persisted-documents variant (load
    once, feed both arms) was built, oracle-verified, and REVERTED —
    the controlled A/B read neutral (3.55 s vs 3.68 s) while the
    bench-context read regressed, and a graded query buys no risk for
    an at-scale-only scan saving. Revisit only together with a
    pre-tokenized-frame API if round 16 takes the tokenization-sharing
    item."""
    from flink_rag_spark.operators.evaluation import rbo_overlap
    from flink_rag_spark.plans import llm
    a = (llm.bm25_topk_docs(spark, sf_dir)
         .select(F.lit(1).cast("bigint").alias("query_id"),
                 "doc_id", "rank"))
    b = (llm.lm_dirichlet_topk_docs(spark, sf_dir)
         .select(F.lit(1).cast("bigint").alias("query_id"),
                 "doc_id", "rank"))
    return rbo_overlap(a, b, depth=RBO_DEPTH)


# ----------------------------------------------- round-13 additions

#: one-way ANOVA on five regions: F critical value at dof (4, inf),
#: alpha 0.05 — the same large-sample stance as the z/chi2 verdicts
ANOVA_F_CRIT_DOF4 = 2.372


def anova_order_price_regions(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """One-way ANOVA (operators/hypothesis.py anova_f): do the five
    regions' MEAN order prices differ anywhere? The parametric
    complement of the Kruskal–Wallis rank test on the same grouping —
    exact decimal Σv/Σv² per region, 9-dp quantized between-group
    terms, threshold verdict at the dof-(4, ∞) critical value."""
    from flink_rag_spark.operators.hypothesis import anova_f
    j = _orders_with_region(spark, sf_dir)
    return anova_f(j, "r_name", "o_totalprice", ANOVA_F_CRIT_DOF4)


#: Welch verdict at the normal-limit critical value (both samples are
#: thousands of orders — ν is effectively infinite)
WELCH_T_CRIT = 1.959963984540054


def welch_order_price_regions(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (operators/hypothesis.py
    welch_t): is EUROPE's MEAN order price different from ASIA's? The
    parametric complement of the MWU rank test on the same pair —
    exact decimal side sums, Welch–Satterthwaite dof, threshold
    verdict."""
    from flink_rag_spark.operators.hypothesis import welch_t
    j = _orders_with_region(spark, sf_dir)
    return welch_t(
        j.filter(F.col("r_name") == "EUROPE").select("o_totalprice"),
        j.filter(F.col("r_name") == "ASIA").select("o_totalprice"),
        "o_totalprice", WELCH_T_CRIT)


def signup_purchase_hazard(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard (operators/survival.py
    nelson_aalen) per signup-week cohort on the SAME subjects as the
    KM curve: accumulated purchase intensity H(t) plus the
    Fleming–Harrington survival exp(−H) — the hazard-scale readout of
    the signup→purchase process, with exact 9-dp decimal hazard prefix
    sums where KM's product needs ln/exp."""
    from flink_rag_spark.operators.survival import nelson_aalen
    e = load_table(spark, sf_dir, "events")
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    p = (s.join(e.filter(F.col("event_type") == "purchase")
                .select("user_id", F.col("ts").alias("p_ts")),
                "user_id")
         .filter(F.col("p_ts") > F.col("s_ts"))
         .groupBy("user_id").agg(F.min("p_ts").alias("p_ts")))
    subj = (s.join(p, "user_id", "left")
            .select(F.date_trunc("week", F.col("s_ts")).alias("cohort"),
                    F.expr("timestampdiff(MICROSECOND, s_ts, "
                           f"coalesce(p_ts, TIMESTAMP '{KM_HORIZON}'))")
                    .alias("duration_us"),
                    F.col("p_ts").isNotNull().cast("int")
                    .alias("event")))
    return nelson_aalen(subj, "duration_us", "event", ["cohort"])


#: EWMA chart geometry: λ = 0.25 keeps the exact weight table at ~96
#: lags; 3σ limits — the textbook Roberts configuration
EWMA_LAM = 0.25
EWMA_L = 3.0


def user_value_ewma_chart(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """EWMA control chart (operators/anomaly.py ewma_control) over each
    user's event-value series: per-observation smoothed value vs
    widening 3σ control limits around the user's own Phase-I mean —
    the drift-sensitive member of the anomaly family (MAD catches
    point shocks, CUSUM level shifts, EWMA slow drifts). Literal
    decimal weight/limit tables, one bounded-lag pair join."""
    from flink_rag_spark.operators.anomaly import ewma_control
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    return ewma_control(e, ["user_id"], "ts", "value", "event_id",
                        lam=EWMA_LAM, n_sigma=EWMA_L)


#: t-closeness threshold on the acct-band EMD (standard demo value)
T_CLOSENESS_T = 0.2


def t_closeness_customers(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/privacy.py t_closeness_audit) on
    the SAME customer quasi-identifier and sensitive banding as the
    k-anonymity / l-diversity audits: per-(segment, nation) Earth
    Mover's Distance between the group's account-balance-band
    distribution and the table's (ordered 1-D EMD — balance bands are
    ordinal), flagged above t. Completes the privacy-audit ladder:
    size (k) → diversity (l) → distribution (t)."""
    from flink_rag_spark.operators.privacy import t_closeness_audit
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .withColumn("acct_band",
                     F.floor(F.col("c_acctbal") / 1000).cast("bigint")))
    return t_closeness_audit(j, ["c_mktsegment", "n_name"], "acct_band",
                             T_CLOSENESS_T, ordered=True)


def entropy_order_priority_regions(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Shannon entropy + Gini impurity (operators/profiling.py
    column_entropy) of the order-priority mix per region: how spread
    is each region's priority distribution — the information-content
    profile beside the histogram's shape and the association grid's
    pairwise PMI. One (region, priority) aggregate + a bounded fold."""
    from flink_rag_spark.operators.profiling import column_entropy
    j = _orders_with_region(spark, sf_dir)
    return column_entropy(j, "o_orderpriority", ["r_name"])


#: HITS demo depth — the PPR-demo stance (each iteration is TWO
#: half-step jobs, so 4 iterations price like pagerank's 6+dangling)
HITS_DEMO_ITERS = 4


def part_hits_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (operators/graph.py hits) over the
    DIRECTED customer→supplier purchase graph (distinct pairs from
    lineitem⋈orders): hub customers buy from authoritative suppliers,
    authoritative suppliers are bought by hub customers — the
    two-role centrality PageRank's single score conflates (the
    symmetric pagerank_copurchase view cannot separate them). The
    oracle unrolls all four half-step pairs with their L1
    normalizations."""
    from flink_rag_spark.operators.graph import hits
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .select(F.concat(F.lit("c"),
                              F.col("o_custkey").cast("string"))
                     .alias("src"),
                     F.concat(F.lit("s"),
                              F.col("l_suppkey").cast("string"))
                     .alias("dst"))
             .distinct())
    return (hits(edges, iters=HITS_DEMO_ITERS)
            .orderBy(F.desc("authority"), F.desc("hub"), "node"))


def mk_nation_monthly_trend(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope
    (operators/regression.py mann_kendall_trend) on each nation's
    MONTHLY order totals: is spend monotonically trending, and at what
    robust per-month rate? The outlier-resistant complement of
    trend_nation_order_value's OLS line — pairwise signs and the
    median pairwise slope over the pre-aggregated (one row per month)
    series the operator's distinct-x contract requires."""
    from flink_rag_spark.operators.regression import mann_kendall_trend
    j = _orders_with_region(spark, sf_dir)
    m = (j.groupBy("n_name",
                   (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                   .alias("month_idx"))
         .agg(F.sum("o_totalprice").alias("monthly_value")))
    return mann_kendall_trend(m, ["n_name"], "month_idx",
                              "monthly_value")


def jb_order_price_regions(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Jarque–Bera normality audit (operators/hypothesis.py
    jarque_bera) of order prices per region: skewness + excess
    kurtosis + the chi²(2) verdict — the assumption check that says
    whether the region's ANOVA/Welch verdicts should be trusted or the
    rank tests (KW/MWU) preferred. Two grouped passes, 9-dp quantized
    central moments."""
    from flink_rag_spark.operators.hypothesis import jarque_bera
    j = _orders_with_region(spark, sf_dir)
    return jarque_bera(j, "o_totalprice", ["r_name"])


def bf_order_price_regions(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Brown–Forsythe equal-variance test (operators/hypothesis.py
    brown_forsythe) across the five regions' order prices: ANOVA's
    homoscedasticity check — the median-centered Levene variant, a
    one-way F on |x − median_g| composed from the robust-median and
    exact-decimal ANOVA machinery."""
    from flink_rag_spark.operators.hypothesis import brown_forsythe
    j = _orders_with_region(spark, sf_dir)
    return brown_forsythe(j, "r_name", "o_totalprice",
                          ANOVA_F_CRIT_DOF4)


#: CUPED demo: pre-period = first half of the corpus month (the
#: covariate), experiment metric = second-half value; arms by user
#: parity (a deterministic randomization stand-in)
CUPED_SPLIT_DAY = 16


def cuped_user_value_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (operators/hypothesis.py
    cuped_ab_test — Deng et al. 2013): each user's second-half event
    value adjusted by their own first-half value before the arms
    compare — the experiment-sensitivity layer over
    ab_user_conversion's plain z. Reports θ, the variance bought, the
    adjusted means/lift and the Welch-form verdict."""
    from flink_rag_spark.operators.hypothesis import cuped_ab_test
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    units = (e.groupBy("user_id")
             .agg(F.sum(F.when(F.dayofmonth("ts") < CUPED_SPLIT_DAY,
                               F.col("value"))).alias("pre_value"),
                  F.sum(F.when(F.dayofmonth("ts") >= CUPED_SPLIT_DAY,
                               F.col("value"))).alias("post_value"))
             .withColumn("arm", F.when(F.col("user_id") % 2 == 0, "A")
                         .otherwise("B")))
    return cuped_ab_test(units, "arm", "post_value", "pre_value",
                         "A", "B")


# ------------------------------------------------ round-14 wave 2

#: Page-Hinkley drift parameters for the per-user event-value series:
#: tolerance delta absorbs in-control noise around the running mean,
#: lambda is the drift decision threshold
PH_DELTA = 10.0
PH_LAMBDA = 400.0


def user_value_ph_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-drift detection (operators/anomaly.py
    page_hinkley_alarms — the target-FREE member of the change family
    beside CUSUM's known-target shifts): per-user earliest upward /
    downward drift alarms of event value against the series' own
    running mean, statistic peaks and alarm counts. Four window layers
    on one exchange, exact-decimal prefix sums, floor-split running
    mean."""
    from flink_rag_spark.operators.anomaly import page_hinkley_alarms
    e = load_table(spark, sf_dir, "events")
    return page_hinkley_alarms(e, ["user_id"], "ts", "value",
                               delta=PH_DELTA, lam=PH_LAMBDA,
                               seq_col="event_id")


def hhi_customer_value_regions(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration (operators/profiling.py
    hhi_concentration): how FEW customers hold each region's order
    value — the market-concentration twin of the graded per-region
    Gini (Gini measures unevenness, HHI measures fewness), plus the
    member-count-adjusted normalized index. Two chained aggregates,
    exact decimal share sums, floor-split division."""
    from flink_rag_spark.operators.profiling import hhi_concentration
    j = _orders_with_region(spark, sf_dir).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)"))
    return hhi_concentration(j, "o_totalprice", ["o_custkey"],
                             ["r_name"])


def kendall_quantity_linenumber(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation (operators/hypothesis.py
    kendall_tau): concordance between line-item quantity and line
    number — the pair-counting complement of the graded Spearman,
    under the grid contract (quantity is a 50-level ordinal, the line
    number a 7-level one, so the cell pair frame is C(350,2)-bounded
    by construction; heavy ties exercise the full tie-corrected
    variance)."""
    from flink_rag_spark.operators.hypothesis import kendall_tau
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_linenumber")
    return kendall_tau(li, "l_quantity", "l_linenumber")


def gtest_segment_region(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """G-test of independence (operators/hypothesis.py
    g_test_independence): the likelihood-ratio twin of the graded
    chi-square on the same segment x region contingency — observed
    cells only, 9-dp-quantized ln ratios into exact decimal term sums,
    the same dof-16 critical value (G is asymptotically chi-square)."""
    from flink_rag_spark.operators.hypothesis import g_test_independence
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey))
    return g_test_independence(j, "c_mktsegment", "r_name",
                               CHI2_CRIT_DOF16)


def textrank_keywords_docs(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TextRank corpus keywords (operators/keywords.py
    textrank_keywords, Mihalcea & Tarau 2004): top-20 terms by
    weighted PageRank over the window-2 co-occurrence word graph —
    the graph-centrality complement of the TF-IDF keywords on the
    same corpus; pure composition with graph.pagerank's iterative
    machinery (4 iterations, oracle-unrolled)."""
    from flink_rag_spark.operators.keywords import textrank_keywords
    d = load_table(spark, sf_dir, "documents")
    return textrank_keywords(d, "text", "doc_id", k=20)


def user_value_stationarity(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (operators/timeseries.py
    dickey_fuller, ADF(0) constant-only): is each user's event-value
    series stationary — the assumption check underneath the graded
    SES/Holt/Holt-Winters forecasts and the decomposition on the same
    series. One lag window + one exact-decimal aggregate, verdict at
    the 5% tau_mu critical value."""
    from flink_rag_spark.operators.timeseries import dickey_fuller
    e = load_table(spark, sf_dir, "events")
    return dickey_fuller(e, ["user_id"], "ts", "value",
                         seq_col="event_id")


def rfm_customer_segments(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/profiling.py rfm_scores):
    every customer scored 1-5 on order recency / frequency / monetary
    value by value-quantile position — pure integer arithmetic over
    exact cumulative counts, the deterministic ties-share-a-score
    contract. One per-customer aggregate + three distributed-prefix
    rank joins."""
    from flink_rag_spark.operators.profiling import rfm_scores
    o = load_table(spark, sf_dir, "orders")
    return rfm_scores(o, "o_custkey", "o_orderdate", "o_totalprice")


def association_strength_segment_region(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Cramér's V + φ effect sizes (operators/hypothesis.py cramers_v):
    HOW STRONGLY does market segment associate with region — the 0..1
    strength companion to the graded chi-square verdict on the same
    contingency, composed from its own pipeline."""
    from flink_rag_spark.operators.hypothesis import cramers_v
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey))
    return cramers_v(j, "c_mktsegment", "r_name", CHI2_CRIT_DOF16)


def mi_segment_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information + NMI (operators/hypothesis.py
    mutual_information): the information-theoretic strength of the
    segment x region association — MI = G/(2n) of the graded G-test,
    normalized by the marginal entropies; quantized-ln exact decimal
    sums."""
    from flink_rag_spark.operators.hypothesis import mutual_information
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey))
    return mutual_information(j, "c_mktsegment", "r_name")


# ------------------------------------------------- round 15 builders


def levene_order_price_regions(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Levene's equal-variance test, mean center
    (operators/hypothesis.py levene_test): do the five regions' order-
    price VARIANCES differ — the textbook-original center beside the
    graded Brown–Forsythe's robust median form, on the same region
    frame; quantized exact-decimal means feeding the exact-decimal
    ANOVA machinery."""
    from flink_rag_spark.operators.hypothesis import levene_test
    j = _orders_with_region(spark, sf_dir)
    return levene_test(j, "r_name", "o_totalprice", ANOVA_F_CRIT_DOF4)


def cohens_d_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d + Hedges' g (operators/hypothesis.py cohens_d): HOW
    LARGE is the EUROPE-vs-ASIA order-price difference — the
    standardized effect size beside the Welch/MWU verdicts on the same
    two samples; exact decimal side sums, pooled-sd closed form."""
    from flink_rag_spark.operators.hypothesis import cohens_d
    j = _orders_with_region(spark, sf_dir)
    return cohens_d(
        j.filter(F.col("r_name") == "EUROPE").select("o_totalprice"),
        j.filter(F.col("r_name") == "ASIA").select("o_totalprice"),
        "o_totalprice")


def point_biserial_return_price(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Point-biserial correlation (operators/hypothesis.py
    point_biserial): does a RETURNED line item correlate with its
    price — binary flag × continuous value in ONE grouped aggregate,
    the effect-size form of the two-sample split."""
    from flink_rag_spark.operators.hypothesis import point_biserial
    li = load_table(spark, sf_dir, "lineitem")
    return point_biserial(li, F.col("l_returnflag") == "R",
                          "l_extendedprice")


def friedman_region_priority_price(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Friedman rank test (operators/hypothesis.py friedman_test): do
    the five ORDER PRIORITIES rank consistently across the five region
    BLOCKS on mean order price — the repeated-measures member of the
    rank battery (KW compares independent groups; Friedman removes the
    block effect first); doubled-midrank exact integers, dof-4
    threshold."""
    from flink_rag_spark.operators.hypothesis import friedman_test
    j = _orders_with_region(spark, sf_dir)
    return friedman_test(j, "r_name", "o_orderpriority",
                         "o_totalprice", CHI2_CRIT_DOF4)


#: Cochran's Q success bar — a round order-value threshold
COCHRAN_BAR = 300_000.0


def cochran_q_nation_priority(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Cochran's Q (operators/hypothesis.py cochran_q): does the share
    of nations reaching a 300k order differ across the five priorities
    — the binary-outcome repeated-measures test over nation blocks;
    pure-integer sums, dof-4 threshold."""
    from flink_rag_spark.operators.hypothesis import cochran_q
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = (o.join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey))
    return cochran_q(j, "n_name", "o_orderpriority",
                     F.col("o_totalprice") > COCHRAN_BAR,
                     CHI2_CRIT_DOF4)


def ordinal_assoc_quantity_linenumber(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Ordinal-association battery (operators/hypothesis.py
    ordinal_association): Goodman–Kruskal gamma, both Somers' D
    directions and Stuart's tau-c on the graded Kendall query's
    quantity × linenumber grid — the three cross-tab coefficients the
    tau-b consumer asks for next, from the SAME exact pair counts."""
    from flink_rag_spark.operators.hypothesis import ordinal_association
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_linenumber")
    return ordinal_association(li, "l_quantity", "l_linenumber")


def kappa_priority_value_bands(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/hypothesis.py cohen_kappa):
    chance-corrected agreement between two order labelings — the
    priority-derived urgency class vs the value-derived band — the
    label-vs-heuristic audit shape every weak-supervision pipeline
    runs; exact-integer grid, one double fold."""
    from flink_rag_spark.operators.hypothesis import cohen_kappa
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
               "high").otherwise("low").alias("urgency"),
        F.when(F.col("o_totalprice") > 150_000.0, "high")
        .otherwise("low").alias("value_band"))
    return cohen_kappa(o, "urgency", "value_band")


def uncertainty_segment_region(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient (operators/hypothesis.py
    uncertainty_coefficient): the asymmetric normalization of the
    graded segment × region MI — what fraction of each margin's
    entropy the other column removes; defined over the 6-dp-rounded
    MI outputs (the Cramér's-V composition discipline)."""
    from flink_rag_spark.operators.hypothesis import (
        uncertainty_coefficient)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey))
    return uncertainty_coefficient(j, "c_mktsegment", "r_name")


def inequality_order_value_regions(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Theil + Atkinson inequality (operators/profiling.py
    inequality_indexes): the entropy-family inequality of order value
    within each region beside the graded Gini (Theil decomposes across
    subgroups, Atkinson carries the welfare reading) — decimal
    contract enforced, quantized mean, 9-dp quantized terms."""
    from flink_rag_spark.operators.profiling import inequality_indexes
    j = _orders_with_region(spark, sf_dir).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)"))
    return inequality_indexes(j, "o_totalprice", ["r_name"])


def price_distribution_distance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Bounded distribution distances (operators/drift.py
    distribution_distance): JSD / Hellinger / total variation between
    EUROPE and ASIA order-price distributions over EUROPE's decile
    bins — the zero-safe bounded companions to the PSI drift score on
    the same bin machinery."""
    from flink_rag_spark.operators.drift import distribution_distance
    j = _orders_with_region(spark, sf_dir)
    return distribution_distance(
        j.filter(F.col("r_name") == "EUROPE").select("o_totalprice"),
        j.filter(F.col("r_name") == "ASIA").select("o_totalprice"),
        "o_totalprice")


def runs_daily_order_value(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test (operators/timeseries.py runs_test):
    is the daily total-order-value series random around its median, or
    does it cluster/alternate — the randomness check beside the graded
    trend (Mann–Kendall) and drift (Page–Hinkley) members, over the
    exact-decimal daily rollup."""
    from flink_rag_spark.operators.timeseries import runs_test
    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy("o_orderdate")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("daily_value"))
             .withColumn("series", F.lit("daily")))
    return runs_test(daily, ["series"], "o_orderdate", "daily_value")


def zipf_term_frequencies(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Zipf-law fit (operators/keywords.py zipf_fit): log-log OLS of
    the corpus rank-frequency curve over the top-1000 terms — the
    corpus-level generated-text smell beside the per-doc quality
    scores; quantized lns, exact decimal OLS sums."""
    from flink_rag_spark.operators.keywords import zipf_fit
    d = load_table(spark, sf_dir, "documents")
    return zipf_fit(d, "text")


#: followedByAny bound — first N lex-ordered completions per anchor
ANY_MATCHES_PER_ANCHOR = 3


def any_funnel_matches_users(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Bounded FlinkCEP ``followedByAny`` (operators/sequences.py
    any_funnel_matches): per view-anchor, the first 3 completed
    view → click → purchase combinations in lexicographic timestamp
    order — each later step free to match ANY later event, the full
    combination semantics the unbounded form makes exponential; the
    per-stage lex-top-N viable-prefix bound keeps it N rows per
    anchor per stage. Completes the relaxed-contiguity emission
    surface beside noSkip / skipPastLastEvent / skipTo*."""
    from flink_rag_spark.operators.sequences import any_funnel_matches
    e = load_table(spark, sf_dir, "events")
    return any_funnel_matches(e, ["view", "click", "purchase"],
                              per_anchor=ANY_MATCHES_PER_ANCHOR)


#: McNemar dof-1 critical value at alpha 0.05
CHI2_CRIT_DOF1 = 3.841


def mcnemar_urgency_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (operators/hypothesis.py mcnemar_test):
    do the urgency-derived and value-derived order labels disagree
    ASYMMETRICALLY — the marginal-homogeneity complement of the
    kappa agreement score on the same paired labeling; one aggregate,
    continuity-corrected chi-square at dof 1."""
    from flink_rag_spark.operators.hypothesis import mcnemar_test
    o = load_table(spark, sf_dir, "orders")
    return mcnemar_test(
        o, F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        F.col("o_totalprice") > 150_000.0, CHI2_CRIT_DOF1)
