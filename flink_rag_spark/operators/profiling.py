"""Column profiling: per-column stats of a table in one aggregation.

The ANALYZE/data-quality pass every pipeline runs before trusting a new
drop of data: row count, null count, distinct count, min/max per column —
as a DataFrame (one row per column), so the profile itself is queryable
and diffable across drops.

Physical shape: ONE aggregate computes every column's measures (count,
distinct, min, max all share the scan), then a ``stack`` over the single
aggregate row unpivots to (col_name, ...) rows — no per-column scans, no
driver-side loop over columns issuing jobs (the naive profiling shape).

The distinct counts pick the scale story:

- ``approx=False`` (default): exact COUNT(DISTINCT) per column. Spark
  plans multi-column distinct aggregates with an Expand node — the scan's
  rows are replicated once per distinct column before the shuffle, so a
  C-column exact profile shuffles ~C× the rows. Right for test-scale and
  for the DuckDB oracle (exact values).
- ``approx=True``: HLL++ sketches (approx_count_distinct). One ordinary
  partial+final aggregate — no Expand, shuffle is one sketch per column
  per partition regardless of row count. The 100 TB default; rel. error
  ``rsd`` (2.5% default). Plan difference asserted in tests.

min/max are computed in the column's native type and THEN cast to string
(cast(min(c)) — never min(cast(c)): lexicographic string order would
corrupt numeric extremes), so one output schema fits every column type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import DecimalType


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    approx: bool = False, rsd: float = 0.025) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (F.approx_count_distinct(c, rsd) if approx
              else F.countDistinct(c))
        aggs += [F.count(F.col(c)).alias(f"{c}__nn"),
                 nd.alias(f"{c}__nd"),
                 F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                 F.max(F.col(c)).cast("string").alias(f"{c}__max")]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in cols)
    stacked = one.select(
        F.col("__n"),
        F.expr(f"stack({len(cols)}, {parts})")
        .alias("col_name", "__nn", "n_distinct", "min_value", "max_value"))
    return stacked.select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        "n_distinct", "min_value", "max_value")


def profile_columns_duck(table: str, cols: list[str]) -> str:
    """DuckDB mirror (exact path): one UNION ALL branch per column with
    identical cast-of-extreme semantics."""
    branches = []
    for c in cols:
        branches.append(f"""
SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM {table}""")
    return "\nUNION ALL\n".join(branches)


def quantile_bins(df: DataFrame, value_col: str, n_bins: int = 10,
                  out_col: str = "bin", exact: bool = True) -> DataFrame:
    """Equal-frequency (quantile) binning — the feature-discretization
    stage of a training pipeline: every row gets the 1-based index of its
    value's decile/quantile bucket, with boundaries computed from the
    data itself.

    Two-pass by nature (boundaries, then assignment), but each pass is
    one scan: the n_bins−1 boundaries aggregate to a SINGLE row that
    broadcasts back onto the assignment scan, where the bin index is
    1 + Σ (value > boundary_i) — a codegen'd conditional sum, no join
    per boundary, no shuffle beyond the boundary aggregation's own.
    Ties sit in the LOWER bin (strict >), so assignment is deterministic.

    ``exact=True`` uses interpolated ``percentile`` (≡ DuckDB
    quantile_cont — the engine-parity tier); at 100 TB pass
    ``exact=False`` for ``approx_percentile`` (t-digest-backed, one
    pass, mergeable partials) — identical plan shape, approximate
    boundaries."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fn = "percentile" if exact else "approx_percentile"
    ps = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(*[
        F.expr(f"{fn}({value_col}, {p!r})").alias(f"_qb{i}")
        for i, p in enumerate(ps)])
    idx = F.lit(1)
    for i in range(len(ps)):
        idx = idx + F.when(F.col(value_col) > F.col(f"_qb{i}"), 1) \
                     .otherwise(0)
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn(out_col, idx.cast("int"))
            .drop(*[f"_qb{i}" for i in range(len(ps))]))


def quantile_bins_duck(table: str, value_col: str, n_bins: int,
                       select_cols: str, out_col: str = "bin") -> str:
    """DuckDB mirror of the exact path: quantile_cont boundaries, same
    strict-> conditional sum, same 1-based index."""
    ps = [i / n_bins for i in range(1, n_bins)]
    bs = ", ".join(f"quantile_cont({value_col}, {p!r}) AS _qb{i}"
                   for i, p in enumerate(ps))
    terms = " + ".join(
        f"(CASE WHEN {value_col} > _qb{i} THEN 1 ELSE 0 END)"
        for i in range(len(ps)))
    return f"""
WITH b AS (SELECT {bs} FROM {table})
SELECT {select_cols}, CAST(1 + {terms} AS INT) AS {out_col}
FROM {table}, b
"""


def key_skew_profile(df: DataFrame, key_col: str,
                     top_n: int = 20) -> DataFrame:
    """Join-key skew diagnostic — the first thing to look at before
    shuffling 100 TB on a key: per-key frequencies reduced to the top-N
    hot keys plus whole-distribution shape measures (max/avg skew
    ratio, max share, Gini coefficient of the count distribution).

    Physical shape: groupBy(key).count() is the only full-data pass
    (map-side combined); everything after runs on the |distinct keys|
    COUNT rows. The Gini rank is a total-order window over that reduced
    frame — fine for any realistic key cardinality at test scale; for
    billions of distinct keys swap the exact rank for a
    ``quantile_bins``-histogram Gini (same output column, approximate)
    rather than paying a single-task sort. The rank×count sum stays in
    exact BIGINT arithmetic (cast to DECIMAL at extreme cardinality ×
    frequency products).

    Output: one row per top-N key — (rank, key, cnt, share, skew_ratio)
    — with the global (n_keys, avg_cnt, max_share, gini) repeated on
    every row so the result is self-contained."""
    from pyspark.sql import Window
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"))
    w_asc = Window.orderBy(F.asc("cnt"), F.asc("key"))
    ranked = counts.withColumn("_i", F.row_number().over(w_asc))
    glob = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("_tot"),
        F.max("cnt").alias("_max"),
        F.sum(F.col("_i") * F.col("cnt")).alias("_s_ic"))
    glob = glob.select(
        "n_keys", "_tot",
        F.round(F.col("_tot") / F.col("n_keys"), 6).alias("avg_cnt"),
        F.round(F.col("_max") / F.col("_tot"), 6).alias("max_share"),
        F.round(2.0 * F.col("_s_ic")
                / (F.col("n_keys") * F.col("_tot"))
                - (F.col("n_keys") + 1.0) / F.col("n_keys"), 6)
        .alias("gini"))
    w_desc = Window.orderBy(F.desc("cnt"), F.asc("key"))
    top = (counts.withColumn("rank", F.row_number().over(w_desc))
           .filter(F.col("rank") <= top_n))
    return (top.crossJoin(F.broadcast(glob))
            .select("rank", "key", "cnt",
                    F.round(F.col("cnt") / F.col("_tot"), 6)
                    .alias("share"),
                    F.round(F.col("cnt") * F.col("n_keys")
                            / F.col("_tot"), 6).alias("skew_ratio"),
                    "n_keys", "avg_cnt", "max_share", "gini"))


def key_skew_profile_duck(table: str, key_col: str,
                          top_n: int = 20) -> str:
    """DuckDB mirror of ``key_skew_profile`` — same rank orders, same
    exact-integer Gini numerator, same rounding."""
    return f"""
WITH counts AS (
  SELECT {key_col} AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} GROUP BY 1),
ranked AS (
  SELECT key, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt ASC, key ASC) AS i
  FROM counts),
tots AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS tot,
         CAST(MAX(cnt) AS BIGINT) AS maxc,
         CAST(SUM(i * cnt) AS BIGINT) AS s_ic
  FROM ranked),
g2 AS (
  SELECT n_keys, tot,
         ROUND(tot / CAST(n_keys AS DOUBLE), 6) AS avg_cnt,
         ROUND(maxc / CAST(tot AS DOUBLE), 6) AS max_share,
         ROUND(2.0 * s_ic / (CAST(n_keys AS DOUBLE) * tot)
               - (n_keys + 1.0) / n_keys, 6) AS gini
  FROM tots),
top AS (
  SELECT key, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS INT)
           AS rank
  FROM counts)
SELECT rank, key, cnt,
       ROUND(cnt / CAST(tot AS DOUBLE), 6) AS share,
       ROUND(cnt * CAST(n_keys AS DOUBLE) / tot, 6) AS skew_ratio,
       n_keys, avg_cnt, max_share, gini
FROM top, g2 WHERE rank <= {top_n}
"""


def winsorized_stats(df: DataFrame, value_col: str, group_col: str,
                     p_lo: float = 0.01, p_hi: float = 0.99,
                     dp: int = 4) -> DataFrame:
    """Per-group robust stats with percentile clipping (winsorization) —
    the outlier-tolerant profiling pass feeding quality thresholds:
    boundaries at (p_lo, p_hi) per group, values clipped into them,
    mean/stddev reported before and after plus how many rows were
    clipped.

    Two passes, each one scan: (1) per-group exact interpolated
    ``percentile`` boundaries — a |groups|-row frame that BROADCASTS
    back onto (2) the clip-and-aggregate scan. No per-group jobs, no
    second shuffle beyond the group-key aggregation itself. At 100 TB
    swap ``percentile`` for ``approx_percentile`` (mergeable t-digest,
    same plan shape) exactly as in ``quantile_bins``."""
    b = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {p_lo!r})").alias("_lo"),
        F.expr(f"percentile({value_col}, {p_hi!r})").alias("_hi"))
    j = df.join(F.broadcast(b), on=group_col)
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when((v < F.col("_lo")) | (v > F.col("_hi")), 1)
              .otherwise(0)).alias("n_clipped"),
        F.round(F.min("_lo"), dp).alias("p_lo_value"),
        F.round(F.min("_hi"), dp).alias("p_hi_value"),
        F.round(F.avg(v), dp).alias("mean_raw"),
        F.round(F.avg(clipped), dp).alias("mean_wins"),
        F.round(F.stddev_samp(v), dp).alias("std_raw"),
        F.round(F.stddev_samp(clipped), dp).alias("std_wins"))


def winsorized_stats_duck(table: str, value_col: str, group_col: str,
                          p_lo: float = 0.01, p_hi: float = 0.99,
                          dp: int = 4) -> str:
    """DuckDB mirror — quantile_cont ≡ Spark's interpolated percentile,
    same clip expression, same sample stddev."""
    return f"""
WITH b AS (
  SELECT {group_col},
         quantile_cont({value_col}, {p_lo!r}) AS lo,
         quantile_cont({value_col}, {p_hi!r}) AS hi
  FROM {table} GROUP BY 1),
j AS (
  SELECT t.{group_col}, t.{value_col} AS v, b.lo, b.hi,
         LEAST(GREATEST(t.{value_col}, b.lo), b.hi) AS cv
  FROM {table} t JOIN b USING ({group_col}))
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN v < lo OR v > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped,
       ROUND(MIN(lo), {dp}) AS p_lo_value,
       ROUND(MIN(hi), {dp}) AS p_hi_value,
       ROUND(AVG(v), {dp}) AS mean_raw,
       ROUND(AVG(cv), {dp}) AS mean_wins,
       ROUND(STDDEV_SAMP(v), {dp}) AS std_raw,
       ROUND(STDDEV_SAMP(cv), {dp}) AS std_wins
FROM j GROUP BY 1
"""


def equiwidth_histogram(df: DataFrame, value_col: str, n_bins: int = 20,
                        lo: float | None = None,
                        hi: float | None = None) -> DataFrame:
    """Equi-width histogram: (bin, bin_lo, bin_hi, n) with EVERY bin
    present (empty bins carry n = 0 — a histogram with holes silently
    reads as a different distribution). The profiling staple next to
    ``quantile_bins``' equi-frequency cut.

    ``lo``/``hi`` default to the column's min/max (one 1-row aggregate);
    pass them to pin a fleet-wide binning. Values land in
    ``floor((x − lo) / width)`` clamped to [0, n_bins−1] (so x = hi
    falls in the last bin); NULLs and out-of-range values are excluded.
    Plan: one scan-side bin expression + a partial+final count, plus an
    n_bins-row generated frame outer-joined to materialize empties —
    the exchange carries ≤ n_bins rows."""
    spark = df.sparkSession
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        [r] = (df.filter(v.isNotNull())
               .agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect())
        if r["lo"] is None:
            # empty / all-NULL column: report an all-zero histogram over
            # NULL bounds rather than crashing a profiling pass
            bins = spark.range(n_bins).select(
                F.col("id").cast("int").alias("bin"))
            return bins.select(
                "bin", F.lit(None).cast("double").alias("bin_lo"),
                F.lit(None).cast("double").alias("bin_hi"),
                F.lit(0).cast("bigint").alias("n"))
        lo = float(r["lo"]) if lo is None else lo
        hi = float(r["hi"]) if hi is None else hi
    width = (hi - lo) / n_bins if hi > lo else 1.0
    bin_col = F.least(F.floor((v - F.lit(lo)) / F.lit(width)),
                      F.lit(n_bins - 1)).cast("int")
    counts = (df.filter(v.isNotNull() & (v >= lo) & (v <= hi))
              .select(bin_col.alias("bin"))
              .groupBy("bin").agg(F.count(F.lit(1)).alias("n")))
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (bins.join(counts, on="bin", how="left")
            .select("bin",
                    F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6)
                    .alias("bin_lo"),
                    F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6)
                    .alias("bin_hi"),
                    F.coalesce("n", F.lit(0)).cast("bigint").alias("n")))


def equiwidth_histogram_duck(inner_sql: str, value_col: str,
                             n_bins: int, lo: float, hi: float) -> str:
    """DuckDB mirror of :func:`equiwidth_histogram` with PINNED lo/hi
    (the data-derived default is a driver-side 1-row aggregate the
    caller replays by passing the same bounds)."""
    width = (hi - lo) / n_bins if hi > lo else 1.0
    return f"""
WITH src AS (SELECT CAST({value_col} AS DOUBLE) AS v FROM ({inner_sql})),
c AS (
  SELECT CAST(LEAST(FLOOR((v - {lo!r}) / {width!r}), {n_bins - 1})
              AS INT) AS bin, COUNT(*) AS n
  FROM src WHERE v IS NOT NULL AND v >= {lo!r} AND v <= {hi!r}
  GROUP BY 1),
bins AS (SELECT CAST(range AS INT) AS bin FROM range({n_bins}))
SELECT bins.bin,
       ROUND({lo!r} + bins.bin * {width!r}, 6) AS bin_lo,
       ROUND({lo!r} + (bins.bin + 1) * {width!r}, 6) AS bin_hi,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM bins LEFT JOIN c USING (bin)
"""


# ---------------------------------------- mergeable quantile partials

def quantile_partials(events: DataFrame, ts_col: str, value_col: str,
                      bucket: str, step: float) -> DataFrame:
    """Quantized-histogram QUANTILE partials for continuous aggregates —
    the percentile twin of the rollup family's HLL sketch partials
    (operators/rollup.py): per time bucket, counts of values quantized
    to fixed ``step``-wide bins. (bucket_ts, qbin, cnt) rows are plain
    integer counts, so they MERGE like the rollup's ``cnt`` — sum per
    (bucket, qbin) is commutative/associative and bit-identical to a
    from-scratch build under any batch split — and they PERSIST through
    the existing rollup store unmodified (``build_rollup(...,
    keys=["qbin"])`` — the marker/replay/cascade machinery applies as
    is; proven in tests). Quantiles finalized from these bins carry a
    bounded quantization error < ``step`` and are EXACTLY reproducible
    (the quantization is part of the contract — what lets the driver
    hash-grade a percentile, where interpolated sketches could not be).

    Plan: one scan-side bin expression + one partial+final count; the
    shuffle carries ≤ |buckets|·|bins| rows, never raw events."""
    if step <= 0:
        raise ValueError(f"step must be > 0, got {step}")
    b = F.window(F.col(ts_col), bucket)["start"].alias("bucket_ts")
    qbin = F.floor(F.col(value_col).cast("double") / F.lit(step)) \
        .cast("bigint").alias("qbin")
    return (events.filter(F.col(value_col).isNotNull())
            .groupBy(b, qbin)
            .agg(F.count(F.lit(1)).alias("cnt")))


def quantiles_from_bins(bins: DataFrame, group_cols: list[str],
                        qs: list[float], step: float) -> DataFrame:
    """Finalize quantiles from (group..., qbin, cnt) bins: for each
    requested q, the LOWER EDGE of the first bin whose cumulative count
    reaches rank ceil(q·n) — a type-1 (rank-picked) quantile quantized
    down by < ``step``, deterministic in both engines (no
    interpolation; the funnel-stats stance). Output one row per
    (group..., q): (group..., q, quantile_lb, n).

    Plan: one cumulative window over qbin order per group (≤ |bins|
    rows) + one |groups|-row aggregate."""
    from pyspark.sql import Window
    w_cum = (Window.partitionBy(*group_cols).orderBy("qbin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*group_cols)
    cum = (bins
           .withColumn("_cum", F.sum("cnt").over(w_cum))
           .withColumn("_n", F.sum("cnt").over(w_all)))
    # POSITIONAL aliases — a value-derived name like _q{int(q*1000)}
    # would collide for quantiles agreeing to 3 decimals (0.999 vs
    # 0.9995) and break the stack reference with an ambiguous column
    picks = []
    for i, q in enumerate(qs):
        picks.append(
            F.min(F.when(F.col("_cum") >= F.ceil(F.col("_n") * q),
                         F.col("qbin"))).alias(f"_qi{i}"))
    picks.append(F.max("_n").cast("bigint").alias("_nn"))
    one = cum.groupBy(*group_cols).agg(*picks)
    entries = ", ".join(
        f"CAST({q!r} AS DOUBLE), "
        f"CAST(_qi{i} * {step!r} AS DOUBLE)"
        for i, q in enumerate(qs))
    return (one.select(
        *group_cols,
        F.expr(f"stack({len(qs)}, {entries}) as (q, quantile_lb)"),
        F.col("_nn").alias("n"))
        .select(*group_cols, "q", "quantile_lb", "n"))


def quantile_rollup_duck(inner_sql: str, ts_col: str, value_col: str,
                         bucket_expr: str, qs: list[float],
                         step: float) -> str:
    """DuckDB mirror of ``quantile_partials`` cascaded + finalized by
    :func:`quantiles_from_bins`: ``bucket_expr`` is the DuckDB bucket
    over {ts} (e.g. ``time_bucket(INTERVAL 1 day, {ts})``) — the mirror
    replays quantize → count → cumulative rank pick exactly."""
    b = bucket_expr.format(ts=ts_col)
    # CAST to DOUBLE: bare 0.5/0.9/0.99 literals infer DECIMAL(3,2) in
    # DuckDB while the Spark side emits DOUBLE q — keep the DESCRIBE
    # dtypes aligned for the driver's dtype-sensitive value hash
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q!r} AS DOUBLE) AS q" for q in qs)
    return f"""
WITH src AS (SELECT * FROM ({inner_sql}) WHERE {value_col} IS NOT NULL),
bins AS (
  SELECT {b} AS bucket_ts,
         CAST(FLOOR(CAST({value_col} AS DOUBLE) / {step!r}) AS BIGINT)
           AS qbin,
         COUNT(*) AS cnt
  FROM src GROUP BY 1, 2),
cum AS (
  SELECT bucket_ts, qbin, cnt,
         SUM(cnt) OVER (PARTITION BY bucket_ts ORDER BY qbin
                        ROWS UNBOUNDED PRECEDING) AS c,
         SUM(cnt) OVER (PARTITION BY bucket_ts) AS n
  FROM bins),
qs_ AS ({q_rows})
SELECT c.bucket_ts, q.q,
       CAST(MIN(CASE WHEN c.c >= CEIL(c.n * q.q) THEN c.qbin END)
            * {step!r} AS DOUBLE) AS quantile_lb,
       CAST(MAX(c.n) AS BIGINT) AS n
FROM cum c CROSS JOIN qs_ q
GROUP BY c.bucket_ts, q.q
"""


# --------------------------------------- Gini concentration (Lorenz)

GINI_DP = 6


def gini_concentration(df: DataFrame, value_col: str,
                       group_cols: list[str]) -> DataFrame:
    """Per-group Gini coefficient of ``value_col`` — "how concentrated
    is order value within each region?", the one-number Lorenz-curve
    summary (0 = perfectly even, →1 = one row holds everything). The
    sorted-rank identity:

        G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)

    with x ascending and i the 1-based rank. Ties need no canonical
    order: a run of equal x contributes x·Σi over the run whatever the
    within-run order, so the statistic is deterministic even though
    row_number's tie order is not.

    Exactness: x stays DECIMAL end to end — i·x is an exact decimal
    product, all three sums are exact decimals, and only the final
    quotient drops to double (rounded ``GINI_DP``). The contract is
    ENFORCED: a non-decimal ``value_col`` raises — a double input would
    make ``total`` an order-dependent float64 sum that differs between
    engines at the last ulp (the round-13 driver-hash failure), so the
    caller must cast (the Benford pattern: ``decimal(18,2)``).
    Negative values are rejected up front (one cheap min-aggregate —
    Gini is undefined below zero); NULLs are excluded. Groups with
    n = 0 or Σx = 0 emit NULL gini.

    Output: (group_cols…, n, total, gini).

    Plan at 100 TB: one per-group ranking window + one per-group
    aggregate on the same partitioning — the winsorized-stats shape. A
    group's rows sort within one task (the per-key window contract
    documented across this module); for a single global group use a
    one-literal group column and accept the sort, or pre-aggregate to
    distinct values first."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty (add a literal "
                         "column for a global coefficient)")
    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, DecimalType):
        raise TypeError(
            f"gini_concentration requires a DECIMAL {value_col} (got "
            f"{vtype.simpleString()}): cast at the caller so every sum "
            "is exact and order-independent")
    x = F.col(value_col)
    src = df.filter(x.isNotNull()).select(*group_cols, value_col)
    neg = src.agg(F.min(x).alias("mn")).first()
    if neg["mn"] is not None and neg["mn"] < 0:
        raise ValueError(
            f"gini_concentration requires non-negative {value_col}; "
            f"found min={neg['mn']}")
    w = Window.partitionBy(*group_cols).orderBy(x)
    d12 = "decimal(12,0)"
    ranked = src.withColumn(
        "_ix", F.row_number().over(w).cast(d12) * x)
    out = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(value_col).alias("_s"),
        F.sum("_ix").alias("_is"))
    g = ((F.lit(2) * F.col("_is")
          - (F.col("n") + F.lit(1)).cast(d12) * F.col("_s")).cast("double")
         / (F.col("n").cast("double") * F.col("_s").cast("double")))
    # total: exact decimal sum cast to double AT OUTPUT (the
    # attribution-family pattern) — identical exact decimals cast to
    # identical doubles in both engines, unlike a float64 running sum
    # whose partial-aggregation order differs
    return out.select(
        *group_cols, "n",
        F.col("_s").cast("double").alias("total"),
        F.round(F.when(F.col("_s") != 0, g), GINI_DP).alias("gini"))


def gini_concentration_duck(inner_sql: str, value_col: str,
                            group_cols: list[str]) -> str:
    """DuckDB mirror of :func:`gini_concentration` — same rank identity,
    same exact-decimal sums, same final rounding."""
    gc = ", ".join(group_cols)
    return f"""
WITH gini_src AS (
  SELECT {gc}, {value_col} AS x FROM ({inner_sql})
  WHERE {value_col} IS NOT NULL),
ranked AS (
  SELECT {gc}, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY {gc} ORDER BY x)
              AS DECIMAL(12,0)) * x AS ix
  FROM gini_src),
agg AS (
  SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS s, SUM(ix) AS i_s
  FROM ranked GROUP BY {gc})
SELECT {gc}, n, CAST(s AS DOUBLE) AS total,
       ROUND(CASE WHEN s != 0 THEN
         CAST(2 * i_s - CAST(n + 1 AS DECIMAL(12,0)) * s AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) END, {GINI_DP}) AS gini
FROM agg
"""


# ------------------------------------------ Benford first-digit audit

BENFORD_DP = 6
BENFORD_TERM_DP = 9
BENFORD_P_DP = 12


def _benford_p() -> list[tuple[int, str]]:
    """(digit, p) with p = log10(1 + 1/d) quantized to 12-dp literals —
    Python-precomputed so neither engine's log10 enters the plan (the
    SES weight-table discipline)."""
    from decimal import ROUND_HALF_UP, Decimal
    import math
    return [(d, str(Decimal(math.log10(1.0 + 1.0 / d))
                    .quantize(Decimal(f"1e-{BENFORD_P_DP}"),
                              rounding=ROUND_HALF_UP)))
            for d in range(1, 10)]


def benford_audit(df: DataFrame, value_col: str,
                  chi2_crit: float) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column —
    the classic fabricated-data screen (Benford 1938; Nigrini 1996 for
    the audit use): natural multiplicative data puts digit d first with
    probability log10(1 + 1/d); invented numbers don't.

    The first significant digit comes from the value's DECIMAL string
    (``regexp_extract(CAST(x AS STRING), '[1-9]', 0)``) — positional
    notation is identical in both engines, where a floor(log10)
    formulation would hinge on libm's last ulp at exact powers of ten.
    The input column must therefore be DECIMAL (the caller casts;
    doubles stringify differently per engine and are rejected).
    Values ≤ 0 and NULLs are excluded (no first significant digit).

    The goodness-of-fit chi-square uses Python-precomputed 12-dp
    literals for the Benford shares (neither engine's log10 runs), all
    NINE digits always present (a digit with zero observations
    contributes its whole expectation), terms quantized to 9-dp DECIMAL
    before the bounded 9-row sum, verdict at the caller's ``chi2_crit``
    (dof = 8 for the standard α=0.05 value 15.507).

    Output: 9 rows — (digit, n_d, share, benford_p, chi2, significant)
    with the table-level chi2/verdict repeated per row (the ann-contract
    shape: every column DuckDB-recomputable).

    Plan at 100 TB: one digit-grouped count over the scan (the only
    full-data exchange), then a ≤9-row grid join + bounded window."""
    dt = dict(df.dtypes)[value_col]
    if not dt.startswith("decimal"):
        raise ValueError(
            f"benford_audit needs a DECIMAL column (got {dt}): double "
            "stringification is engine-dependent; cast explicitly")
    spark = df.sparkSession
    obs = (df.filter(F.col(value_col) > 0)
           .withColumn("_d", F.regexp_extract(
               F.col(value_col).cast("string"), "[1-9]", 0).cast("int"))
           .groupBy("_d").agg(F.count(F.lit(1)).alias("n_d")))
    p_case = None
    for d, p in _benford_p():
        p_case = (F.when(F.col("digit") == d, F.lit(float(p)))
                  if p_case is None
                  else p_case.when(F.col("digit") == d, F.lit(float(p))))
    grid = (spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
            .join(obs.withColumnRenamed("_d", "digit"), "digit", "left")
            .withColumn("n_d", F.coalesce(F.col("n_d"), F.lit(0)))
            .withColumn("p", p_case))
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    g = grid.withColumn("n", F.sum("n_d").over(w_all))
    nd = F.col("n_d").cast("double")
    e = F.col("n").cast("double") * F.col("p")
    dec = f"decimal(28,{BENFORD_TERM_DP})"
    # n = 0 (no positive values) would make every term 0/0 — NaN, which
    # Spark's decimal cast nulls but DuckDB's ERRORS on; gate the term
    # so both engines emit NULL chi2 and a False verdict
    term = F.when(F.col("n") > 0,
                  F.round((nd - e) * (nd - e) / e, BENFORD_TERM_DP)
                  .cast(dec))
    g = g.withColumn("_chi2", F.sum(term).over(w_all))
    return (g.select(
        "digit",
        F.col("n_d").cast("bigint").alias("n_d"),
        F.round(F.when(F.col("n") > 0, nd / F.col("n").cast("double")),
                BENFORD_DP).alias("share"),
        F.col("p").alias("benford_p"),
        F.round(F.col("_chi2"), BENFORD_DP).cast("double").alias("chi2"),
        F.coalesce(F.col("_chi2") > F.lit(chi2_crit), F.lit(False))
        .alias("significant"))
        .orderBy("digit"))


def benford_audit_duck(inner_sql: str, value_col: str,
                       chi2_crit: float) -> str:
    """DuckDB mirror of :func:`benford_audit` — same string digit
    extraction, same 12-dp Benford literals, same 9-dp term
    quantization."""
    dp, odp = BENFORD_TERM_DP, BENFORD_DP
    p_case = " ".join(f"WHEN {d} THEN {p}" for d, p in _benford_p())
    return f"""
WITH bf_src AS (
  SELECT CAST(regexp_extract(CAST({value_col} AS VARCHAR), '[1-9]', 0)
              AS INT) AS digit
  FROM ({inner_sql}) WHERE {value_col} > 0),
obs AS (SELECT digit, COUNT(*) AS n_d FROM bf_src GROUP BY digit),
grid AS (
  SELECT g.digit, COALESCE(obs.n_d, 0) AS n_d,
         CASE g.digit {p_case} END AS p
  FROM (SELECT UNNEST(GENERATE_SERIES(1, 9)) AS digit) g
  LEFT JOIN obs ON obs.digit = g.digit),
tot AS (SELECT SUM(n_d) AS n FROM grid),
terms AS (
  SELECT g.digit, g.n_d, g.p, t.n,
         CASE WHEN t.n > 0 THEN CAST(ROUND(
           (CAST(g.n_d AS DOUBLE) - CAST(t.n AS DOUBLE) * g.p)
           * (CAST(g.n_d AS DOUBLE) - CAST(t.n AS DOUBLE) * g.p)
           / (CAST(t.n AS DOUBLE) * g.p), {dp}) AS DECIMAL(28,{dp}))
         END AS term
  FROM grid g, tot t),
x AS (SELECT SUM(term) AS chi2u FROM terms)
SELECT t.digit,
       CAST(t.n_d AS BIGINT) AS n_d,
       ROUND(CASE WHEN t.n > 0
             THEN CAST(t.n_d AS DOUBLE) / CAST(t.n AS DOUBLE) END, {odp})
         AS share,
       t.p AS benford_p,
       CAST(ROUND(x.chi2u, {odp}) AS DOUBLE) AS chi2,
       COALESCE(x.chi2u > {chi2_crit}, FALSE) AS significant
FROM terms t, x
ORDER BY t.digit
"""


# ----------------------------------- categorical entropy / impurity

ENTROPY_TERM_DP = 9
ENTROPY_DP = 6


def column_entropy(df: DataFrame, value_col: str,
                   group_cols: list[str] | None = None) -> DataFrame:
    """Shannon entropy + Gini impurity of a categorical column, per
    group — the information-content profile beside the histogram's
    shape and gini_concentration's magnitude inequality ("how
    SPREAD are the categories?" — a near-constant partition key is a
    skew hazard, a near-uniform one shards well; the same number is
    the split-quality score a feature audit reads):

        H = ln N − (Σ n_i·ln n_i)/N          (nats)
        H_norm = H / ln m                    (m = distinct values)
        gini_impurity = 1 − Σ (n_i/N)²

    Output: (group..., n, n_distinct, entropy, entropy_norm,
    gini_impurity); a single-valued group has entropy 0 with NULL
    entropy_norm (ln 1 = 0 — normalization undefined, the zero-variance
    contract). NULL values are excluded (the l-diversity stance — an
    unknown category carries no identifiable mass); all-NULL groups
    vanish with them.

    Exactness: counts are exact integers; each n_i·ln n_i and
    (n_i/N)² term quantizes to 9-dp DECIMAL before its per-group sum
    (the chi2 discipline — order-independent), and the final ln/ratio
    expressions are identical IEEE forms in both engines, rounded at
    6 dp.

    Plan at 100 TB: ONE (group, value) partial+final aggregate over
    the scan, then a (group)-grouped fold over the value frame —
    everything after the first aggregate is |groups|·m-bounded."""
    groups = list(group_cols or [])
    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(*groups, F.col(value_col).alias("_v"))
              .agg(F.count(F.lit(1)).alias("_c")))
    dec9 = f"decimal(30,{ENTROPY_TERM_DP})"
    nlogn = F.round(F.col("_c").cast("double")
                    * F.log(F.col("_c").cast("double")),
                    ENTROPY_TERM_DP).cast(dec9)
    agg = (counts.groupBy(*groups)
           .agg(F.sum("_c").cast("bigint").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                F.sum(nlogn).alias("_sl")))
    # the squared-share terms need N first — so the shares fold
    # re-reads the m-bounded counts frame joined (broadcast,
    # NULL-safe on the group keys — a NULL group is its own group)
    # against the |groups|-row totals
    n = F.col("n").cast("double")
    ent = F.when(F.col("n") > 0,
                 F.log(n) - F.col("_sl").cast("double") / n)
    base = agg.select(*groups, "n", "n_distinct", ent.alias("_h"))

    def _nullsafe_join(left, right):
        if not groups:
            return left.crossJoin(F.broadcast(right))
        r = right.select(
            *[F.col(c).alias(f"_j_{c}") for c in groups],
            *[c for c in right.columns if c not in groups])
        cond = None
        for c in groups:
            e = left[c].eqNullSafe(F.col(f"_j_{c}"))
            cond = e if cond is None else (cond & e)
        return (left.join(F.broadcast(r), cond)
                .drop(*[f"_j_{c}" for c in groups]))

    sq = F.round(
        (F.col("_c").cast("double") / F.col("n"))
        * (F.col("_c").cast("double") / F.col("n")),
        ENTROPY_TERM_DP).cast(dec9)
    gini = (_nullsafe_join(counts, base.select(*groups, "n"))
            .groupBy(*groups).agg(F.sum(sq).alias("_sq")))
    out = _nullsafe_join(base, gini.select(*groups, "_sq")) \
        if groups else base.crossJoin(F.broadcast(gini))
    hnorm = F.when(F.col("n_distinct") > 1,
                   F.col("_h") / F.log(F.col("n_distinct")
                                       .cast("double")))
    return out.select(
        *groups, "n", "n_distinct",
        F.round(F.col("_h"), ENTROPY_DP).alias("entropy"),
        F.round(hnorm, ENTROPY_DP).alias("entropy_norm"),
        F.round(F.lit(1.0) - F.col("_sq").cast("double"),
                ENTROPY_DP).alias("gini_impurity"))


def column_entropy_duck(inner_sql: str, value_col: str,
                        group_cols: list[str] | None = None) -> str:
    """DuckDB mirror of :func:`column_entropy` — identical 9-dp term
    quantization and ln forms."""
    dp, odp = ENTROPY_TERM_DP, ENTROPY_DP
    groups = list(group_cols or [])
    gs = ", ".join(groups)
    gpfx = f"{gs}, " if groups else ""
    gby = f"GROUP BY {gs}" if groups else ""
    on = (" ON " + " AND ".join(
        f"c.{g} IS NOT DISTINCT FROM a.{g}" for g in groups)
        if groups else " ON TRUE")
    return f"""
WITH ce0 AS (SELECT * FROM ({inner_sql})
             WHERE {value_col} IS NOT NULL),
c AS (SELECT {gpfx}{value_col} AS _v, COUNT(*) AS _c
      FROM ce0 GROUP BY {gpfx}{value_col}),
a AS (SELECT {gpfx}CAST(SUM(_c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             SUM(CAST(ROUND(_c * LN(CAST(_c AS DOUBLE)), {dp})
                      AS DECIMAL(30,{dp}))) AS sl
      FROM c {gby}),
g AS (SELECT {("a." + ", a.".join(groups) + ", ") if groups else ""}
             SUM(CAST(ROUND((c._c / CAST(a.n AS DOUBLE))
                            * (c._c / CAST(a.n AS DOUBLE)), {dp})
                      AS DECIMAL(30,{dp}))) AS sq
      FROM c JOIN a{on}
      {("GROUP BY a." + ", a.".join(groups)) if groups else ""}),
j AS (SELECT a.*, g.sq FROM a JOIN g{on.replace("c.", "g.")})
SELECT {gpfx}n, n_distinct,
       ROUND(LN(CAST(n AS DOUBLE)) - CAST(sl AS DOUBLE) / n, {odp})
         AS entropy,
       ROUND(CASE WHEN n_distinct > 1
             THEN (LN(CAST(n AS DOUBLE)) - CAST(sl AS DOUBLE) / n)
                  / LN(CAST(n_distinct AS DOUBLE)) END, {odp})
         AS entropy_norm,
       ROUND(1.0 - CAST(sq AS DOUBLE), {odp}) AS gini_impurity
FROM j
"""


# --------------------------------- Herfindahl-Hirschman concentration

HHI_DP = 6


def hhi_concentration(df: DataFrame, value_col: str,
                      member_cols: list[str],
                      group_cols: list[str]) -> DataFrame:
    """Per-group Herfindahl–Hirschman index — the market-concentration
    twin of :func:`gini_concentration` (Gini asks "how UNEVEN?", HHI
    asks "how FEW hold it?"): members are the ``member_cols``
    combinations inside each group, shares are their value fractions,

        HHI = Σ_m share_m²  =  Σ_m v_m² / (Σ_m v_m)²   ∈ (1/M, 1]

    plus the size-adjusted normalized form
    (HHI − 1/M) / (1 − 1/M) for M ≥ 2 (NULL at M = 1 — a one-member
    group is degenerately concentrated). NULL member values are
    excluded; groups whose total is 0 emit NULL hhi.

    Exactness (the gini contract, ENFORCED the same way): ``value_col``
    must be DECIMAL, so v_m and both sums are exact decimals; the
    single division runs on floor-split doubles
    (``util.dec_to_double``) — engine-identical at any magnitude.

    Plan at 100 TB: two chained partial+final aggregates on prefixes of
    one grouping key (members, then groups) — no window, no join."""
    from flink_rag_spark.operators.util import dec_to_double

    if not member_cols or not group_cols:
        raise ValueError("member_cols and group_cols must be non-empty")
    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, DecimalType):
        raise TypeError(
            f"hhi_concentration requires a DECIMAL {value_col} (got "
            f"{vtype.simpleString()}): cast at the caller so the share "
            "sums are exact and order-independent")
    x = F.col(value_col)
    members = (df.filter(x.isNotNull())
               .groupBy(*group_cols, *member_cols)
               .agg(F.sum(value_col).alias("_v")))
    g = members.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_q"))
    s_d = dec_to_double(F.col("_s"))
    hhi = F.when(F.col("_s") != 0,
                 dec_to_double(F.col("_q")) / (s_d * s_d))
    m = F.col("n_members").cast("double")
    norm = F.when(F.col("n_members") >= 2,
                  (hhi - 1.0 / m) / (1.0 - 1.0 / m))
    return g.select(
        *group_cols, "n_members",
        F.round(hhi, HHI_DP).alias("hhi"),
        F.round(norm, HHI_DP).alias("hhi_normalized"))


def hhi_concentration_duck(inner_sql: str, value_col: str,
                           member_cols: list[str],
                           group_cols: list[str]) -> str:
    """DuckDB mirror of :func:`hhi_concentration` — same exact decimal
    sums, same floor-split double division."""
    from flink_rag_spark.operators.util import dec_to_double_duck

    gc = ", ".join(group_cols)
    mc = ", ".join(member_cols)
    s_d = dec_to_double_duck("s")
    q_d = dec_to_double_duck("q")
    return f"""
WITH hhi_src AS (
  SELECT {gc}, {mc}, {value_col} AS x FROM ({inner_sql})
  WHERE {value_col} IS NOT NULL),
members AS (
  SELECT {gc}, {mc}, SUM(x) AS v
  FROM hhi_src GROUP BY {gc}, {mc}),
g AS (
  SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n_members,
         SUM(v) AS s, SUM(v * v) AS q
  FROM members GROUP BY {gc}),
stat AS (
  SELECT {gc}, n_members,
         CASE WHEN s != 0 THEN {q_d} / ({s_d} * {s_d}) END AS hhi
  FROM g)
SELECT {gc}, n_members,
       ROUND(hhi, {HHI_DP}) AS hhi,
       ROUND(CASE WHEN n_members >= 2 THEN
         (hhi - 1.0 / n_members) / (1.0 - 1.0 / n_members) END,
         {HHI_DP}) AS hhi_normalized
FROM stat
"""


# --------------------------------------------------- RFM segmentation

RFM_TILES = 5


def rfm_scores(df: DataFrame, key_col: str, ts_col: str,
               value_col: str, n_tiles: int = RFM_TILES) -> DataFrame:
    """RFM customer segmentation — the classic recency / frequency /
    monetary scoring every marketing pipeline starts from: each key's
    three dimensions score 1..``n_tiles`` by VALUE-QUANTILE position,

        score(v) = ⌈ n_tiles · |{keys with dim ≤ v}| / N ⌉

    (higher = better on every dimension — later last-activity, more
    events, more value; ties share a value so they share a score — the
    deterministic tie contract, unlike ntile's arbitrary tie split).
    Output: (key, recency_ts, frequency, monetary, r_score, f_score,
    m_score, rfm_segment) with the segment as the "RFM" digit string.

    NULL contract: NULL keys are excluded, and a key whose recency
    (all timestamps NULL) or monetary (all values NULL) dimension is
    NULL is EXCLUDED from the output — a NULL dimension has no quantile
    position, and both engines' equi-joins drop it identically (the
    gini/hhi explicit-NULL-handling discipline). Pre-filter or
    COALESCE upstream to score such keys.


    Exactness: frequency is an integer, monetary an exact decimal sum
    (value quantized to 6 dp) emitted through the floor-split double
    cast; every score is PURE INTEGER arithmetic — ceil(a/b) as
    (a + b − 1) div b on exact cumulative counts — so the whole frame
    is engine-identical by construction.

    Plan at 100 TB: one per-key aggregate, then per DIMENSION a
    |distinct values|-bounded count frame ranked by the KS distributed
    prefix sum (range partitions + broadcast offsets — the spearman
    machinery, no global sort) and joined back on the value. Three
    small joins on an aggregate-sized frame. The three rank frames
    persist for the plan's duration; call
    ``operators.util.unpersist_cached_deps(result)`` after
    materializing (looping callers — bench does)."""
    from flink_rag_spark.operators.util import dec_to_double

    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vdec = F.col(value_col).cast("double").cast("decimal(20,6)")
    stats = (df.filter(F.col(key_col).isNotNull())
             .groupBy(F.col(key_col).alias("key"))
             .agg(F.max(ts_col).alias("recency_ts"),
                  F.count(F.lit(1)).cast("bigint").alias("frequency"),
                  F.sum(vdec).alias("_mon")))

    pinned: list[DataFrame] = []

    def cum_scores(dim: str, out: str) -> DataFrame:
        per_v = (stats.groupBy(F.col(dim).alias("_v"))
                 .agg(F.count(F.lit(1)).alias("_t")))
        part = (per_v.repartitionByRange(nparts, "_v")
                .withColumn("_pid", F.spark_partition_id())
                .persist())
        pinned.append(part)
        w_pid = Window.orderBy("_pid")
        offs = (part.groupBy("_pid").agg(F.sum("_t").alias("_pt"))
                .select("_pid",
                        F.coalesce(F.sum("_pt").over(
                            w_pid.rowsBetween(Window.unboundedPreceding,
                                              -1)),
                            F.lit(0)).alias("_off"),
                        F.sum("_pt").over(
                            w_pid.rowsBetween(Window.unboundedPreceding,
                                              Window.unboundedFollowing))
                        .alias("_n")))
        w_local = (Window.partitionBy("_pid").orderBy("_v")
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
        cum = F.sum("_t").over(w_local) + F.col("_off")
        # integer ceil: (k·cum + N − 1) div N — Spark's `/` on bigints
        # is double division, exact here (products ≪ 2^53), floored
        score = F.floor((F.lit(n_tiles).cast("bigint") * cum
                         + F.col("_n") - F.lit(1))
                        / F.col("_n")).cast("int")
        return (part.join(F.broadcast(offs), "_pid")
                .select(F.col("_v").alias(dim), score.alias(out)))

    out = stats
    for dim, sc in (("recency_ts", "r_score"), ("frequency", "f_score"),
                    ("_mon", "m_score")):
        out = out.join(cum_scores(dim, sc), on=dim)
    from flink_rag_spark.operators.util import track_cached_deps
    return track_cached_deps(out.select(
        "key", "recency_ts", "frequency",
        F.round(dec_to_double(F.col("_mon")), 2).alias("monetary"),
        "r_score", "f_score", "m_score",
        F.concat(F.col("r_score").cast("string"),
                 F.col("f_score").cast("string"),
                 F.col("m_score").cast("string")).alias("rfm_segment")),
        pinned)


def rfm_scores_duck(inner_sql: str, key_col: str, ts_col: str,
                    value_col: str, n_tiles: int = RFM_TILES) -> str:
    """DuckDB mirror of :func:`rfm_scores` — global windows stand in
    for the distributed prefix sums, same integer-ceil scores."""
    from flink_rag_spark.operators.util import dec_to_double_duck

    mon_d = dec_to_double_duck("_mon")

    def dim_cte(dim, name):
        return f"""
{name} AS (
  SELECT _v, CAST(FLOOR((CAST({n_tiles} AS BIGINT) * cum + n - 1)
                        / CAST(n AS DOUBLE)) AS INT) AS score
  FROM (
    SELECT _v,
           SUM(_t) OVER (ORDER BY _v ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(_t) OVER () AS n
    FROM (SELECT {dim} AS _v, COUNT(*) AS _t
          FROM rfm_stats GROUP BY {dim})))"""
    return f"""
WITH rfm_stats AS (
  SELECT {key_col} AS key, MAX({ts_col}) AS recency_ts,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))
           AS _mon
  FROM ({inner_sql}) WHERE {key_col} IS NOT NULL
  GROUP BY {key_col}),
{dim_cte("recency_ts", "rs")},
{dim_cte("frequency", "fs")},
{dim_cte("_mon", "ms")}
SELECT s.key, s.recency_ts, s.frequency,
       ROUND({mon_d}, 2) AS monetary,
       rs.score AS r_score, fs.score AS f_score, ms.score AS m_score,
       CAST(rs.score AS VARCHAR) || CAST(fs.score AS VARCHAR)
         || CAST(ms.score AS VARCHAR) AS rfm_segment
FROM rfm_stats s
JOIN rs ON s.recency_ts = rs._v
JOIN fs ON s.frequency = fs._v
JOIN ms ON s._mon = ms._v
"""


# ------------------------------- Theil / Atkinson inequality indexes

THEIL_TERM_DP = 9
THEIL_MEAN_DP = 6


def inequality_indexes(df: DataFrame, value_col: str,
                       group_cols: list[str]) -> DataFrame:
    """Per-group Theil index and Atkinson index (ε = 1) — the
    ENTROPY-family inequality measures beside the graded Gini (Gini
    weights transfers by rank distance; Theil is additively
    decomposable across subgroups, Atkinson carries an explicit
    inequality-aversion welfare reading):

        Theil    T = (1/n)·Σ (x/μ)·ln(x/μ)        (0 = even)
        Atkinson A = 1 − geomean(x)/μ             (ε = 1 form)

    Output: (group_cols…, n, mean, theil, atkinson). The DECIMAL
    contract is ENFORCED like gini (cast at the caller); negative
    values are rejected up front (one cheap min-aggregate — both
    indexes are undefined below zero); NULLs are excluded; zero values
    contribute their x·ln x → 0 limit to Theil and force the geomean
    to 0 (A = 1, flagged by construction); an all-zero group (μ = 0)
    emits NULL indexes.

    Exactness: μ is the quantized-center chart — exact decimal sum
    through the floor-split cast, rounded ``THEIL_MEAN_DP`` BEFORE the
    per-row terms (the brown_forsythe discipline); each term quantizes
    to ``THEIL_TERM_DP``-dp DECIMAL before the group sum
    (order-independent, the jarque_bera discipline).

    Plan at 100 TB: one grouped aggregate (means), one broadcast join
    back, one grouped term aggregate — two scans, no window."""
    from pyspark.sql.types import DecimalType

    from flink_rag_spark.operators.util import dec_to_double

    if not group_cols:
        raise ValueError("group_cols must be non-empty (add a literal "
                         "column for global indexes)")
    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, DecimalType):
        raise TypeError(
            f"inequality_indexes requires a DECIMAL {value_col} (got "
            f"{vtype.simpleString()}): cast at the caller so the mean's "
            "sum is exact and order-independent (the gini contract)")
    x = F.col(value_col)
    src = df.filter(x.isNotNull()).select(*group_cols, value_col)
    neg = src.agg(F.min(x).alias("mn")).first()
    if neg["mn"] is not None and neg["mn"] < 0:
        raise ValueError(
            f"inequality_indexes requires non-negative {value_col}; "
            f"found min={neg['mn']}")
    means = (src.groupBy(*group_cols)
             .agg(F.round(dec_to_double(F.sum(x))
                          / F.count(F.lit(1)).cast("double"),
                          THEIL_MEAN_DP).alias("_mu")))
    ren = means
    for g in group_cols:
        ren = ren.withColumnRenamed(g, f"_g_{g}")
    cond = None
    for g in group_cols:
        c = src[g].eqNullSafe(F.col(f"_g_{g}"))
        cond = c if cond is None else (cond & c)
    j = src.join(F.broadcast(ren), cond)
    xd = x.cast("double")
    mu = F.col("_mu")
    tdec = f"decimal(24,{THEIL_TERM_DP})"
    theil_term = F.when((xd > 0) & (mu > 0),
                        F.round((xd / mu) * F.log(xd / mu),
                                THEIL_TERM_DP)).otherwise(F.lit(0.0))
    ln_term = F.when(xd > 0, F.round(F.log(xd), THEIL_TERM_DP))
    out = j.groupBy(*[F.col(f"_g_{g}").alias(g) for g in group_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("_mu").alias("_mean"),
        F.sum(theil_term.cast(tdec)).alias("_t"),
        F.sum(ln_term.cast(tdec)).alias("_ln"),
        F.sum(F.when(xd <= 0, 1).otherwise(0)).alias("_nz"))
    n = F.col("n").cast("double")
    mu_o = F.col("_mean")
    theil = F.when(mu_o > 0, dec_to_double(F.col("_t")) / n)
    geo = F.when(F.col("_nz") > 0, F.lit(0.0)).otherwise(
        F.exp(dec_to_double(F.coalesce(
            F.col("_ln"), F.lit(0).cast(tdec))) / n))
    atk = F.when(mu_o > 0, F.lit(1.0) - geo / mu_o)
    return out.select(
        *group_cols, "n",
        mu_o.alias("mean"),
        F.round(theil, GINI_DP).alias("theil"),
        F.round(atk, GINI_DP).alias("atkinson"))


def inequality_indexes_duck(inner_sql: str, value_col: str,
                            group_cols: list[str]) -> str:
    """DuckDB mirror of :func:`inequality_indexes` — same quantized
    mean, quantized terms, zero/NULL contracts."""
    from flink_rag_spark.operators.util import dec_to_double_duck

    gc = ", ".join(group_cols)
    on = " AND ".join(
        f"s.{g} IS NOT DISTINCT FROM m.{g}" for g in group_cols)
    mgc = ", ".join(f"m.{g}" for g in group_cols)
    dp, odp = THEIL_TERM_DP, GINI_DP
    return f"""
WITH iq_src AS (
  SELECT {gc}, {value_col} AS x FROM ({inner_sql})
  WHERE {value_col} IS NOT NULL),
iq_mu AS (
  SELECT {gc},
         ROUND({dec_to_double_duck('SUM(x)')}
               / CAST(COUNT(*) AS DOUBLE), {THEIL_MEAN_DP}) AS mu
  FROM iq_src GROUP BY {gc}),
iq_j AS (
  SELECT {mgc}, m.mu, CAST(s.x AS DOUBLE) AS xd
  FROM iq_src s JOIN iq_mu m ON {on}),
iq_agg AS (
  SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n, MAX(mu) AS mu,
         SUM(CAST(CASE WHEN xd > 0 AND mu > 0
                  THEN ROUND((xd / mu) * LN(xd / mu), {dp})
                  ELSE 0.0 END AS DECIMAL(24,{dp}))) AS t,
         SUM(CAST(CASE WHEN xd > 0 THEN ROUND(LN(xd), {dp}) END
                  AS DECIMAL(24,{dp}))) AS lns,
         SUM(CASE WHEN xd <= 0 THEN 1 ELSE 0 END) AS nz
  FROM iq_j GROUP BY {gc})
SELECT {gc}, n, mu AS mean,
       ROUND(CASE WHEN mu > 0
             THEN {dec_to_double_duck('t')} / CAST(n AS DOUBLE) END,
             {odp}) AS theil,
       ROUND(CASE WHEN mu > 0 THEN
         1.0 - (CASE WHEN nz > 0 THEN 0.0 ELSE
                EXP({dec_to_double_duck("COALESCE(lns, CAST(0 AS DECIMAL(24," + str(dp) + ")))")}
                    / CAST(n AS DOUBLE)) END) / mu END, {odp})
         AS atkinson
FROM iq_agg
"""
