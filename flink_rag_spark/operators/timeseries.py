"""Time-series gap filling — the hypertable `time_bucket_gapfill` /
`locf` / `interpolate` surface (ABSENT in the reference, which has no event
time at all: `AiJob.java:38` opts out of watermarks; part of the
generalized analytics surface SURVEY.md §2.2 requires).

Given a bucketed series with holes (buckets nobody observed), produce the
dense per-key grid and fill each hole two ways:

- ``locf`` — last observation carried forward (step interpolation);
- ``interp`` — linear interpolation between the nearest observed
  neighbors, weighted by time distance.

Spark-first shape:

- the grid is ``sequence(min_bucket, max_bucket, step)`` + ``explode`` per
  key — a narrow generate, no shuffle, sized buckets-per-key;
- the fill is two RUNNING window frames per key (the "previous
  observation" side over the ascending bucket sort, the "next
  observation" side over the descending one). Running
  (unboundedPreceding → currentRow) frames are evaluated incrementally —
  O(rows) — where a (currentRow → unboundedFollowing) frame re-aggregates
  the tail for every row, O(rows²) per key (measured 10× wall-clock on
  ~600-bucket keys). The two sorts share one key exchange; the obs side
  of the grid join broadcasts when small and co-partitions when not;
- no Python anywhere: sequence/explode/last-ignorenulls/first-ignorenulls
  are all Catalyst expressions inside whole-stage codegen.

At 100 TB: everything is per-key windows — scales with keys × buckets, not
events. The hazard is a SPARSE key with a huge time range (one event in
2001, one in 2025 → millions of grid rows): ``max_buckets`` caps the
per-key explosion and fails loudly instead of OOMing an executor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: refuse to generate more than this many grid rows for one key (a sparse
#: key spanning years at fine steps is almost always a data bug; raise the
#: cap deliberately if it isn't)
MAX_BUCKETS_PER_KEY = 1_000_000


def gapfill_locf_interp(series: DataFrame, keys: list[str], bucket_col: str,
                        value_col: str, step: str = "1 hour",
                        max_buckets: int = MAX_BUCKETS_PER_KEY,
                        round_dp: int = 4) -> DataFrame:
    """Fill gaps in a bucketed series.

    ``series`` must hold one row per (keys, bucket) with an aggregated
    ``value_col`` (the caller owns the bucketing aggregation — typically
    ``groupBy(keys, date_trunc(...)).agg(...)``). Returns the dense grid
    from each key's min to max bucket with columns: keys, bucket,
    ``value_col`` (null in gaps), ``locf``, ``interp`` (both rounded to
    ``round_dp``).

    Grid edges always carry observations (each key's grid spans its own
    observed min..max), so ``locf`` and ``interp`` are never null. Interior
    semantics: at an observed bucket both equal the observation; in a gap
    ``locf`` repeats the previous observation and ``interp`` draws the
    line between the neighbors, weighted by bucket-epoch distance."""
    b, v = F.col(bucket_col), F.col(value_col)

    bounds = (series.groupBy(*keys)
              .agg(F.min(bucket_col).alias("_b0"),
                   F.max(bucket_col).alias("_b1")))
    # fail loudly on pathological sparse keys rather than exploding memory:
    # sequence() itself errors out past Spark's element cap, but that cap
    # (MAX_ROUNDED_ARRAY_LENGTH ≈ 2^31) is far beyond what one task should
    # materialize. The budget check rides INSIDE the grid expression
    # (raise_error folded into the sequence end bound), so it costs no
    # extra job / scan / persisted frame — the plan stays one pass and the
    # guard fires on exactly the offending key.
    step_n, step_unit = step.split()
    supported_units = ("second", "minute", "hour", "day", "week")
    unit = step_unit.rstrip("s")
    if unit not in supported_units:
        raise ValueError(
            f"unsupported gapfill step unit {step_unit!r}; supported: "
            f"{sorted(supported_units)} (singular or plural)")
    # count in the SAME calendar units sequence() steps in (timestampdiff
    # is ChronoUnit-based): unix-second arithmetic would drift off by one
    # at the cap boundary across DST transitions for day/week steps
    n_buckets = (f"(timestampdiff({unit.upper()}, _b0, _b1) "
                 f"DIV {int(step_n)} + 1)")
    guarded_end = (
        f"CASE WHEN {n_buckets} > {max_buckets} THEN "
        f"raise_error(concat('gapfill would generate ', "
        f"CAST({n_buckets} AS STRING), ' buckets for one key (cap "
        f"{max_buckets}); widen `step` or raise `max_buckets`')) "
        f"ELSE _b1 END")
    grid = bounds.select(*keys,
                         F.explode(F.expr(
                             f"sequence(_b0, {guarded_end}, "
                             f"interval {step})"))
                         .alias(bucket_col))

    filled = grid.join(series, on=[*keys, bucket_col], how="left")
    # BOTH fill directions use running (unboundedPreceding → currentRow)
    # frames, the "next observation" side over a DESCENDING sort: Spark
    # evaluates running frames incrementally (O(rows)), while a
    # (currentRow → unboundedFollowing) frame re-aggregates the remaining
    # rows for every row — O(rows²) per key, measured 10× wall-clock on
    # ~600-bucket keys. Two local sorts of the same key partitioning
    # replace the quadratic frame; no extra exchange.
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    wd = Window.partitionBy(*keys).orderBy(F.desc(bucket_col))
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    back_desc = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(back)
    next_v = F.last(v, ignorenulls=True).over(back_desc)
    next_t = F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(back_desc)
    frac = ((F.unix_timestamp(b) - F.unix_timestamp(prev_t))
            / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)))
    interp = (F.when(v.isNotNull(), v)
              .when(next_t == prev_t, prev_v)          # trailing edge guard
              .otherwise(prev_v + (next_v - prev_v) * frac))
    # locf is a copy of an (already caller-rounded) observation — rounding
    # it is exact. interp is COMPUTED (mul+add of doubles): engines may
    # fuse the multiply-add (FMA), shifting the result ~1 ulp, and a
    # decimal ROUND sitting on a .5 boundary would amplify that invisible
    # difference into the rounded digit — so interp ships unrounded and
    # comparison-layer float canonicalization (%.9g) absorbs ulp noise.
    return filled.select(
        *keys, bucket_col, value_col,
        F.round(prev_v, round_dp).alias("locf"),
        interp.alias("interp"))


def time_weighted_avg(df: DataFrame, ts_col: str, value_col: str,
                      keys: list[str], bucket: str = "1 day",
                      order_tiebreak: str | None = None,
                      round_dp: int = 4) -> DataFrame:
    """Time-weighted average per (keys, bucket) for IRREGULAR samples —
    the hypertable ``time_weight('LOCF')`` surface. A plain AVG
    over-weights bursts; here each observation's value holds until the
    next observation (step/LOCF semantics), so its weight is the seconds
    until that next sample — the bucket's last sample extends to the
    bucket edge.

    Shape: one window (lead over the key+bucket sort — the same single
    exchange the gap-fill frames use) + one groupBy. The weighted sum
    accumulates in DECIMAL (value is decimal-cast, the weight is integer
    seconds), so partial-aggregate merge order can't drift the result —
    bit-stable against the SQL oracle like operators/rollup.py.

    ``order_tiebreak``: extra column breaking equal-timestamp ties so the
    per-row weights are deterministic (required whenever ts alone isn't
    unique per key).

    Returns (keys..., bucket_ts, twa, n_samples, covered_sec).
    """
    win = F.window(F.col(ts_col), bucket)
    b_start = win["start"].alias("bucket_ts")
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*keys, "bucket_ts").orderBy(*order)
    extra = [order_tiebreak] if order_tiebreak else []
    rows = (df.select(*keys, ts_col, value_col, *extra, b_start,
                      win["end"].alias("_b_end"))
            .withColumn(
                "_next", F.coalesce(F.lead(ts_col).over(w),
                                    F.col("_b_end")))
            .withColumn(
                "_dt", (F.unix_timestamp("_next")
                        - F.unix_timestamp(ts_col)).cast("bigint")))
    vdec = F.col(value_col).cast("decimal(18,2)")
    return (rows.groupBy(*keys, "bucket_ts")
            .agg(F.round((F.sum(vdec * F.col("_dt")).cast("double")
                          / F.sum("_dt")), round_dp).alias("twa"),
                 F.count(F.lit(1)).alias("n_samples"),
                 F.sum("_dt").alias("covered_sec")))


#: term-level quantization for decayed sums: each value·weight term is
#: rounded to this many decimals and summed as DECIMAL, so the partial-
#: aggregate merge order can't drift the result (same discipline as
#: time_weighted_avg's DECIMAL accumulation)
DECAY_TERM_DP = 6
DECAY_OUT_DP = 4


def time_decayed_stats(df: DataFrame, keys: list[str], ts_col: str,
                       value_col: str, ref_ts: str,
                       half_life_days: float = 7.0) -> DataFrame:
    """Exponentially time-decayed aggregates per key — the "recency
    weighting" primitive (retrieval freshness boosts, decayed activity
    scores, recency-weighted quality). Each observation contributes
    weight 2^(−age/half_life) where age is measured back from ``ref_ts``
    (a FIXED reference instant, so the result is reproducible — pass
    e.g. the snapshot watermark, never wall-clock now()).

    Returns (keys..., n_events, decayed_sum, decayed_weight,
    decayed_avg): ``decayed_sum`` = Σ value·w, ``decayed_weight`` = Σ w
    (the effective sample size), ``decayed_avg`` their ratio.

    Shape: ONE partial+final aggregate — the weight is a scalar
    expression on the scan (whole-stage codegen), each term is
    quantized to DECIMAL before summing so the sum is order-independent,
    and the only shuffle is the groupBy. Observations after ``ref_ts``
    are excluded (their weight would exceed 1)."""
    hl_us = half_life_days * 86_400_000_000.0
    # timestamp_diff accepts both TIMESTAMP and TIMESTAMP_NTZ columns
    # (events loads as NTZ under the oracle harness), unlike
    # unix_micros which rejects NTZ outright
    ref = F.lit(ref_ts).cast("timestamp_ntz")
    age_us = F.timestamp_diff("MICROSECOND", F.col(ts_col), ref)
    w = F.pow(F.lit(0.5), age_us.cast("double") / F.lit(hl_us))
    term = F.round(F.col(value_col).cast("double") * w,
                   DECAY_TERM_DP).cast("decimal(28,6)")
    wq = F.round(w, DECAY_TERM_DP).cast("decimal(28,6)")
    return (df.filter(F.col(ts_col) <= ref)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(term), DECAY_OUT_DP).cast("double")
                 .alias("decayed_sum"),
                 F.round(F.sum(wq), DECAY_OUT_DP).cast("double")
                 .alias("decayed_weight"),
                 F.round(F.sum(term).cast("double")
                         / F.sum(wq).cast("double"),
                         DECAY_OUT_DP).alias("decayed_avg")))


def time_decayed_stats_duck(inner_sql: str, keys: list[str], ts_col: str,
                            value_col: str, ref_ts: str,
                            half_life_days: float = 7.0) -> str:
    """DuckDB mirror of :func:`time_decayed_stats` — same microsecond
    ages, same 0.5^x weights, same DECIMAL term quantization."""
    ks = ", ".join(keys)
    hl_us = half_life_days * 86_400_000_000.0
    return f"""
WITH src AS (
  SELECT {ks},
         CAST(epoch_us(TIMESTAMP '{ref_ts}')
              - epoch_us({ts_col}) AS DOUBLE) AS age_us,
         CAST({value_col} AS DOUBLE) AS v
  FROM ({inner_sql})
  WHERE {ts_col} <= TIMESTAMP '{ref_ts}'),
terms AS (
  SELECT {ks},
         CAST(ROUND(v * POWER(0.5, age_us / {hl_us!r}),
                    {DECAY_TERM_DP}) AS DECIMAL(28,6)) AS term,
         CAST(ROUND(POWER(0.5, age_us / {hl_us!r}),
                    {DECAY_TERM_DP}) AS DECIMAL(28,6)) AS wq
  FROM src)
SELECT {ks}, COUNT(*) AS n_events,
       CAST(ROUND(SUM(term), {DECAY_OUT_DP}) AS DOUBLE) AS decayed_sum,
       CAST(ROUND(SUM(wq), {DECAY_OUT_DP}) AS DOUBLE) AS decayed_weight,
       ROUND(CAST(SUM(term) AS DOUBLE) / CAST(SUM(wq) AS DOUBLE),
             {DECAY_OUT_DP}) AS decayed_avg
FROM terms GROUP BY {ks}
"""


def time_decayed_at_latest(df: DataFrame, keys: list[str], ts_col: str,
                           value_col: str,
                           half_life_days: float = 7.0) -> DataFrame:
    """Per-key decayed aggregates anchored at EACH KEY'S OWN latest
    event (ref = max ts within the key) — the state a streaming decay
    monitor (`streaming/decay.py`) holds after folding the key's
    history: s = Σ value·0.5^((t_latest − t)/half_life).

    Shape: one window max over the key partitioning + the same
    quantized-DECIMAL aggregate as :func:`time_decayed_stats` — the
    window and the groupBy share a single key exchange.

    Returns (keys..., n_events, decayed_sum, decayed_weight, last_ts).
    """
    hl_us = half_life_days * 86_400_000_000.0
    w_key = Window.partitionBy(*keys)
    ref = F.max(ts_col).over(w_key)
    age_us = F.timestamp_diff("MICROSECOND", F.col(ts_col), ref)
    w = F.pow(F.lit(0.5), age_us.cast("double") / F.lit(hl_us))
    src = df.select(*keys, ts_col, value_col,
                    F.round(F.col(value_col).cast("double") * w,
                            DECAY_TERM_DP).cast("decimal(28,6)").alias("_t"),
                    F.round(w, DECAY_TERM_DP)
                    .cast("decimal(28,6)").alias("_w"))
    return (src.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("_t"), DECAY_OUT_DP).cast("double")
                 .alias("decayed_sum"),
                 F.round(F.sum("_w"), DECAY_OUT_DP).cast("double")
                 .alias("decayed_weight"),
                 F.max(ts_col).alias("last_ts")))


def time_decayed_at_latest_duck(inner_sql: str, keys: list[str],
                                ts_col: str, value_col: str,
                                half_life_days: float = 7.0) -> str:
    """DuckDB mirror of :func:`time_decayed_at_latest`."""
    ks = ", ".join(keys)
    hl_us = half_life_days * 86_400_000_000.0
    return f"""
WITH src AS (
  SELECT {ks}, {ts_col} AS ts,
         CAST({value_col} AS DOUBLE) AS v,
         MAX({ts_col}) OVER (PARTITION BY {ks}) AS ref
  FROM ({inner_sql})),
terms AS (
  SELECT {ks}, ts,
         CAST(ROUND(v * POWER(0.5,
               CAST(epoch_us(ref) - epoch_us(ts) AS DOUBLE) / {hl_us!r}),
               {DECAY_TERM_DP}) AS DECIMAL(28,6)) AS t,
         CAST(ROUND(POWER(0.5,
               CAST(epoch_us(ref) - epoch_us(ts) AS DOUBLE) / {hl_us!r}),
               {DECAY_TERM_DP}) AS DECIMAL(28,6)) AS w
  FROM src)
SELECT {ks}, COUNT(*) AS n_events,
       CAST(ROUND(SUM(t), {DECAY_OUT_DP}) AS DOUBLE) AS decayed_sum,
       CAST(ROUND(SUM(w), {DECAY_OUT_DP}) AS DOUBLE) AS decayed_weight,
       MAX(ts) AS last_ts
FROM terms GROUP BY {ks}
"""


#: SES default smoothing factor (the classic 0.3 — responsive but not
#: noise-chasing; callers tune per series)
SES_ALPHA = 0.3
#: weight-table quantization: 12 dp keeps ~80 non-zero lags at α = 0.3
SES_W_DP = 12


def _ses_weights(alpha: float) -> list[tuple[int, str, str]]:
    """(lag k, first-obs weight (1−α)^k, mid weight α·(1−α)^k) as
    12-dp DECIMAL STRINGS, computed ONCE in Python — both engines parse
    the same literals, so the weights are identical by construction
    (engine POWER agrees only to the last ulp, which round-11 measured
    landing a term exactly on a 6-dp boundary). The table ends where
    both weights quantize to zero; longer lags contribute exactly 0."""
    out = []
    k = 0
    while True:
        wf = round((1.0 - alpha) ** k, SES_W_DP)
        wm = round(alpha * (1.0 - alpha) ** k, SES_W_DP)
        if wf == 0.0 and wm == 0.0:
            break
        out.append((k, f"{wf:.{SES_W_DP}f}", f"{wm:.{SES_W_DP}f}"))
        k += 1
        if k > 200_000:  # unreachable for alpha in (0, 1]; safety stop
            break
    return out


def ses_forecast(df: DataFrame, keys: list[str], ts_col: str,
                 value_col: str, seq_col: str,
                 alpha: float = SES_ALPHA,
                 value_scale: int = 2) -> DataFrame:
    """Simple exponential smoothing per key — the one-step-ahead
    forecast s_n (Brown 1956; the level-only member of the Holt-Winters
    family): s_t = α·x_t + (1−α)·s_{t−1} with s_1 = x_1, over the key's
    observations ordered by (ts, seq). The recurrence has the CLOSED
    FORM

        s_n = (1−α)^(n−1)·x_1 + Σ_{i=2..n} α·(1−α)^(n−i)·x_i

    so the whole forecast is one window (row_number + count over the
    key) + one broadcast weight join + one aggregate — no iteration,
    no UDF.

    Exactness contract: values quantize to ``value_scale`` decimals and
    weights to 12 dp (a Python-precomputed DECIMAL literal table —
    engine POWER differs in the last ulp, measured to flip a 6-dp
    boundary), so every term is an EXACT decimal product, the sum is
    order-independent, and the final 6-dp round happens in decimal
    space (the decimal-boundary discipline). Lags beyond the table
    contribute exactly 0 — the weight a 12-dp SES assigns them anyway.

    Returns (keys..., n_obs, forecast). ``alpha`` must be in (0, 1]."""
    from decimal import Decimal

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    spark = df.sparkSession
    wtab = F.broadcast(spark.createDataFrame(
        [(k, Decimal(wf), Decimal(wm))
         for k, wf, wm in _ses_weights(alpha)],
        f"_k int, _wf decimal(14,{SES_W_DP}), "
        f"_wm decimal(14,{SES_W_DP})"))
    w_ord = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    w_key = Window.partitionBy(*keys)
    src = (df.withColumn("_rn", F.row_number().over(w_ord))
           .withColumn("_n", F.count(F.lit(1)).over(w_key))
           .withColumn("_k", (F.col("_n") - F.col("_rn")).cast("int")))
    vdec = F.col(value_col).cast(f"decimal(24,{value_scale})")
    weight = F.coalesce(
        F.when(F.col("_rn") == 1, F.col("_wf")).otherwise(F.col("_wm")),
        F.lit(0).cast(f"decimal(14,{SES_W_DP})"))
    return (src.join(wtab, on="_k", how="left")
            .select(*keys, (vdec * weight).alias("_t"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"),
                 F.round(F.sum("_t"), 6).cast("double")
                 .alias("forecast")))


#: Holt defaults: conventional smoothing levels (level like SES; the
#: trend updates slowly — β ≪ α is the standard guidance)
HOLT_ALPHA = 0.3
HOLT_BETA = 0.1


def _holt_weights(alpha: float, beta: float) -> list[tuple]:
    """Per-lag weight rows for Holt's linear method, 12-dp DECIMAL
    STRINGS computed ONCE in Python (the SES discipline — both engines
    parse identical literals, so engine POWER/matmul drift cannot
    exist by construction).

    Holt with seeds l_1 = x_1, b_1 = x_2 − x_1 is LINEAR in the
    observations: with state z_t = (l_t, b_t),

        z_t = M·z_{t−1} + u·x_t,  M = [[1−α, 1−α], [−αβ, 1−αβ]],
                                  u = (α, αβ)ᵀ

    and the seeds collapse to z_2 = (x_2, x_2 − x_1) exactly, so

        z_n = x_1·M^{n−2}(0,−1)ᵀ + x_2·M^{n−2}(1,1)ᵀ
              + Σ_{t=3..n} x_t·M^{n−t}·u.

    Row k carries the three weight PAIRS keyed by lag k = n − rn:
    (wl_m, wt_m) = M^k·u for mid observations (rn ≥ 3),
    (wl_s, wt_s) = M^k·(1,1)ᵀ for the second observation (rn = 2),
    (wl_f, wt_f) = M^{k−1}·(0,−1)ᵀ for the first (rn = 1; its matrix
    power is one less than its lag — zeros at k = 0, never joined).
    det(M) = 1−α, so ρ(M) ≤ √(1−α) < 1 and the table terminates; the
    eigenvalues can be COMPLEX (damped oscillation — weights may pass
    through zero and return), so termination tests the matrix norm,
    never a single row of zeros."""
    dp = SES_W_DP
    m = [[1.0 - alpha, 1.0 - alpha],
         [-alpha * beta, 1.0 - alpha * beta]]
    pk = [[1.0, 0.0], [0.0, 1.0]]          # M^k, starting at k = 0
    out = []
    k = 0
    while True:
        wl_m = round(pk[0][0] * alpha + pk[0][1] * alpha * beta, dp)
        wt_m = round(pk[1][0] * alpha + pk[1][1] * alpha * beta, dp)
        wl_s = round(pk[0][0] + pk[0][1], dp)
        wt_s = round(pk[1][0] + pk[1][1], dp)
        if k == 0:
            wl_f = wt_f = 0.0              # rn = 1 ⇒ k = n−1 ≥ 1
        else:
            wl_f = round(-pm[0][1], dp)    # M^{k−1}·(0,−1)ᵀ
            wt_f = round(-pm[1][1], dp)
        out.append((k,) + tuple(f"{w:.{dp}f}" for w in
                                (wl_f, wt_f, wl_s, wt_s, wl_m, wt_m)))
        fro = (pk[0][0] ** 2 + pk[0][1] ** 2
               + pk[1][0] ** 2 + pk[1][1] ** 2) ** 0.5
        # two digits below the quantum: M is non-normal, so ‖M^{k+j}‖
        # can transiently exceed ‖M^k‖·ρ^j — the margin absorbs any
        # such overshoot past the stop point
        if fro * 4.0 < 10.0 ** -(dp + 2):
            break
        pm = pk
        pk = [[pm[0][0] * m[0][0] + pm[0][1] * m[1][0],
               pm[0][0] * m[0][1] + pm[0][1] * m[1][1]],
              [pm[1][0] * m[0][0] + pm[1][1] * m[1][0],
               pm[1][0] * m[0][1] + pm[1][1] * m[1][1]]]
        k += 1
        if k > 200_000:                    # unreachable; safety stop
            break
    return out


def holt_forecast(df: DataFrame, keys: list[str], ts_col: str,
                  value_col: str, seq_col: str,
                  alpha: float = HOLT_ALPHA, beta: float = HOLT_BETA,
                  horizon: int = 1,
                  value_scale: int = 2) -> DataFrame:
    """Holt's linear-trend exponential smoothing per key (Holt 1957 —
    the level+trend member of the Holt-Winters family; SES tracks a
    level, this also tracks where it is HEADING):

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}

    with the standard seeds l_1 = x_1, b_1 = x_2 − x_1, forecast
    ŷ_{n+h} = l_n + h·b_n. Both recurrences are linear in history, so
    the whole fit is the SES closed-form plan — one window (row_number
    + count per key) + one broadcast join against a Python-precomputed
    per-lag DECIMAL weight table (two weight vectors now: level and
    trend) + one aggregate. No iteration, no UDF.

    Exactness contract (the SES discipline): values quantize to
    ``value_scale`` decimals, weights to 12 dp, every term is an exact
    decimal product, sums are order-independent, and the final 6-dp
    rounds happen in decimal space. Keys with a SINGLE observation are
    OMITTED (b_1 needs x_2 — Holt is undefined on singletons; fall
    back to :func:`ses_forecast` for those).

    Returns (keys..., n_obs, level, trend, forecast)."""
    from decimal import Decimal

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 < beta <= 1.0):
        raise ValueError(f"beta must be in (0, 1], got {beta}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    dp = SES_W_DP
    spark = df.sparkSession
    wtab = F.broadcast(spark.createDataFrame(
        [(k,) + tuple(Decimal(w) for w in ws)
         for k, *ws in _holt_weights(alpha, beta)],
        "_k int, " + ", ".join(
            f"_{c} decimal(14,{dp})"
            for c in ("wlf", "wtf", "wls", "wts", "wlm", "wtm"))))
    w_ord = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    w_key = Window.partitionBy(*keys)
    src = (df.withColumn("_rn", F.row_number().over(w_ord))
           .withColumn("_n", F.count(F.lit(1)).over(w_key))
           .filter(F.col("_n") >= 2)
           .withColumn("_k", (F.col("_n") - F.col("_rn")).cast("int")))
    vdec = F.col(value_col).cast(f"decimal(24,{value_scale})")
    zero = F.lit(0).cast(f"decimal(14,{dp})")
    wl = F.coalesce(
        F.when(F.col("_rn") == 1, F.col("_wlf"))
        .when(F.col("_rn") == 2, F.col("_wls"))
        .otherwise(F.col("_wlm")), zero)
    wt = F.coalesce(
        F.when(F.col("_rn") == 1, F.col("_wtf"))
        .when(F.col("_rn") == 2, F.col("_wts"))
        .otherwise(F.col("_wtm")), zero)
    return (src.join(wtab, on="_k", how="left")
            .select(*keys, (vdec * wl).alias("_tl"),
                    (vdec * wt).alias("_tt"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"),
                 F.round(F.sum("_tl"), 6).cast("double").alias("level"),
                 F.round(F.sum("_tt"), 6).cast("double").alias("trend"),
                 F.round(F.sum("_tl")
                         + F.lit(horizon) * F.sum("_tt"), 6)
                 .cast("double").alias("forecast")))


def holt_forecast_duck(inner_sql: str, keys: list[str], ts_col: str,
                       value_col: str, seq_col: str,
                       alpha: float = HOLT_ALPHA,
                       beta: float = HOLT_BETA,
                       horizon: int = 1,
                       value_scale: int = 2) -> str:
    """DuckDB mirror of :func:`holt_forecast` — the SAME
    Python-rendered decimal weight literals, exact decimal products and
    decimal-space final rounds."""
    dp = SES_W_DP
    ks = ", ".join(keys)
    cols = ("wlf", "wtf", "wls", "wts", "wlm", "wtm")
    wrows = " UNION ALL ".join(
        f"SELECT {k} AS _k, " + ", ".join(
            f"CAST('{w}' AS DECIMAL(14,{dp})) AS _{c}"
            for c, w in zip(cols, ws))
        for k, *ws in _holt_weights(alpha, beta))
    zero = f"CAST(0 AS DECIMAL(14,{dp}))"
    return f"""
WITH src AS (
  SELECT {ks},
         CAST({value_col} AS DECIMAL(24,{value_scale})) AS x,
         ROW_NUMBER() OVER (PARTITION BY {ks}
                            ORDER BY {ts_col}, {seq_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {ks}) AS n
  FROM ({inner_sql})
  QUALIFY n >= 2),
wt AS ({wrows}),
terms AS (
  SELECT {ks},
         x * COALESCE(CASE WHEN rn = 1 THEN _wlf
                           WHEN rn = 2 THEN _wls
                           ELSE _wlm END, {zero}) AS tl,
         x * COALESCE(CASE WHEN rn = 1 THEN _wtf
                           WHEN rn = 2 THEN _wts
                           ELSE _wtm END, {zero}) AS tt
  FROM src LEFT JOIN wt ON wt._k = n - rn)
SELECT {ks}, CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(ROUND(SUM(tl), 6) AS DOUBLE) AS level,
       CAST(ROUND(SUM(tt), 6) AS DOUBLE) AS trend,
       CAST(ROUND(SUM(tl) + {horizon} * SUM(tt), 6) AS DOUBLE)
         AS forecast
FROM terms GROUP BY {ks}
"""


def ses_forecast_duck(inner_sql: str, keys: list[str], ts_col: str,
                      value_col: str, seq_col: str,
                      alpha: float = SES_ALPHA,
                      value_scale: int = 2) -> str:
    """DuckDB mirror of :func:`ses_forecast` — the SAME Python-rendered
    decimal weight literals, exact decimal products and decimal-space
    final round."""
    ks = ", ".join(keys)
    wrows = " UNION ALL ".join(
        f"SELECT {k} AS _k, CAST('{wf}' AS DECIMAL(14,{SES_W_DP})) "
        f"AS _wf, CAST('{wm}' AS DECIMAL(14,{SES_W_DP})) AS _wm"
        for k, wf, wm in _ses_weights(alpha))
    return f"""
WITH src AS (
  SELECT {ks},
         CAST({value_col} AS DECIMAL(24,{value_scale})) AS x,
         ROW_NUMBER() OVER (PARTITION BY {ks}
                            ORDER BY {ts_col}, {seq_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {ks}) AS n
  FROM ({inner_sql})),
wt AS ({wrows}),
terms AS (
  SELECT {ks},
         x * COALESCE(CASE WHEN rn = 1 THEN _wf ELSE _wm END,
                      CAST(0 AS DECIMAL(14,{SES_W_DP}))) AS t
  FROM src LEFT JOIN wt ON wt._k = n - rn)
SELECT {ks}, CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(ROUND(SUM(t), 6) AS DOUBLE) AS forecast
FROM terms GROUP BY {ks}
"""


# ------------------------------------------ autocorrelation (ACF)

ACF_DP = 6
ACF_DEC = "decimal(20,6)"


def autocorrelation(df: DataFrame, keys: list[str], ts_col: str,
                    value_col: str, max_lag: int,
                    seq_col: str | None = None) -> DataFrame:
    """Per-key autocorrelation function — Pearson r between the series
    and itself ``k`` steps later, for k = 1..max_lag: "does this user's
    hourly value echo its recent past?" — the diagnostic that says
    whether the SES/Holt forecasts (this module) have structure left to
    model and which seasonal period the anomaly baselines
    (``operators/anomaly.py``) should phase on.

    Each lag's r is the plain Pearson correlation of the PAIRED sample
    (x_t, x_{t+k}) — the definition both engines can replay from exact
    sums (the textbook ACF that reuses the full-series mean differs by
    O(k/n) and would drag engine-float x̄ into every product).

    Exactness (the corr_matrix discipline): values quantize to
    DECIMAL(20,6) once; Σa, Σb, Σab, Σa², Σb² accumulate as exact
    decimal sums inside ONE partial+final aggregate, so r is bit-stable
    under any partitioning; the n·Σab − Σa·Σb quotient drops to double
    at the end (rounded ``ACF_DP``), zero-variance lags emit NULL.

    ``seq_col`` breaks timestamp ties deterministically (same contract
    as the funnel family); without it, equal-timestamp rows make the
    lead pairing engine-dependent. NULL values and NULL timestamps are
    excluded BEFORE pairing (a NULL is a missing observation — lag k
    spans it, the longest-run reading).

    Output: (keys…, lag, n, acf) — one row per key per lag with at
    least one pair.

    Plan at 100 TB: one per-key ordered window materializes all
    max_lag leads in a single pass (no self-join — the lag-join
    formulation shuffles the table max_lag times), one explode, one
    partial+final aggregate. Two exchanges total, independent of
    max_lag."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    x = F.col(value_col)
    src = df.filter(x.isNotNull() & F.col(ts_col).isNotNull())
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    a = x.cast("double").cast(ACF_DEC)
    # leads materialize in their own projection first — a window
    # expression is illegal inside the Generate (explode) operator
    leads = src.select(
        *keys, a.alias("a"),
        *[F.lead(a, k).over(w).alias(f"_b{k}")
          for k in range(1, max_lag + 1)])
    pairs = F.explode(F.array(*[
        F.struct(F.lit(k).alias("lag"), F.col("a").alias("a"),
                 F.col(f"_b{k}").alias("b"))
        for k in range(1, max_lag + 1)])).alias("p")
    ex = (leads.select(*keys, pairs)
          .select(*keys, "p.lag", "p.a", "p.b")
          .filter(F.col("b").isNotNull()))
    agg = ex.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").alias("_sa"), F.sum("b").alias("_sb"),
        F.sum(F.col("a") * F.col("b")).alias("_sab"),
        F.sum(F.col("a") * F.col("a")).alias("_saa"),
        F.sum(F.col("b") * F.col("b")).alias("_sbb"))
    n = F.col("n").cast("double")

    def _c(name):
        return F.col(name).cast("double")

    cov = n * _c("_sab") - _c("_sa") * _c("_sb")
    va = n * _c("_saa") - _c("_sa") * _c("_sa")
    vb = n * _c("_sbb") - _c("_sb") * _c("_sb")
    r = F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb))
    return agg.select(*keys, F.col("lag").cast("int").alias("lag"), "n",
                      F.round(r, ACF_DP).alias("acf"))


def autocorrelation_duck(inner_sql: str, keys: list[str], ts_col: str,
                         value_col: str, max_lag: int,
                         seq_col: str | None = None) -> str:
    """DuckDB mirror of :func:`autocorrelation` — same lead windows,
    same DECIMAL(20,6) quantization, same n·Σab − ΣaΣb forms."""
    ks = ", ".join(keys)
    ob = f"{ts_col}" + (f", {seq_col}" if seq_col else "")
    dec = f"CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6))"
    lead_cols = ",\n         ".join(
        f"LEAD({dec}, {k}) OVER (PARTITION BY {ks} ORDER BY {ob}) AS b{k}"
        for k in range(1, max_lag + 1))
    arms = "\n  UNION ALL\n".join(
        f"  SELECT {ks}, {k} AS lag, a, b{k} AS b FROM leads "
        f"WHERE b{k} IS NOT NULL"
        for k in range(1, max_lag + 1))
    return f"""
WITH acf_src AS (
  SELECT * FROM ({inner_sql})
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL),
leads AS (
  SELECT {ks}, {dec} AS a,
         {lead_cols}
  FROM acf_src),
ex AS (
{arms}),
agg AS (
  SELECT {ks}, lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(a) AS sa, SUM(b) AS sb, SUM(a * b) AS sab,
         SUM(a * a) AS saa, SUM(b * b) AS sbb
  FROM ex GROUP BY {ks}, lag)
SELECT {ks}, CAST(lag AS INT) AS lag, n,
       ROUND(CASE WHEN
           CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
           AND CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
         THEN (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
              / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
         END, {ACF_DP}) AS acf
FROM agg
"""


# ---------------------------- Holt-Winters additive seasonal forecast

HW_ALPHA = 0.4
HW_BETA = 0.1
HW_GAMMA = 0.4
#: weight-table safety cap: (alpha, beta, gamma, m) combos whose
#: transition powers have not quantized to zero by here are rejected
#: (the stability contract — slow-decaying geometries would otherwise
#: broadcast unboundedly growing tables)
HW_MAX_K = 30_000


def _hw_matrices(alpha: float, beta: float, gamma: float, m: int):
    """(M, u, S) for the additive Holt-Winters state recurrence
    z_t = M z_{t−1} + u x_t over z = (l, b, s_t, s_{t−1}, …, s_{t−m+1})
    and the classical seed map z_m = S · (x_1..x_{2m}):
    l_m = mean(x_1..m), b_m = (mean(x_{m+1..2m}) − mean(x_1..m))/m,
    s_i = x_i − l_m."""
    import numpy as np
    d = m + 2
    M = np.zeros((d, d))
    u = np.zeros(d)
    el = np.zeros(d); el[0] = 1.0
    eb = np.zeros(d); eb[1] = 1.0
    esm1 = np.zeros(d); esm1[2 + m - 1] = 1.0
    row_l = (1 - alpha) * (el + eb) - alpha * esm1
    M[0] = row_l
    M[1] = beta * row_l - beta * el + (1 - beta) * eb
    M[2] = -gamma * row_l + (1 - gamma) * esm1
    u[0], u[1], u[2] = alpha, beta * alpha, gamma * (1 - alpha)
    for i in range(1, m):
        M[2 + i, 2 + i - 1] = 1.0
    S = np.zeros((d, 2 * m))
    S[0, :m] = 1.0 / m
    S[1, :m] = -1.0 / m ** 2
    S[1, m:2 * m] = 1.0 / m ** 2
    for p in range(m):               # slot p holds s_{m−p} = x_{m−p} − l_m
        S[2 + p, m - p - 1] += 1.0
        S[2 + p, :m] -= 1.0 / m
    return M, u, S


def _hw_weights(alpha: float, beta: float, gamma: float, m: int,
                horizon: int) -> tuple[list[tuple], list[tuple]]:
    """Python-precomputed 12-dp weight tables for the TREND and
    FORECAST functionals of additive Holt-Winters (the SES/Holt
    discipline — identical literals in both engines, no engine matmul).

    mid rows: (k, wb, wf) — weight of observation j = n−k for j > m
    (the post-seed recurrence term w·M^k·u).
    seed rows: (k2, j, wb, wf) — weight of observation j ≤ 2m through
    the seed state, keyed by k2 = n − m (w·M^{k2}·S[:, j−1]).

    Only these two functionals CONVERGE: M has a unit eigenvalue along
    (l+c, b, s−c) — the classical level/seasonal non-identifiability —
    so per-observation weights for level or a seasonal component alone
    approach nonzero constants and no finite exact table exists, while
    ŷ_{n+h} = l + h·b + s_{slot} and b are invariant along that
    direction and their weights decay geometrically (checked here by
    the row-vector norm, with the Holt margin for non-normal
    transients). Raises if the combo has not quantized to zero within
    ``HW_MAX_K`` steps."""
    import numpy as np
    dp = SES_W_DP
    M, u, S = _hw_matrices(alpha, beta, gamma, m)
    r = m * ((horizon + m - 1) // m) - horizon   # seasonal slot for n+h
    wf = np.zeros(m + 2); wf[0] = 1.0; wf[1] = float(horizon)
    wf[2 + r] += 1.0
    wb = np.zeros(m + 2); wb[1] = 1.0
    xf, xb = wf.copy(), wb.copy()
    mid, seed = [], []
    fmt = f"{{:.{dp}f}}".format
    k = 0
    while True:
        mb, mf = round(float(xb @ u), dp), round(float(xf @ u), dp)
        if mb != 0.0 or mf != 0.0:
            mid.append((k, fmt(mb), fmt(mf)))
        sb, sf = xb @ S, xf @ S
        for j in range(2 * m):
            b_, f_ = round(float(sb[j]), dp), round(float(sf[j]), dp)
            if b_ != 0.0 or f_ != 0.0:
                seed.append((k, j + 1, fmt(b_), fmt(f_)))
        nrm = max(np.abs(xf).max(), np.abs(xb).max())
        if nrm * 4.0 < 10.0 ** -(dp + 2):
            break
        if k >= HW_MAX_K:
            raise ValueError(
                f"holt_winters weights not converged after {HW_MAX_K} "
                f"steps for alpha={alpha} beta={beta} gamma={gamma} "
                f"m={m} — pick a faster-decaying geometry")
        xf = xf @ M
        xb = xb @ M
        k += 1
    return mid, seed


def holt_winters_forecast(df: DataFrame, keys: list[str], ts_col: str,
                          value_col: str, seq_col: str, period: int,
                          alpha: float = HW_ALPHA, beta: float = HW_BETA,
                          gamma: float = HW_GAMMA, horizon: int = 1,
                          value_scale: int = 2) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing; Winters
    1960) per key — the seasonal member completing the SES → Holt
    family: level + trend + an m-phase additive seasonal, forecast
    ŷ_{n+h} = l_n + h·b_n + s_{n+h−m⌈h/m⌉}. Classical seeds over the
    first two seasons (l_m = first-season mean, b_m = season-mean
    difference / m, s_i = x_i − l_m).

    The whole fit is STILL the SES closed-form plan — one window
    (row_number + count per key) + two broadcast joins against
    Python-precomputed 12-dp DECIMAL weight tables (per-lag recurrence
    weights; per-(n−m, j) seed weights for the first 2m observations)
    + one aggregate. No iteration, no UDF.

    Output: (keys…, n_obs, trend, forecast) — deliberately WITHOUT a
    separate level or seasonal column: the HW recurrence map has a unit
    eigenvalue along (l+c, b, s−c) (adding a constant to the level and
    subtracting it from every seasonal changes nothing observable), so
    level and seasonal components alone are not convergent linear
    functionals of the data — their per-observation weights tend to
    nonzero constants and no finite exact table can exist — while the
    forecast and trend are invariant along that direction and truncate
    cleanly. Keys with fewer than 2·period observations are OMITTED
    (the seeds need two full seasons — the Holt singleton discipline).

    Exactness contract (the SES discipline): values quantize to
    ``value_scale`` decimals, weights to 12 dp, every term is an exact
    decimal product, sums are order-independent, final 6-dp rounds in
    decimal space."""
    from decimal import Decimal

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not (0.0 < beta <= 1.0):
        raise ValueError(f"beta must be in (0, 1], got {beta}")
    if not (0.0 < gamma <= 1.0):
        raise ValueError(f"gamma must be in (0, 1], got {gamma}")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    dp = SES_W_DP
    spark = df.sparkSession
    mid, seed = _hw_weights(alpha, beta, gamma, period, horizon)
    wdec = f"decimal(14,{dp})"
    midt = F.broadcast(spark.createDataFrame(
        [(k, Decimal(b), Decimal(f)) for k, b, f in mid],
        f"_k int, _mwb {wdec}, _mwf {wdec}"))
    seedt = F.broadcast(spark.createDataFrame(
        [(k2, j, Decimal(b), Decimal(f)) for k2, j, b, f in seed],
        f"_k2 int, _rn int, _swb {wdec}, _swf {wdec}"))
    w_ord = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    w_key = Window.partitionBy(*keys)
    src = (df.withColumn("_rn", F.row_number().over(w_ord))
           .withColumn("_n", F.count(F.lit(1)).over(w_key))
           .filter(F.col("_n") >= 2 * period)
           .withColumn("_k", (F.col("_n") - F.col("_rn")).cast("int"))
           .withColumn("_k2", (F.col("_n") - F.lit(period)).cast("int")))
    vdec = F.col(value_col).cast(f"decimal(24,{value_scale})")
    zero = F.lit(0).cast(wdec)
    # mid weights apply to post-seed observations only (j > m); seed
    # weights joined on (n−m, j) cover j ≤ 2m — an observation in
    # (m, 2m] legitimately carries BOTH
    wb = (F.coalesce(F.when(F.col("_rn") > period, F.col("_mwb")), zero)
          + F.coalesce(F.col("_swb"), zero))
    wf = (F.coalesce(F.when(F.col("_rn") > period, F.col("_mwf")), zero)
          + F.coalesce(F.col("_swf"), zero))
    return (src.join(midt, on="_k", how="left")
            .join(seedt, on=["_k2", "_rn"], how="left")
            .select(*keys, (vdec * wb).alias("_tb"),
                    (vdec * wf).alias("_tf"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"),
                 F.round(F.sum("_tb"), 6).cast("double").alias("trend"),
                 F.round(F.sum("_tf"), 6).cast("double")
                 .alias("forecast")))


def holt_winters_forecast_duck(inner_sql: str, keys: list[str],
                               ts_col: str, value_col: str, seq_col: str,
                               period: int,
                               alpha: float = HW_ALPHA,
                               beta: float = HW_BETA,
                               gamma: float = HW_GAMMA,
                               horizon: int = 1,
                               value_scale: int = 2) -> str:
    """DuckDB mirror of :func:`holt_winters_forecast` — the SAME
    Python-generated weight literals as VALUES tables, same joins,
    same decimal products and final rounds."""
    dp = SES_W_DP
    mid, seed = _hw_weights(alpha, beta, gamma, period, horizon)
    ks = ", ".join(keys)
    midv = ", ".join(f"({k}, {b}, {f})" for k, b, f in mid)
    seedv = ", ".join(f"({k2}, {j}, {b}, {f})" for k2, j, b, f in seed)
    wdec = f"DECIMAL(14,{dp})"
    return f"""
WITH hw_src0 AS ({inner_sql}),
midw (k, mwb, mwf) AS (SELECT k, CAST(b AS {wdec}), CAST(f AS {wdec})
                       FROM (VALUES {midv}) t(k, b, f)),
seedw (k2, rn, swb, swf) AS (SELECT k2, rn, CAST(b AS {wdec}),
                                    CAST(f AS {wdec})
                             FROM (VALUES {seedv}) t(k2, rn, b, f)),
rows_ AS (
  SELECT {ks},
         CAST({value_col} AS DECIMAL(24,{value_scale})) AS v,
         ROW_NUMBER() OVER (PARTITION BY {ks}
                            ORDER BY {ts_col}, {seq_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {ks}) AS n
  FROM hw_src0),
terms AS (
  SELECT r.{", r.".join(keys)}, r.v,
         COALESCE(CASE WHEN r.rn > {period} THEN m.mwb END,
                  CAST(0 AS {wdec}))
           + COALESCE(s.swb, CAST(0 AS {wdec})) AS wb,
         COALESCE(CASE WHEN r.rn > {period} THEN m.mwf END,
                  CAST(0 AS {wdec}))
           + COALESCE(s.swf, CAST(0 AS {wdec})) AS wf
  FROM rows_ r
  LEFT JOIN midw m ON m.k = r.n - r.rn
  LEFT JOIN seedw s ON s.k2 = r.n - {period} AND s.rn = r.rn
  WHERE r.n >= {2 * period})
SELECT {ks}, CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(ROUND(SUM(v * wb), 6) AS DOUBLE) AS trend,
       CAST(ROUND(SUM(v * wf), 6) AS DOUBLE) AS forecast
FROM terms GROUP BY {ks}
"""


# ----------------------------- classical seasonal decomposition

DECOMP_SCALE = 1_000_000  # fixed-point 1e-6 units


def seasonal_decompose(df: DataFrame, keys: list[str], ts_col: str,
                       value_col: str, seq_col: str, period: int,
                       value_scale: int = 2) -> DataFrame:
    """Classical additive decomposition per key (the moving-average
    method, Macaulay 1931 — the diagnostic DECOMPOSITION beside the
    Holt-Winters FORECAST): x = trend + seasonal + remainder, with

    * trend — the centered moving average: a plain m-MA for odd
      ``period``, the standard 2×m-MA for even (half weight on the two
      outermost points); NULL on the ⌊m/2⌋ edge rows where the window
      is incomplete,
    * seasonal — per-phase means of the detrended series, centered to
      sum to zero over one cycle (one value per (key, phase), repeated),
    * remainder — what's left; NULL wherever trend is.

    Output: one row per input row — (keys…, ts, seq, value, trend,
    seasonal, remainder). Phases follow observation ORDER ((rn−1) mod
    m, the quantified family's ordered-sequence convention). Keys
    shorter than m+1 observations pass through with NULL
    trend/seasonal/remainder (the decomposition degrades, it never
    drops rows).

    Exactness — FIXED-POINT INTEGERS end to end: values scale to 1e-6
    units as exact BIGINTs, the MA works on doubled units (so the even
    case's half weights stay integral), and every mean is an explicit
    half-away-from-zero integer division ((2·|S| + D) DIV (2·D),
    signed) — the one construction BOTH engines evaluate identically,
    where rounding a double quotient flips at representable .5
    boundaries (Spark rounds the exact binary expansion, DuckDB the
    shortest decimal — they disagree exactly ON the boundary, and a
    6-dp mean of 6-dp values lands on it structurally). The final
    /1e6 happens once, on exact integers. BIGINT headroom: |values| ≤
    ~9·10^12 at 1e6-row keys; larger keys should pre-aggregate buckets
    first.

    Plan at 100 TB: ONE per-key ordered window materializes all
    2⌊m/2⌋ lead/lag columns (the ACF discipline — no self-joins), one
    (key, phase)-grouped aggregate (≤ m rows per key), one join back
    on (key, phase)."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    m = period
    h = m // 2
    even = (m % 2 == 0)
    S = DECOMP_SCALE
    w_ord = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    xi = (F.col(value_col).cast(f"decimal(24,{value_scale})")
          * F.lit(S)).cast("bigint")
    base = df.select(*[df[c] for c in df.columns], xi.alias("_xi"),
                     F.row_number().over(w_ord).alias("_rn"))
    lead_cols = {}
    for d in range(-h, h + 1):
        if d == 0:
            continue
        name = f"_o{d:+d}".replace("+", "p").replace("-", "n")
        expr = (F.lead(F.col("_xi"), d).over(w_ord) if d > 0
                else F.lag(F.col("_xi"), -d).over(w_ord))
        lead_cols[d] = name
        base = base.withColumn(name, expr)
    # MA numerator in DOUBLED units so the even case's half weights
    # stay integral: full-weight points contribute 2·x_i, the two even
    # ends contribute x_i; denominator is 2m
    terms = []
    for d in range(-h, h + 1):
        c = F.col("_xi") if d == 0 else F.col(lead_cols[d])
        terms.append(c if even and abs(d) == h else c * F.lit(2))
    num2 = terms[0]
    for t in terms[1:]:
        num2 = num2 + t

    def _half_up(numer, denom):
        """sign(numer) · ((2|numer| + denom) DIV (2·denom)) — exact
        half-away-from-zero integer division, positives only inside.
        The quotient runs through Spark's integral `div` on
        DECIMAL(38,0) operands (truncation ≡ floor on positives), NOT
        float division + floor: floor-of-double equals true integer
        division only below ~2^53, and per-phase fixed-point sums
        clear that well inside the documented value headroom. The
        DECIMAL(38,0) arithmetic also keeps 2·|numer| itself exact
        where BIGINT doubling would overflow."""
        d38 = "decimal(38,0)"
        a = F.abs(numer).cast(d38)
        n2 = F.lit(2).cast(d38) * a + denom.cast(d38)
        d2 = F.lit(2).cast(d38) * denom.cast(d38)
        q = F.call_function("div", n2, d2)
        return F.when(numer < 0, -q).otherwise(q)

    base = base.withColumn("_ti", F.when(num2.isNotNull(),
                                         _half_up(num2, F.lit(2 * m))))
    base = (base
            .withColumn("_di", F.col("_xi") - F.col("_ti"))
            .withColumn("_phase", (F.col("_rn") - 1) % F.lit(m)))
    ph = (base.groupBy(*keys, "_phase")
          .agg(F.sum("_di").alias("_sd"),
               F.count("_di").alias("_cd")))
    w_key = Window.partitionBy(*keys)
    ph = (ph.withColumn("_spi", F.when(
              F.col("_cd") > 0, _half_up(F.col("_sd"), F.col("_cd"))))
          .withColumn("_ssum", F.sum("_spi").over(w_key))
          .withColumn("_adj", F.when(F.col("_ssum").isNotNull(),
                                     _half_up(F.col("_ssum"), F.lit(m))))
          .select(*keys, "_phase",
                  (F.col("_spi") - F.col("_adj")).alias("_si")))
    out = base.join(ph, on=[*keys, "_phase"], how="left")
    dbl = F.lit(float(S))
    return out.select(
        *keys, ts_col, seq_col,
        F.col(value_col).alias("value"),
        (F.col("_ti").cast("double") / dbl).alias("trend"),
        (F.col("_si").cast("double") / dbl).alias("seasonal"),
        ((F.col("_xi") - F.col("_ti") - F.col("_si")).cast("double")
         / dbl).alias("remainder"))


def seasonal_decompose_duck(inner_sql: str, keys: list[str], ts_col: str,
                            value_col: str, seq_col: str, period: int,
                            value_scale: int = 2) -> str:
    """DuckDB mirror of :func:`seasonal_decompose` — the same
    fixed-point integers and the same explicit half-away-from-zero
    integer divisions (`//` on positives ≡ Spark's floored DIV)."""
    m = period
    h = m // 2
    even = (m % 2 == 0)
    S = DECOMP_SCALE
    ks = ", ".join(keys)
    ob = f"{ts_col}, {seq_col}"
    offs = []
    for d in range(-h, h + 1):
        if d == 0:
            expr = "xi"
        elif d > 0:
            expr = (f"LEAD(xi, {d}) OVER (PARTITION BY {ks} "
                    f"ORDER BY {ob})")
        else:
            expr = (f"LAG(xi, {-d}) OVER (PARTITION BY {ks} "
                    f"ORDER BY {ob})")
        offs.append(f"({expr})" if even and abs(d) == h
                    else f"2 * ({expr})")
    num2 = " + ".join(offs)

    def half_up(numer, denom):
        return (f"(CASE WHEN ({numer}) < 0 THEN -1 ELSE 1 END) * "
                f"((2 * ABS({numer}) + ({denom})) // (2 * ({denom})))")

    return f"""
WITH sd_src AS (
  SELECT *, CAST(CAST({value_col} AS DECIMAL(24,{value_scale}))
                 * {S} AS BIGINT) AS xi,
         ROW_NUMBER() OVER (PARTITION BY {ks} ORDER BY {ob}) AS rn
  FROM ({inner_sql})),
ma AS (
  SELECT *, {half_up(num2, 2 * m)} AS ti
  FROM sd_src),
dq AS (
  SELECT *, xi - ti AS di, (rn - 1) % {m} AS phase
  FROM ma),
ph0 AS (
  SELECT {ks}, phase, SUM(di) AS sd, COUNT(di) AS cd
  FROM dq GROUP BY {ks}, phase),
ph1 AS (
  SELECT {ks}, phase,
         CASE WHEN cd > 0 THEN {half_up("sd", "cd")} END AS spi
  FROM ph0),
ph AS (
  SELECT {ks}, phase,
         spi - {half_up(f"SUM(spi) OVER (PARTITION BY {ks})", m)}
           AS si
  FROM ph1)
SELECT d.{", d.".join(keys)}, d.{ts_col}, d.{seq_col},
       d.{value_col} AS value,
       CAST(d.ti AS DOUBLE) / {float(S)} AS trend,
       CAST(p.si AS DOUBLE) / {float(S)} AS seasonal,
       CAST(d.xi - d.ti - p.si AS DOUBLE) / {float(S)} AS remainder
FROM dq d
LEFT JOIN ph p ON {" AND ".join(f"p.{k} = d.{k}" for k in keys)}
              AND p.phase = d.phase
"""


# ---------------------------------- Dickey-Fuller stationarity test

ADF_DP = 6
#: 5%% critical value of the Dickey-Fuller tau_mu distribution
#: (constant, no trend; Fuller 1976 table 8.5.2, large-n) — callers
#: pass their own for other alphas/specs
ADF_CRIT_5PCT = -2.86


def dickey_fuller(df: DataFrame, keys: list[str], ts_col: str,
                  value_col: str, crit: float = ADF_CRIT_5PCT,
                  seq_col: str | None = None) -> DataFrame:
    """Per-key Dickey-Fuller unit-root test (Dickey & Fuller 1979; the
    constant-only specification without lagged differences — the ADF(0)
    member) — IS this series stationary, the question underneath every
    forecast this module ships (SES/Holt assume a level to track; a
    unit root means there is none):

        Δy_t = α + β·y_{t−1} + ε_t,   DF = β̂ / SE(β̂)

    with β̂ from the OLS closed form over centered exact sums and the
    verdict ``DF < crit`` (unit root REJECTED ⇒ stationary) at the
    caller's critical value from the Dickey-Fuller tau distribution
    (no tau CDF in either engine — the z-test threshold discipline;
    default the 5% constant-only large-n value). Output: (keys…,
    n_diffs, beta, df_stat, stationary). Groups with n_diffs < 3, zero
    lag variance, or zero residual variance emit NULL stats with a
    False verdict. NULL values/timestamps are excluded before pairing
    (the ACF longest-run reading); ``seq_col`` breaks timestamp ties.

    Exactness: the (x = y_{t−1}, d = Δy) pairs come from ONE lag
    window; x, d quantize to DECIMAL(20,6) and all five sums (Σx, Σd,
    Σx², Σxd, Σd²) accumulate exactly in one partial+final aggregate;
    every quotient runs on floor-split doubles (``util.dec_to_double``)
    — engine-identical at any magnitude.

    Plan at 100 TB: one per-key ordered window + one grouped aggregate
    — two exchanges, the ACF shape with max_lag = 1."""
    from flink_rag_spark.operators.util import dec_to_double

    x = F.col(value_col)
    src = df.filter(x.isNotNull() & F.col(ts_col).isNotNull())
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    a = x.cast("double").cast("decimal(20,6)")
    lagged = src.select(
        *keys, a.alias("_y"), F.lag(a, 1).over(w).alias("_x"))
    p = (lagged.filter(F.col("_x").isNotNull())
         .withColumn("_dd", F.col("_y") - F.col("_x")))
    g = p.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_diffs"),
        F.sum("_x").alias("_sx"), F.sum("_dd").alias("_sd"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_dd")).alias("_sxd"),
        F.sum(F.col("_dd") * F.col("_dd")).alias("_sdd"))
    n = F.col("n_diffs").cast("double")
    sx = dec_to_double(F.col("_sx"))
    sd = dec_to_double(F.col("_sd"))
    sxx_c = dec_to_double(F.col("_sxx")) - sx * sx / n
    sxd_c = dec_to_double(F.col("_sxd")) - sx * sd / n
    sdd_c = dec_to_double(F.col("_sdd")) - sd * sd / n
    beta = F.when((F.col("n_diffs") >= 3) & (sxx_c > 0), sxd_c / sxx_c)
    rss = sdd_c - beta * sxd_c
    se = F.when(rss > 0,
                F.sqrt((rss / (n - F.lit(2.0))) / sxx_c))
    stat = beta / se
    return g.select(
        *keys, "n_diffs",
        F.round(beta, ADF_DP).alias("beta"),
        F.round(stat, ADF_DP).alias("df_stat"),
        F.coalesce(stat < F.lit(float(crit)), F.lit(False))
        .alias("stationary"))


def dickey_fuller_duck(inner_sql: str, keys: list[str], ts_col: str,
                       value_col: str, crit: float = ADF_CRIT_5PCT,
                       seq_col: str | None = None) -> str:
    """DuckDB mirror of :func:`dickey_fuller` — the same lag pairing,
    exact decimal sums and floor-split quotients."""
    from flink_rag_spark.operators.util import dec_to_double_duck

    ks = ", ".join(keys)
    order = f"{ts_col}" + (f", {seq_col}" if seq_col else "")
    sx = dec_to_double_duck("sx")
    sd = dec_to_double_duck("sd")
    sxx = dec_to_double_duck("sxx")
    sxd = dec_to_double_duck("sxd")
    sdd = dec_to_double_duck("sdd")
    return f"""
WITH adf0 AS (
  SELECT {ks},
         CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)) AS y,
         LAG(CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)))
           OVER (PARTITION BY {ks} ORDER BY {order}) AS x
  FROM ({inner_sql})
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL),
adf_p AS (SELECT {ks}, x, y - x AS dd FROM adf0 WHERE x IS NOT NULL),
adf_g AS (
  SELECT {ks}, CAST(COUNT(*) AS BIGINT) AS n_diffs,
         SUM(x) AS sx, SUM(dd) AS sd, SUM(x * x) AS sxx,
         SUM(x * dd) AS sxd, SUM(dd * dd) AS sdd
  FROM adf_p GROUP BY {ks}),
adf_c AS (
  SELECT {ks}, n_diffs,
         {sxx} - {sx} * {sx} / CAST(n_diffs AS DOUBLE) AS sxx_c,
         {sxd} - {sx} * {sd} / CAST(n_diffs AS DOUBLE) AS sxd_c,
         {sdd} - {sd} * {sd} / CAST(n_diffs AS DOUBLE) AS sdd_c
  FROM adf_g),
adf_s AS (
  SELECT {ks}, n_diffs,
         CASE WHEN n_diffs >= 3 AND sxx_c > 0
              THEN sxd_c / sxx_c END AS beta,
         sxx_c, sxd_c, sdd_c
  FROM adf_c),
adf_t AS (
  SELECT {ks}, n_diffs, beta,
         sdd_c - beta * sxd_c AS rss, sxx_c
  FROM adf_s)
SELECT {ks}, n_diffs,
       ROUND(beta, {ADF_DP}) AS beta,
       ROUND(CASE WHEN rss > 0 THEN beta
               / SQRT((rss / (CAST(n_diffs AS DOUBLE) - 2.0)) / sxx_c)
             END, {ADF_DP}) AS df_stat,
       COALESCE(CASE WHEN rss > 0 THEN beta
                  / SQRT((rss / (CAST(n_diffs AS DOUBLE) - 2.0))
                         / sxx_c) END < {crit!r}, FALSE) AS stationary
FROM adf_t
"""


# --------------------------------------- Wald–Wolfowitz runs test

RUNS_MED_DP = 6
RUNS_DP = 6


def runs_test(df: DataFrame, keys: list[str], ts_col: str,
              value_col: str, z_crit: float = 1.96,
              seq_col: str | None = None) -> DataFrame:
    """Wald–Wolfowitz runs test per key — the RANDOMNESS check beside
    the trend (Mann–Kendall) and drift (Page–Hinkley) members of the
    series battery: is the sequence of above/below-median signs random,
    or does it cluster (too few runs — trend/regime) or alternate (too
    many — overcorrection)?

        R = number of sign runs,   E[R] = 2·n₁n₀/n + 1,
        Var = 2n₁n₀(2n₁n₀ − n) / (n²(n−1)),   z = (R − E)/√Var

    over the signs v > median_key (values EQUAL to the median are
    dropped — the classical treatment). Output one row per key:
    (keys…, n, n_above, n_below, runs, expected_runs, z, significant);
    an empty class or zero variance ⇒ NULL z, False verdict.

    Exactness: the median is the quantized-center chart (interpolated
    percentile rounded ``RUNS_MED_DP`` — the brown_forsythe
    discipline); R/n₁/n₀ are exact integers from one lag window; E,
    Var, z are the same IEEE expression in both engines.

    Plan at 100 TB: one per-key percentile aggregate + broadcast join
    back + one (key, ts)-ordered lag window + one per-key fold — one
    data shuffle on the key."""
    src = df.filter(F.col(value_col).isNotNull())
    med = (src.groupBy(*keys)
           .agg(F.round(
               F.expr(f"percentile(CAST({value_col} AS DOUBLE), 0.5)"),
               RUNS_MED_DP).alias("_med")))
    ren = med
    for g in keys:
        ren = ren.withColumnRenamed(g, f"_g_{g}")
    cond = None
    for g in keys:
        c = src[g].eqNullSafe(F.col(f"_g_{g}"))
        cond = c if cond is None else (cond & c)
    j = (src.join(F.broadcast(ren), cond)
         .filter(F.col(value_col).cast("double") != F.col("_med"))
         .withColumn("_sgn",
                     (F.col(value_col).cast("double")
                      > F.col("_med")).cast("int")))
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*[F.col(f"_g_{g}") for g in keys]).orderBy(*order)
    j = j.withColumn(
        "_new_run",
        F.when(F.lag("_sgn").over(w).isNull()
               | (F.lag("_sgn").over(w) != F.col("_sgn")), 1)
        .otherwise(0))
    agg = j.groupBy(*[F.col(f"_g_{g}").alias(g) for g in keys]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_sgn").cast("bigint").alias("n_above"),
        F.sum(F.lit(1) - F.col("_sgn")).cast("bigint").alias("n_below"),
        F.sum("_new_run").cast("bigint").alias("runs"))
    n = F.col("n").cast("double")
    n1 = F.col("n_above").cast("double")
    n0 = F.col("n_below").cast("double")
    e = F.when((F.col("n_above") > 0) & (F.col("n_below") > 0),
               2.0 * n1 * n0 / n + F.lit(1.0))
    var = F.when(
        (F.col("n_above") > 0) & (F.col("n_below") > 0) & (n > 1),
        2.0 * n1 * n0 * (2.0 * n1 * n0 - n) / (n * n * (n - 1.0)))
    z = F.when(var > 0, (F.col("runs").cast("double") - e) / F.sqrt(var))
    return agg.select(
        *keys, "n", "n_above", "n_below", "runs",
        F.round(e, RUNS_DP).alias("expected_runs"),
        F.round(z, RUNS_DP).alias("z"),
        F.coalesce(F.abs(z) > z_crit, F.lit(False)).alias("significant"))


def runs_test_duck(inner_sql: str, keys: list[str], ts_col: str,
                   value_col: str, z_crit: float = 1.96,
                   seq_col: str | None = None) -> str:
    """DuckDB mirror of :func:`runs_test` — quantile_cont median, same
    lag fold, identical double expressions."""
    gc = ", ".join(keys)
    on = " AND ".join(
        f"s.{g} IS NOT DISTINCT FROM m.{g}" for g in keys)
    mgc = ", ".join(f"m.{g}" for g in keys)
    order = f"{ts_col}" + (f", {seq_col}" if seq_col else "")
    dp = RUNS_DP
    return f"""
WITH rt_src AS (
  SELECT * FROM ({inner_sql}) WHERE {value_col} IS NOT NULL),
rt_med AS (
  SELECT {gc},
         ROUND(quantile_cont(CAST({value_col} AS DOUBLE), 0.5),
               {RUNS_MED_DP}) AS med
  FROM rt_src GROUP BY {gc}),
rt_j AS (
  SELECT {mgc}, s.{order.replace(', ', ', s.')},
         CAST(CAST(s.{value_col} AS DOUBLE) > m.med AS INT) AS sgn
  FROM rt_src s JOIN rt_med m ON {on}
  WHERE CAST(s.{value_col} AS DOUBLE) <> m.med),
rt_l AS (
  SELECT *,
         CASE WHEN LAG(sgn) OVER (PARTITION BY {gc} ORDER BY {order})
                   IS NULL
              OR LAG(sgn) OVER (PARTITION BY {gc} ORDER BY {order})
                 <> sgn THEN 1 ELSE 0 END AS new_run
  FROM rt_j),
rt_agg AS (
  SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(sgn) AS BIGINT) AS n_above,
         CAST(SUM(1 - sgn) AS BIGINT) AS n_below,
         CAST(SUM(new_run) AS BIGINT) AS runs
  FROM rt_l GROUP BY {gc}),
rt_st AS (
  SELECT *,
         CASE WHEN n_above > 0 AND n_below > 0 THEN
           2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
           / CAST(n AS DOUBLE) + 1.0 END AS e,
         CASE WHEN n_above > 0 AND n_below > 0 AND n > 1 THEN
           2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
           * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
              - CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              * (CAST(n AS DOUBLE) - 1.0)) END AS var
  FROM rt_agg)
SELECT {gc}, n, n_above, n_below, runs,
       ROUND(e, {dp}) AS expected_runs,
       ROUND(CASE WHEN var > 0
             THEN (CAST(runs AS DOUBLE) - e) / SQRT(var) END, {dp}) AS z,
       COALESCE(ABS(CASE WHEN var > 0
                    THEN (CAST(runs AS DOUBLE) - e) / SQRT(var) END)
                > {z_crit}, FALSE) AS significant
FROM rt_st
"""
