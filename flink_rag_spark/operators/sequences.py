"""Event-sequence analytics: CEP-style funnels, transition matrices,
retention cohorts.

The reference runs on Flink, whose flagship non-relational capability is
CEP — ordered-pattern detection over a keyed event stream (FlinkCEP's
``followedBy`` relaxed contiguity / SQL MATCH_RECOGNIZE). Spark has no
MATCH_RECOGNIZE, so ``sequence_funnel`` re-expresses the standard
skip-till-next-match earliest-completion semantics as STACKED WINDOW
LAYERS: layer i's running value r_i = "earliest timestamp at which steps
1..i have completed, looking at events up to this row". Each layer is
``min(CASE WHEN <step-i event> AND ts > r_{i-1} THEN ts END)`` over the
same (key, ts)-ordered unbounded-preceding frame, so completion requires
each step STRICTLY after the previous — exactly the first-match funnel
every product-analytics store (and FlinkCEP with greedy earliest match)
computes.

Scale shape — the whole k-step pattern costs ONE shuffle:

- the scan pre-filters to rows matching ANY step (predicate pushed to
  parquet) and projects only (key, seq, ts, type);
- all k window layers share one partitioning (key) and one ordering
  (ts, seq), so Catalyst plans ONE Exchange + ONE Sort and pipelines the
  k Window operators over it — adding funnel steps adds per-row
  arithmetic, never another shuffle;
- the per-key reduction (min of each r_i — each r_i is non-increasing
  along the frame, so the group min IS the final running value) is a
  partial-aggregated groupBy, and the step-count summary is arithmetic
  over k rows.

``within`` bounds the funnel window from the step-1 anchor (greedy
first-entry semantics: the clock starts at the EARLIEST step-1 event,
the standard analytics definition — a funnel that would only complete
from a later anchor does not count, and the docstring says so rather
than hiding it).

``event_transitions`` (the order-1 Markov matrix, lag + count) and
``cohort_retention`` (week-cohort survival) round out the family; both
are one-window / one-join plans with |event-types|²- and
|cohorts×weeks|-bounded outputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flink_rag_spark.operators.util import sql_str_lit as _q

ROUND_DP = 6


def funnel_times(events: DataFrame, steps: list[str | Column],
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", seq_col: str = "event_id",
                 within_seconds: int | None = None) -> DataFrame:
    """Per-key earliest completion timestamp of each funnel step:
    (key, t1..tk) where t_i is the earliest time steps 1..i complete
    in order (each strictly after the previous; NULL = never). Ties in
    ``ts_col`` order by ``seq_col`` for a deterministic frame, but the
    result depends only on timestamp VALUES (running mins), so it is
    replay-stable. ``within_seconds`` additionally requires every step
    to land within that window of the step-1 anchor.

    Each step is either an event-type STRING (matched as equality on
    ``type_col`` — the funnel shape) or a pyspark ``Column`` boolean
    predicate over any event columns (the general MATCH_RECOGNIZE
    shape, e.g. ``(F.col("event_type") == "purchase") &
    (F.col("value") > 30)``). String-only funnels keep the narrow
    pre-filtered projection; predicate steps pre-filter on the OR of
    all step predicates and let Catalyst prune the columns the
    predicates actually reference — still one exchange either way."""
    if not steps:
        raise ValueError("steps must be non-empty")
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in steps]
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    if all(isinstance(s, str) for s in steps):
        df = (events.filter(F.col(type_col).isin(steps))
              .select(key_col, seq_col, ts_col, type_col))
    else:
        any_step = conds[0]
        for c in conds[1:]:
            any_step = any_step | c
        df = events.filter(any_step)
    for i, (step, cond) in enumerate(zip(steps, conds), start=1):
        if i > 1:
            cond = cond & (F.col(ts_col) > F.col(f"_r{i - 1}"))
        if within_seconds is not None and i > 1:
            cond = cond & (F.col(ts_col) <= F.col("_r1")
                           + F.expr(f"INTERVAL {within_seconds} SECOND"))
        df = df.withColumn(
            f"_r{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
    return df.groupBy(key_col).agg(*[
        F.min(f"_r{i}").alias(f"t{i}") for i in range(1, len(steps) + 1)])


def funnel_summary(events: DataFrame,
                   steps: list[str | Column],
                   key_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type", seq_col: str = "event_id",
                   within_seconds: int | None = None) -> DataFrame:
    """Step-level funnel report: (step, step_type, n_keys,
    conv_from_first, conv_from_prev) — one row per step, counts of keys
    reaching it, conversion vs step 1 and vs the previous step (NULL
    when the denominator is zero). The k-row report is arithmetic over
    funnel_times' per-key frame: one shuffle total."""
    ft = funnel_times(events, steps, key_col, ts_col, type_col,
                      seq_col, within_seconds)
    labels = [s if isinstance(s, str) else f"step{i}"
              for i, s in enumerate(steps, start=1)]
    counts = ft.agg(*[
        F.count(f"t{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)])
    rows = F.array(*[
        F.struct(F.lit(i).alias("step"),
                 F.lit(labels[i - 1]).alias("step_type"),
                 F.col(f"n{i}").alias("n_keys"),
                 F.col(f"n{max(i - 1, 1)}").alias("_n_prev"))
        for i in range(1, len(steps) + 1)])
    e = counts.select(F.explode(rows).alias("r"),
                      F.col("n1").alias("_n1")).select("r.*", "_n1")
    safe = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0,
        F.round(F.col(num) / F.col(den), ROUND_DP))
    return e.select(
        "step", "step_type", "n_keys",
        safe("n_keys", "_n1").alias("conv_from_first"),
        safe("n_keys", "_n_prev").alias("conv_from_prev"))


def funnel_summary_duck(steps: list[str], within_seconds: int | None = None,
                        key_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type",
                        seq_col: str = "event_id",
                        table: str = "events") -> str:
    """DuckDB mirror of funnel_summary: same stacked running-min window
    layers, strict-after chaining, within-anchor bound, rounding and
    zero-denominator NULLs. Accepts event-type STRING steps only —
    Column predicate steps have no SQL string to interpolate, so they
    raise here instead of silently generating always-false SQL."""
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError(
            "funnel_summary_duck only mirrors string (event-type) steps; "
            f"got non-string steps: {bad!r}")
    in_list = ", ".join(_q(s) for s in steps)
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    layers = []
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    for i, step in enumerate(steps, start=1):
        cond = f"{type_col} = {_q(step)}"
        if i > 1:
            cond += f" AND {ts_col} > _r{i - 1}"
            if within_seconds is not None:
                cond += (f" AND {ts_col} <= _r1 + "
                         f"INTERVAL {within_seconds} SECOND")
        layers.append(
            f"l{i} AS (SELECT {prev_cols}, "
            f"MIN(CASE WHEN {cond} THEN {ts_col} END) {over} AS _r{i} "
            f"FROM {src})")
        prev_cols += f", _r{i}"
        src = f"l{i}"
    n_cols = ", ".join(f"COUNT(t{i}) AS n{i}"
                       for i in range(1, len(steps) + 1))
    t_cols = ", ".join(f"MIN(_r{i}) AS t{i}"
                       for i in range(1, len(steps) + 1))
    step_rows = " UNION ALL ".join(
        f"SELECT {i} AS step, {_q(steps[i - 1])} AS step_type, "
        f"n{i} AS n_keys, n{max(i - 1, 1)} AS _n_prev, n1 AS _n1 FROM c"
        for i in range(1, len(steps) + 1))
    return f"""
WITH e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col}
           FROM {table} WHERE {type_col} IN ({in_list})),
{", ".join(layers)},
ft AS (SELECT {key_col}, {t_cols} FROM {src} GROUP BY {key_col}),
c AS (SELECT {n_cols} FROM ft),
s AS ({step_rows})
SELECT step, step_type, CAST(n_keys AS BIGINT) AS n_keys,
       CASE WHEN _n1 > 0 THEN ROUND(n_keys / CAST(_n1 AS DOUBLE), {ROUND_DP})
            END AS conv_from_first,
       CASE WHEN _n_prev > 0
            THEN ROUND(n_keys / CAST(_n_prev AS DOUBLE), {ROUND_DP})
            END AS conv_from_prev
FROM s
"""


def funnel_conversion_stats(events: DataFrame, steps: list[str],
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            seq_col: str = "event_id",
                            within_seconds: int | None = None
                            ) -> DataFrame:
    """HOW LONG conversions take — the funnel report's missing axis
    (funnel_summary says how many keys reach each step; this says how
    fast): per consecutive step transition, the distribution of per-key
    time between the two earliest completions. Output one row per
    transition: (step, from_type, to_type, n_converted, min_gap_s,
    median_gap_s, p90_gap_s, max_gap_s).

    Percentiles are TYPE-1 (the value at rank ceil(q·n) — no
    interpolation): interpolated percentiles mix engine-specific
    formulas ((1−g)·a+g·b vs a+(b−a)·g differ in the last ulp) and can
    land on rounding boundaries; the rank-picked value is an exact
    per-key gap both engines reproduce bit-identically. Gaps are exact
    integer MICROSECONDS (the sessionize discipline — NTZ-safe,
    DST-free) converted to seconds by one shared /1e6.

    Plan: funnel_times' single exchange; the per-key gap frame unpivots
    scan-side (k−1 structs per key), one window per transition ranks
    the gaps (partitioned on the transition id — k−1 partitions of
    |converted keys|), one final k−1-row aggregate."""
    if len(steps) < 2:
        raise ValueError("funnel_conversion_stats needs >= 2 steps")
    ft = funnel_times(events, steps, key_col, ts_col, type_col,
                      seq_col, within_seconds)
    k = len(steps)
    labels = [s if isinstance(s, str) else f"step{i}"
              for i, s in enumerate(steps, start=1)]
    entries = []
    for i in range(1, k):
        entries.append(
            f"named_struct('step', {i}, "
            f"'from_type', {_q(labels[i - 1])}, "
            f"'to_type', {_q(labels[i])}, "
            f"'gap_us', timestampdiff(MICROSECOND, t{i}, t{i + 1}))")
    gaps = (ft.select(F.explode(F.array(
        *[F.expr(e) for e in entries])).alias("g"))
        .select("g.*")
        .filter(F.col("gap_us").isNotNull()))
    w = Window.partitionBy("step").orderBy("gap_us")
    ranked = (gaps
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy("step"))))
    pick = lambda q: F.min(F.when(  # noqa: E731
        F.col("_rn") == F.ceil(F.col("_n") * q), F.col("gap_us")))
    agg = (ranked.groupBy("step", "from_type", "to_type")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"),
                F.min("gap_us").alias("_mn"),
                pick(0.5).alias("_md"), pick(0.9).alias("_p90"),
                F.max("gap_us").alias("_mx")))
    return agg.select(
        "step", "from_type", "to_type", "n_converted",
        (F.col("_mn") / 1e6).alias("min_gap_s"),
        (F.col("_md") / 1e6).alias("median_gap_s"),
        (F.col("_p90") / 1e6).alias("p90_gap_s"),
        (F.col("_mx") / 1e6).alias("max_gap_s"))


def funnel_conversion_stats_duck(steps: list[str],
                                 within_seconds: int | None = None,
                                 key_col: str = "user_id",
                                 ts_col: str = "ts",
                                 type_col: str = "event_type",
                                 seq_col: str = "event_id",
                                 table: str = "events") -> str:
    """DuckDB mirror of :func:`funnel_conversion_stats` — the funnel
    layer replay feeding the same type-1 rank picks."""
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError("funnel_conversion_stats_duck only mirrors "
                        f"string steps; got: {bad!r}")
    k = len(steps)
    in_list = ", ".join(_q(s) for s in steps)
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    layers = []
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    for i, step in enumerate(steps, start=1):
        cond = f"{type_col} = {_q(step)}"
        if i > 1:
            cond += f" AND {ts_col} > _r{i - 1}"
            if within_seconds is not None:
                cond += (f" AND {ts_col} <= _r1 + "
                         f"INTERVAL {within_seconds} SECOND")
        layers.append(
            f"l{i} AS (SELECT {prev_cols}, "
            f"MIN(CASE WHEN {cond} THEN {ts_col} END) {over} AS _r{i} "
            f"FROM {src})")
        prev_cols += f", _r{i}"
        src = f"l{i}"
    t_cols = ", ".join(f"MIN(_r{i}) AS t{i}" for i in range(1, k + 1))
    gap_rows = " UNION ALL ".join(
        f"SELECT {i} AS step, {_q(steps[i - 1])} AS from_type, "
        f"{_q(steps[i])} AS to_type, "
        f"date_diff('microsecond', t{i}, t{i + 1}) AS gap_us "
        f"FROM ft WHERE t{i + 1} IS NOT NULL"
        for i in range(1, k))
    return f"""
WITH e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col}
           FROM {table} WHERE {type_col} IN ({in_list})),
{", ".join(layers)},
ft AS (SELECT {key_col}, {t_cols} FROM {src} GROUP BY {key_col}),
gaps AS ({gap_rows}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY step ORDER BY gap_us) AS rn,
         COUNT(*) OVER (PARTITION BY step) AS n
  FROM gaps)
SELECT step, from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       MIN(gap_us) / 1e6 AS min_gap_s,
       MIN(CASE WHEN rn = CEIL(n * 0.5) THEN gap_us END) / 1e6
         AS median_gap_s,
       MIN(CASE WHEN rn = CEIL(n * 0.9) THEN gap_us END) / 1e6
         AS p90_gap_s,
       MAX(gap_us) / 1e6 AS max_gap_s
FROM ranked GROUP BY step, from_type, to_type
"""


def expand_quantified_steps(steps: list) -> tuple[list, list[int]]:
    """Desugar quantified pattern entries — FlinkCEP ``times(n)`` /
    ``timesOrMore(n)`` / ``oneOrMore`` (MATCH_RECOGNIZE ``B{n,}`` /
    ``B+``) — into the flat strict-after expansion the window layers
    run. An entry is a plain step (string or Column) or a ``(step, n)``
    tuple meaning "n or more repetitions".

    Under the funnel's earliest-completion (skip-till-next-match)
    semantics, ``timesOrMore(n)`` and ``times(n)`` complete at the SAME
    instant — the n-th repetition; later repetitions are permitted by
    relaxed contiguity but cannot move an earliest completion. So one
    expansion (the step repeated n times, each strictly after the last)
    serves all three quantifiers, with ``B+`` = ``(B, 1)`` ≡ a plain
    step. Repetitions chain on STRICT timestamp order: two matches at
    the same timestamp count once (the engine's documented tie
    behavior; FlinkCEP on a serialized stream has no simultaneity).

    Returns (flat_steps, last_layer_index_per_original_step)."""
    flat: list = []
    last: list[int] = []
    for s in steps:
        if isinstance(s, tuple):
            step, n = s
            if not isinstance(n, int) or n < 1:
                raise ValueError(f"quantifier must be an int >= 1, got {n!r}")
            flat.extend([step] * n)
        else:
            flat.append(s)
        last.append(len(flat))
    return flat, last


def quantified_funnel_times(events: DataFrame, steps: list,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            seq_col: str = "event_id",
                            within_seconds: int | None = None) -> DataFrame:
    """``funnel_times`` with Kleene/looping pattern steps: each
    ``(step, n)`` entry requires n+ repetitions of the step (strictly
    time-increasing) before the pattern advances — FlinkCEP's
    ``timesOrMore`` / MATCH_RECOGNIZE ``A B{n,} C``. Output is one
    column per ORIGINAL step: t_j = the earliest instant steps 1..j
    complete, a quantified step completing at its n-th repetition.

    Same scale shape as the flat funnel — the expansion adds window
    LAYERS over the single (key, ts) exchange, never another shuffle,
    so ``B{100,}`` costs 100 running-min columns on one sort, not 100
    joins."""
    flat, last = expand_quantified_steps(steps)
    ft = funnel_times(events, flat, key_col, ts_col, type_col, seq_col,
                      within_seconds)
    return ft.select(key_col, *[
        F.col(f"t{li}").alias(f"t{j}")
        for j, li in enumerate(last, start=1)])


def quantified_funnel_times_duck(steps: list,
                                 within_seconds: int | None = None,
                                 key_col: str = "user_id",
                                 ts_col: str = "ts",
                                 type_col: str = "event_type",
                                 seq_col: str = "event_id",
                                 table: str = "events") -> str:
    """DuckDB mirror of :func:`quantified_funnel_times` — the same
    desugaring feeding the same stacked running-min layer SQL as
    ``funnel_summary_duck``, collapsed to one t-column per original
    step. String steps only (the Column caveat of the flat mirror)."""
    flat, last = expand_quantified_steps(steps)
    bad = [s for s in flat if not isinstance(s, str)]
    if bad:
        raise TypeError(
            "quantified_funnel_times_duck only mirrors string steps; "
            f"got non-string steps: {bad!r}")
    in_list = ", ".join(_q(s) for s in set(flat))
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    layers = []
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    for i, step in enumerate(flat, start=1):
        cond = f"{type_col} = {_q(step)}"
        if i > 1:
            cond += f" AND {ts_col} > _r{i - 1}"
            if within_seconds is not None:
                cond += (f" AND {ts_col} <= _r1 + "
                         f"INTERVAL {within_seconds} SECOND")
        layers.append(
            f"l{i} AS (SELECT {prev_cols}, "
            f"MIN(CASE WHEN {cond} THEN {ts_col} END) {over} AS _r{i} "
            f"FROM {src})")
        prev_cols += f", _r{i}"
        src = f"l{i}"
    t_cols = ", ".join(f"MIN(_r{li}) AS t{j}"
                       for j, li in enumerate(last, start=1))
    return f"""
WITH e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col}
           FROM {table} WHERE {type_col} IN ({in_list})),
{", ".join(layers)}
SELECT {key_col}, {t_cols} FROM {src} GROUP BY {key_col}
"""


def negated_funnel_times(events: DataFrame, steps: list[str | Column],
                         negations: dict[int, str | Column],
                         key_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type",
                         seq_col: str = "event_id",
                         within_seconds: int | None = None) -> DataFrame:
    """``funnel_times`` with ABSENCE constraints — FlinkCEP's
    ``notFollowedBy`` / MATCH_RECOGNIZE patterns with a negated step:
    "step i then step i+1 with NO forbidden event between them".
    ``negations`` maps a gap index i (1-based, 1 ≤ i < len(steps)) to
    the event type (or Column predicate) that must NOT occur strictly
    between t_i and t_{i+1}.

    Semantics (the family's documented greedy first-entry discipline,
    the same clock `within_seconds` uses): anchors are the earliest
    completions; a gap is violated when the earliest forbidden event
    strictly after t_i lands strictly before t_{i+1}. Violation is
    MONOTONE — every later step-(i+1) candidate is also after that
    forbidden event — so validating the earliest completion against the
    earliest forbidden event decides the pattern exactly; no retry from
    a later anchor can succeed under a fixed anchor chain. Output:
    (key, t1..tk) where t_j is NULL unless steps 1..j completed AND
    every negated gap before j is clean — plus one ``cN_i`` column per
    negated gap (the earliest forbidden instant after t_i; NULL =
    never) so callers can audit WHY a pattern was rejected.

    Scale shape — unchanged from the flat funnel: each negated gap adds
    ONE anti-window layer (the running min of forbidden-after-r_i) over
    the SAME (key, ts, seq) exchange and sort; the prefilter widens to
    the forbidden types but the plan still has exactly one shuffle. The
    running value _c_i converges to "earliest forbidden event after the
    true t_i" for every row at ts ≥ that instant, because all evidence
    for t_i occurs at timestamps ≤ t_i (the funnel's running-min
    convergence argument, which the Kleene expansion also leans on)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    for i in negations:
        if not (1 <= i < k):
            raise ValueError(
                f"negation gap {i} out of range (1..{k - 1})")
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in steps]
    neg_conds = {i: (F.col(type_col) == s if isinstance(s, str) else s)
                 for i, s in negations.items()}
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    if all(isinstance(s, str) for s in steps) and \
            all(isinstance(s, str) for s in negations.values()):
        types = list(steps) + [s for s in negations.values()]
        df = (events.filter(F.col(type_col).isin(types))
              .select(key_col, seq_col, ts_col, type_col))
    else:
        any_row = conds[0]
        for c in list(conds[1:]) + list(neg_conds.values()):
            any_row = any_row | c
        df = events.filter(any_row)
    for i, (step, cond) in enumerate(zip(steps, conds), start=1):
        if i > 1:
            cond = cond & (F.col(ts_col) > F.col(f"_r{i - 1}"))
        if within_seconds is not None and i > 1:
            cond = cond & (F.col(ts_col) <= F.col("_r1")
                           + F.expr(f"INTERVAL {within_seconds} SECOND"))
        df = df.withColumn(
            f"_r{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        if i in neg_conds:
            df = df.withColumn(
                f"_c{i}",
                F.min(F.when(neg_conds[i]
                             & (F.col(ts_col) > F.col(f"_r{i}")),
                             F.col(ts_col))).over(w))
    agg = df.groupBy(key_col).agg(
        *([F.min(f"_r{i}").alias(f"_t{i}") for i in range(1, k + 1)]
          + [F.min(f"_c{i}").alias(f"_cn{i}") for i in sorted(neg_conds)]))
    # cascade: t_j survives only while every negated gap before it is
    # clean (violated = forbidden instant strictly inside (t_i, t_{i+1}))
    out_cols = [F.col("_t1").alias("t1")]
    ok = F.lit(True)
    for j in range(2, k + 1):
        if (j - 1) in neg_conds:
            ok = ok & ~(F.col(f"_cn{j - 1}").isNotNull()
                        & (F.col(f"_cn{j - 1}") < F.col(f"_t{j}")))
        out_cols.append(
            F.when(ok, F.col(f"_t{j}")).alias(f"t{j}"))
    out_cols += [F.col(f"_cn{i}").alias(f"c{i}") for i in sorted(neg_conds)]
    return agg.select(key_col, *out_cols)


def negated_funnel_times_duck(steps: list[str], negations: dict[int, str],
                              within_seconds: int | None = None,
                              key_col: str = "user_id", ts_col: str = "ts",
                              type_col: str = "event_type",
                              seq_col: str = "event_id",
                              table: str = "events") -> str:
    """DuckDB mirror of :func:`negated_funnel_times` — the same stacked
    running-min layers plus one anti layer per negated gap, the same
    monotone post-validation cascade. String steps only (the family's
    Column caveat)."""
    bad = [s for s in list(steps) + list(negations.values())
           if not isinstance(s, str)]
    if bad:
        raise TypeError(
            "negated_funnel_times_duck only mirrors string steps; "
            f"got: {bad!r}")
    k = len(steps)
    types = list(steps) + list(negations.values())
    in_list = ", ".join(_q(s) for s in dict.fromkeys(types))
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    layers = []
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    li = 0
    for i, step in enumerate(steps, start=1):
        cond = f"{type_col} = {_q(step)}"
        if i > 1:
            cond += f" AND {ts_col} > _r{i - 1}"
            if within_seconds is not None:
                cond += (f" AND {ts_col} <= _r1 + "
                         f"INTERVAL {within_seconds} SECOND")
        li += 1
        layers.append(
            f"l{li} AS (SELECT {prev_cols}, "
            f"MIN(CASE WHEN {cond} THEN {ts_col} END) {over} AS _r{i} "
            f"FROM {src})")
        prev_cols += f", _r{i}"
        src = f"l{li}"
        if i in negations:
            ncond = (f"{type_col} = {_q(negations[i])} "
                     f"AND {ts_col} > _r{i}")
            li += 1
            layers.append(
                f"l{li} AS (SELECT {prev_cols}, "
                f"MIN(CASE WHEN {ncond} THEN {ts_col} END) {over} AS _c{i} "
                f"FROM {src})")
            prev_cols += f", _c{i}"
            src = f"l{li}"
    t_aggs = ", ".join(
        [f"MIN(_r{i}) AS _t{i}" for i in range(1, k + 1)]
        + [f"MIN(_c{i}) AS _cn{i}" for i in sorted(negations)])
    sel = ["_t1 AS t1"]
    ok_terms: list[str] = []
    for j in range(2, k + 1):
        if (j - 1) in negations:
            ok_terms.append(
                f"NOT (_cn{j - 1} IS NOT NULL AND _cn{j - 1} < _t{j})")
        cond = " AND ".join(ok_terms) if ok_terms else "TRUE"
        sel.append(f"CASE WHEN {cond} THEN _t{j} END AS t{j}")
    sel += [f"_cn{i} AS c{i}" for i in sorted(negations)]
    return f"""
WITH e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col}
           FROM {table} WHERE {type_col} IN ({in_list})),
{", ".join(layers)},
ft AS (SELECT {key_col}, {t_aggs} FROM {src} GROUP BY {key_col})
SELECT {key_col}, {", ".join(sel)} FROM ft
"""


def _strict_blocks(k: int, contiguity: list[str]) -> list[tuple[int, int]]:
    """Split steps 1..k into maximal strict runs: gap i ('next') glues
    step i to step i+1 into one block; relaxed gaps ('followedBy')
    separate blocks. Returns 1-based inclusive (start, end) pairs."""
    blocks, start = [], 1
    for i, g in enumerate(contiguity, start=1):
        if g == "followedBy":
            blocks.append((start, i))
            start = i + 1
    blocks.append((start, k))
    return blocks


def strict_funnel_times(events: DataFrame, steps: list[str | Column],
                        contiguity: list[str] | None = None,
                        not_next: dict[int, str | Column] | None = None,
                        key_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type",
                        seq_col: str = "event_id",
                        within_seconds: int | None = None) -> DataFrame:
    """``funnel_times`` with STRICT-CONTIGUITY gaps — FlinkCEP's
    ``next`` / ``notNext`` (MATCH_RECOGNIZE without a skip clause;
    reference parity: FlinkCEP is the Flink capability the reference's
    stack ships alongside the pipeline in AiJob.java):
    ``contiguity[i-1]`` is ``'next'`` (step i+1 must be the key's
    IMMEDIATELY following event after the matched step i — any
    intervening event of any type breaks the match) or ``'followedBy'``
    (the family's skip-till-next default). ``not_next`` maps a step i
    to a predicate its immediately-following event must NOT satisfy
    (``notNext``; a missing next event passes — the bounded-input
    reading); it attaches only where step i ends a strict run (a
    ``'next'`` gap at i would pin that very event to step i+1).

    Unlike the relaxed funnel, the earliest step-1 anchor is NOT always
    extendable under strict gaps (A A B matches A→next→B only from the
    SECOND A), so fixed-anchor layering is wrong here. Instead each
    maximal strict run of steps becomes a BLOCK matched per anchor row
    with ``lead()`` adjacency (every anchor is tried — FlinkCEP's NFA
    does exactly this), and blocks chain with the relaxed running-min
    layers. Convergence: a block's end ts is ``lead(ts, L-1)`` of its
    anchor, anchors and ends sort identically per key, so the running
    min of matched step-i ts converges exactly like the flat funnel's
    r_i (all anchors with end ts ≤ T sit at rows ≤ the row of T).

    Output: (key, t1..tk) — t_i the matched ts of step i in the
    earliest valid chain, NULL from the first incomplete block on.
    Keys with NO step-type event are omitted (funnel_times' key
    universe — enforced at the aggregate since the scan itself cannot
    pre-filter).

    Scale shape: adjacency is over the key's RAW event stream, so the
    scan cannot pre-filter to step types (an intervening non-step event
    must break strict gaps) — it projects (key, seq, ts, type) only;
    every lead and running-min layer shares ONE (key, ts, seq) exchange
    and sort. ``within_seconds`` bounds every block end against the
    block-1 anchor (_t1), the family's greedy first-entry clock."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    contiguity = contiguity or ["followedBy"] * (k - 1)
    if len(contiguity) != k - 1:
        raise ValueError(f"contiguity needs {k - 1} gaps, "
                         f"got {len(contiguity)}")
    bad = [g for g in contiguity if g not in ("next", "followedBy")]
    if bad:
        raise ValueError(f"unknown contiguity values: {bad!r}")
    not_next = not_next or {}
    for i in not_next:
        if not (1 <= i <= k):
            raise ValueError(f"not_next step {i} out of range (1..{k})")
        if i < k and contiguity[i - 1] == "next":
            raise ValueError(
                f"not_next at step {i} conflicts with its 'next' gap — "
                "the immediately-following event is already step "
                f"{i + 1}")
    blocks = _strict_blocks(k, contiguity)
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in steps]
    xconds = {i: (F.col(type_col) == s if isinstance(s, str) else s)
              for i, s in not_next.items()}
    df = events.select(key_col, seq_col, ts_col, type_col) \
        if all(isinstance(s, str) for s in steps) and \
        all(isinstance(s, str) for s in not_next.values()) else events
    for i, c in enumerate(conds, start=1):
        df = df.withColumn(f"_m{i}", c)
    for i, c in xconds.items():
        df = df.withColumn(f"_x{i}", c)
    w_ord = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
    prev_end = None
    for b, (a, e) in enumerate(blocks, start=1):
        ln = e - a + 1
        # materialize the anchor-relative lead timestamps FIRST — a
        # lead() inside a running min() would be an (illegal) nested
        # window expression; as plain columns both share the one sort
        for d in range(1, ln):
            df = df.withColumn(f"_lt{b}_{d}",
                               F.lead(ts_col, d).over(w_ord))
        end_col = F.col(f"_lt{b}_{ln - 1}") if ln > 1 else F.col(ts_col)
        match = F.col(f"_m{a}")
        for d in range(1, ln):
            match = match & F.coalesce(
                F.lead(f"_m{a + d}", d).over(w_ord), F.lit(False))
        if e in xconds:
            match = match & ~F.coalesce(
                F.lead(f"_x{e}", ln).over(w_ord), F.lit(False))
        cond = match
        if prev_end is not None:
            cond = cond & (F.col(ts_col) > F.col(prev_end))
        if within_seconds is not None:
            bound = F.col("_t1") if b > 1 else F.col(ts_col)
            cond = cond & (end_col <= bound
                           + F.expr(f"INTERVAL {within_seconds} SECOND"))
        df = df.withColumn(f"_ok{b}", cond)
        # _t{a} doubles as the block anchor min and (at d = ln-1) the
        # block-end min the next block chains on — no separate _s/_e
        for d in range(ln):
            step_ts = F.col(f"_lt{b}_{d}") if d > 0 else F.col(ts_col)
            df = df.withColumn(f"_t{a + d}", F.min(
                F.when(F.col(f"_ok{b}"), step_ts)).over(w_run))
        prev_end = f"_t{e}"
    # key universe parity with funnel_times: the scan can't pre-filter
    # (adjacency needs every event), so drop keys with NO step-TYPE
    # event at the aggregate instead — otherwise every key in the
    # events table would emit an all-NULL row the relaxed funnel omits
    any_step = F.col("_m1")
    for i in range(2, k + 1):
        any_step = any_step | F.col(f"_m{i}")
    return (df.groupBy(key_col)
            .agg(*([F.min(f"_t{i}").alias(f"t{i}")
                    for i in range(1, k + 1)]
                   + [F.max(F.when(any_step, 1)).alias("_any")]))
            .filter(F.col("_any") == 1)
            .drop("_any"))


def strict_funnel_times_duck(steps: list[str],
                             contiguity: list[str] | None = None,
                             not_next: dict[int, str] | None = None,
                             within_seconds: int | None = None,
                             key_col: str = "user_id", ts_col: str = "ts",
                             type_col: str = "event_type",
                             seq_col: str = "event_id",
                             table: str = "events") -> str:
    """DuckDB mirror of :func:`strict_funnel_times` — the same per-row
    lead-adjacency block matches chained by the same running-min
    layers (leads materialized a layer ahead of the mins, the nested-
    window rule again). String steps only (the family's Column
    caveat)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    bad = [s for s in list(steps) + list((not_next or {}).values())
           if not isinstance(s, str)]
    if bad:
        raise TypeError("strict_funnel_times_duck only mirrors string "
                        f"steps; got: {bad!r}")
    k = len(steps)
    contiguity = contiguity or ["followedBy"] * (k - 1)
    not_next = not_next or {}
    blocks = _strict_blocks(k, contiguity)
    over = f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col})"
    run = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
           "ROWS UNBOUNDED PRECEDING)")
    flags = ", ".join(
        [f"({type_col} = {_q(s)}) AS _m{i}"
         for i, s in enumerate(steps, start=1)]
        + [f"({type_col} = {_q(s)}) AS _x{i}"
           for i, s in not_next.items()])
    layers = [f"f AS (SELECT {key_col}, {seq_col}, {ts_col}, {flags} "
              f"FROM {table})"]
    mcols = ", ".join([f"_m{i}" for i in range(1, k + 1)]
                      + [f"_x{i}" for i in not_next])
    base_cols = f"{key_col}, {seq_col}, {ts_col}, {mcols}"
    carry = ""  # accumulated _t columns
    src, li, prev_end = "f", 0, None
    for b, (a, e) in enumerate(blocks, start=1):
        ln = e - a + 1
        # layer 1: materialize leads + the block-match flag
        terms = [f"_m{a}"]
        terms += [f"COALESCE(LEAD(_m{a + d}, {d}) {over}, FALSE)"
                  for d in range(1, ln)]
        if e in not_next:
            terms.append(
                f"NOT COALESCE(LEAD(_x{e}, {ln}) {over}, FALSE)")
        lts = "".join(f", LEAD({ts_col}, {d}) {over} AS _lt{b}_{d}"
                      for d in range(1, ln))
        end_ts = f"_lt{b}_{ln - 1}" if ln > 1 else ts_col
        cond = " AND ".join(terms)
        if prev_end is not None:
            cond += f" AND {ts_col} > {prev_end}"
        if within_seconds is not None:
            bound = "_t1" if b > 1 else ts_col
            cond += (f" AND {end_ts} <= {bound} + "
                     f"INTERVAL {within_seconds} SECOND")
        li += 1
        layers.append(
            f"l{li} AS (SELECT {base_cols}{carry}{lts}, "
            f"({cond}) AS _ok{b} FROM {src})")
        src = f"l{li}"
        # layer 2: the running-min picks over the materialized leads
        picks = []
        for d in range(ln):
            sts = f"_lt{b}_{d}" if d > 0 else ts_col
            picks.append(f"MIN(CASE WHEN _ok{b} THEN {sts} END) "
                         f"{run} AS _t{a + d}")
        li += 1
        layers.append(
            f"l{li} AS (SELECT {base_cols}{carry}, "
            + ", ".join(picks) + f" FROM {src})")
        carry += "".join(f", _t{a + d}" for d in range(ln))
        src = f"l{li}"
        prev_end = f"_t{e}"
    t_aggs = ", ".join(f"MIN(_t{i}) AS t{i}" for i in range(1, k + 1))
    any_step = " OR ".join(f"_m{i}" for i in range(1, k + 1))
    return (f"WITH {', '.join(layers)},\n"
            f"agg AS (SELECT {key_col}, {t_aggs}, "
            f"MAX(CASE WHEN {any_step} THEN 1 ELSE 0 END) AS _any "
            f"FROM {src} GROUP BY {key_col})\n"
            f"SELECT {key_col}, "
            + ", ".join(f"t{i}" for i in range(1, k + 1))
            + " FROM agg WHERE _any = 1")


def _consecutive_desugar(steps: list, consecutive) -> tuple[list,
                                                            list[str],
                                                            list[int]]:
    """Shared desugaring for FlinkCEP ``consecutive()`` — strict
    contiguity INSIDE looping pattern steps: expand the quantifiers
    (``expand_quantified_steps``) and build the flat contiguity vector
    where every gap internal to a ``consecutive`` loop is ``'next'``
    and every other gap stays ``'followedBy'`` (FlinkCEP's default —
    ``consecutive()`` binds to the looping pattern only, never to the
    gaps between pattern steps). Returns (flat_steps, contiguity,
    last_layer_per_original_step)."""
    cons = set(consecutive)
    k = len(steps)
    for j in cons:
        if not (1 <= j <= k):
            raise ValueError(f"consecutive step {j} out of range "
                             f"(1..{k})")
        s = steps[j - 1]
        if not (isinstance(s, tuple) and s[1] >= 2):
            # a single-repetition loop has no internal gap — under the
            # family's earliest-completion semantics oneOrMore()
            # completes at its FIRST repetition, so consecutive() on it
            # would be silently vacuous (the `until` discipline: refuse
            # rather than ignore)
            raise ValueError(
                f"consecutive on step {j} is vacuous: it needs a "
                f"(step, n>=2) quantifier, got {s!r}")
    flat, last = expand_quantified_steps(steps)
    contiguity: list[str] = []
    pos = 0
    for j, s in enumerate(steps, start=1):
        n = s[1] if isinstance(s, tuple) else 1
        if pos > 0:
            contiguity.append("followedBy")   # gap BETWEEN steps
        contiguity.extend(
            ["next" if j in cons else "followedBy"] * (n - 1))
        pos += n
    assert len(contiguity) == len(flat) - 1
    return flat, contiguity, last


def consecutive_funnel_times(events: DataFrame, steps: list,
                             consecutive,
                             key_col: str = "user_id", ts_col: str = "ts",
                             type_col: str = "event_type",
                             seq_col: str = "event_id",
                             within_seconds: int | None = None
                             ) -> DataFrame:
    """``quantified_funnel_times`` with FlinkCEP's ``consecutive()``
    on chosen looping steps: ``steps`` is the quantified pattern
    (plain steps and ``(step, n)`` loops), ``consecutive`` the 1-based
    ORIGINAL step indices whose n repetitions must be strictly
    contiguous EVENTS — ``times(n).consecutive()`` /
    ``oneOrMore().consecutive()``: any intervening event of ANY type
    between two repetitions breaks the run. Gaps between original
    steps stay relaxed (FlinkCEP's default — ``consecutive()`` binds
    to its looping pattern only).

    Pure composition: the quantifier expansion feeds
    :func:`strict_funnel_times` with a contiguity vector marking every
    internal gap of a consecutive loop ``'next'``; output collapses to
    one t per ORIGINAL step (a loop's t = its last repetition's
    instant, the quantified family's convention). The strict engine's
    per-anchor block matching does the real work — an n-rep consecutive
    loop is exactly a length-n strict block, every anchor tried (the
    A-A-B lesson). Same scale shape: the whole pattern is ONE
    (key, ts, seq) exchange; adjacency needs the raw stream, so the
    scan projects but cannot type-prefilter (the strict family's
    documented cost)."""
    flat, contiguity, last = _consecutive_desugar(steps, consecutive)
    st = strict_funnel_times(events, flat, contiguity, None, key_col,
                             ts_col, type_col, seq_col, within_seconds)
    return st.select(key_col, *[
        F.col(f"t{li}").alias(f"t{j}")
        for j, li in enumerate(last, start=1)])


def consecutive_funnel_times_duck(steps: list, consecutive,
                                  within_seconds: int | None = None,
                                  key_col: str = "user_id",
                                  ts_col: str = "ts",
                                  type_col: str = "event_type",
                                  seq_col: str = "event_id",
                                  table: str = "events") -> str:
    """DuckDB mirror of :func:`consecutive_funnel_times` — the same
    desugaring feeding the strict mirror, collapsed to one t per
    original step. String steps only (the family's Column caveat)."""
    flat, contiguity, last = _consecutive_desugar(steps, consecutive)
    inner = strict_funnel_times_duck(flat, contiguity, None,
                                     within_seconds, key_col, ts_col,
                                     type_col, seq_col, table)
    t_cols = ", ".join(f"t{li} AS t{j}"
                       for j, li in enumerate(last, start=1))
    return (f"SELECT {key_col}, {t_cols} "
            f"FROM ({inner}) _consecutive_inner")


# --------------------------------------------- all-matches emission


def all_funnel_matches(events: DataFrame, steps: list[str | Column],
                       key_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       within_seconds: int | None = None) -> DataFrame:
    """EVERY completed funnel match, one row per step-1 anchor EVENT —
    FlinkCEP's default ``AfterMatchSkipStrategy.noSkip()`` with relaxed
    contiguity (``followedBy``): each anchor continues greedily (the
    FIRST step-i event strictly after the matched step i−1 — relaxed
    contiguity matches the first qualifying event; ``followedByAny``'s
    full cross product is deliberately out of scope, it is exponential
    by construction), so a key with m completing anchors emits m rows
    where ``funnel_times`` min-collapses them to one. Output:
    (key, t1..tk); anchors whose chain never completes emit nothing.
    Two anchors at the SAME timestamp both emit (identical rows — one
    per EVENT, FlinkCEP's per-event match identity).

    Semantics are value-based: chains advance on STRICT timestamp
    order (the family's tie rule), so the result is independent of any
    sequence column — matching is over microsecond instants, and
    equal-instant events share one fate.

    ``within_seconds`` keeps a match only when t_k ≤ t1 + within. The
    greedy chain MINIMIZES t_k over all chains from its anchor (the
    exchange argument: taking the earliest available step-i event never
    shrinks the candidate set for step i+1), so filtering the greedy
    chain is exact — an anchor passes iff ANY chain from it would.

    Scale shape — the funnel discipline, still ONE shuffle: the scan
    pre-filters to step types (relaxed contiguity never inspects
    intervening events) and projects (key, ts, type); the k−1 chain
    layers are struct-valued running mins over strictly-after RANGE
    frames sharing one (key, us) exchange and sort, each layer
    materialized before the next references it (the nested-window
    rule). The chain struct for step i carries (u_i..u_k), built
    BACKWARD from step k: a step-i row's chain = its own instant + the
    chain of the earliest VALID step-(i+1) row strictly after it — the
    struct min is ordered by u_i first, and equal-u_i candidates carry
    identical continuations (frames depend only on the instant), so
    the pick is deterministic. Output is |step-1 events|-bounded."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in steps]
    if all(isinstance(s, str) for s in steps):
        df = (events.filter(F.col(type_col).isin(steps))
              .select(key_col, ts_col, type_col))
    else:
        any_step = conds[0]
        for c in conds[1:]:
            any_step = any_step | c
        df = events.filter(any_step)
    # timestamp_diff/timestamp_add accept both TIMESTAMP and
    # TIMESTAMP_NTZ (events loads as NTZ under the oracle harness),
    # unlike unix_micros which rejects NTZ outright — the decay
    # family's idiom
    epoch = F.lit("1970-01-01 00:00:00").cast(dict(df.dtypes)[ts_col])
    df = df.withColumn(
        "_us", F.timestamp_diff("MICROSECOND", epoch, F.col(ts_col)))
    for i, c in enumerate(conds, start=1):
        df = df.withColumn(f"_m{i}", c)
    w_after = (Window.partitionBy(key_col).orderBy("_us")
               .rangeBetween(1, Window.unboundedFollowing))
    if k >= 2:
        df = df.withColumn(
            f"_ch{k}",
            F.min(F.when(F.col(f"_m{k}"),
                         F.struct(F.col("_us").alias(f"u{k}"))))
            .over(w_after))
        for i in range(k - 1, 1, -1):
            fields = [F.col("_us").alias(f"u{i}")] + [
                F.col(f"_ch{i + 1}.u{j}").alias(f"u{j}")
                for j in range(i + 1, k + 1)]
            df = df.withColumn(
                f"_ch{i}",
                F.min(F.when(F.col(f"_m{i}")
                             & F.col(f"_ch{i + 1}").isNotNull(),
                             F.struct(*fields)))
                .over(w_after))
    anchors = df.filter(F.col("_m1")) if k == 1 else \
        df.filter(F.col("_m1") & F.col("_ch2").isNotNull())
    if within_seconds is not None and k >= 2:
        anchors = anchors.filter(
            F.col(f"_ch2.u{k}") - F.col("_us")
            <= within_seconds * 1_000_000)
    back = lambda c: F.timestamp_add("MICROSECOND", c, epoch)  # noqa: E731
    tcols = [back(F.col("_us")).alias("t1")] + [
        back(F.col(f"_ch2.u{j}")).alias(f"t{j}")
        for j in range(2, k + 1)]
    return anchors.select(key_col, *tcols)


def _all_matches_core_duck(steps: list[str],
                           within_seconds: int | None = None,
                           key_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           table: str = "events") -> str:
    """The microsecond-level core of the :func:`all_funnel_matches`
    mirror: (key, u1..uk) BIGINT per completed anchor — shared by the
    timestamp-emitting mirror and the skip-past-last oracle's rounds.
    String steps only (the family's Column caveat)."""
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError("the all-matches mirror only handles string "
                        f"steps; got: {bad!r}")
    k = len(steps)
    in_list = ", ".join(_q(s) for s in set(steps))
    flags = ", ".join(f"({type_col} = {_q(s)}) AS _m{i}"
                      for i, s in enumerate(steps, start=1))
    aft = (f"OVER (PARTITION BY {key_col} ORDER BY _us "
           "RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)")
    layers = [f"f AS (SELECT {key_col}, "
              f"epoch_us(CAST({ts_col} AS TIMESTAMP)) AS _us, {flags} "
              f"FROM {table} WHERE {type_col} IN ({in_list}))"]
    src = "f"
    if k >= 2:
        layers.append(
            f"c{k} AS (SELECT *, MIN(CASE WHEN _m{k} THEN "
            f"{{'u{k}': _us}} END) {aft} AS _ch{k} FROM {src})")
        src = f"c{k}"
        for i in range(k - 1, 1, -1):
            fields = ", ".join(
                [f"'u{i}': _us"]
                + [f"'u{j}': _ch{i + 1}.u{j}"
                   for j in range(i + 1, k + 1)])
            layers.append(
                f"c{i} AS (SELECT *, MIN(CASE WHEN _m{i} AND "
                f"_ch{i + 1} IS NOT NULL THEN {{{fields}}} END) "
                f"{aft} AS _ch{i} FROM {src})")
            src = f"c{i}"
    ucols = ["_us AS u1"] + [f"_ch2.u{j} AS u{j}"
                             for j in range(2, k + 1)]
    where = "_m1" if k == 1 else "_m1 AND _ch2 IS NOT NULL"
    if within_seconds is not None and k >= 2:
        where += f" AND _ch2.u{k} - _us <= {within_seconds * 1_000_000}"
    return (f"WITH {', '.join(layers)} "
            f"SELECT {key_col}, {', '.join(ucols)} "
            f"FROM {src} WHERE {where}")


def all_funnel_matches_duck(steps: list[str],
                            within_seconds: int | None = None,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            table: str = "events") -> str:
    """DuckDB mirror of :func:`all_funnel_matches` — the same backward
    struct-chain layers over the same strictly-after RANGE frames
    (struct MIN is lexicographic in both engines, u_i leading)."""
    k = len(steps)
    core = _all_matches_core_duck(steps, within_seconds, key_col,
                                  ts_col, type_col, table)
    tcols = ", ".join(f"make_timestamp(u{j}) AS t{j}"
                      for j in range(1, k + 1))
    return f"SELECT {key_col}, {tcols} FROM ({core}) _am"


def consumed_funnel_matches(events: DataFrame, steps: list[str | Column],
                            max_matches: int,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            within_seconds: int | None = None
                            ) -> DataFrame:
    """Non-overlapping funnel matches — FlinkCEP's
    ``AfterMatchSkipStrategy.skipPastLastEvent()``: once a match emits,
    its events are CONSUMED, and the next match must start strictly
    after the previous match's last event. Output: (key, t1..tk,
    match_idx) with match_idx 1-based in time order, at most
    ``max_matches`` rows per key (the bounded-rounds contract, like the
    graph family's fixed iterations — selection is inherently
    sequential per key, so the round count is part of the operator's
    semantics and the oracle unrolls it). Simultaneous anchors collapse
    to one selected match per round (equal-instant chains are
    identical — the family's tie rule).

    Selection replays FlinkCEP's greedy leftmost discipline: round r
    picks each key's earliest (by (u1..uk) lexicographic order — u1
    ties carry identical chains) surviving match with t1 strictly
    after round r−1's t_k.

    Scale shape: the candidate set is :func:`all_funnel_matches`'s
    |step-1 events|-bounded output, persisted once; each round is ONE
    key-partitioned join + partial-aggregated struct-min over it,
    localCheckpoint'ed (the PageRank discipline), with an early exit
    when every key is exhausted."""
    if max_matches < 1:
        raise ValueError(f"max_matches must be >= 1, got {max_matches}")
    k = len(steps)
    m = all_funnel_matches(events, steps, key_col, ts_col, type_col,
                           within_seconds)
    epoch = F.lit("1970-01-01 00:00:00").cast(dict(m.dtypes)["t1"])
    mu = m.select(key_col, *[
        F.timestamp_diff("MICROSECOND", epoch, F.col(f"t{i}"))
        .alias(f"u{i}")
        for i in range(1, k + 1)]).persist()
    try:
        picked: list[DataFrame] = []
        frontier = None      # (key, _T): last consumed instant per key
        for r in range(1, max_matches + 1):
            if r == 1:
                cand = mu
            else:
                cand = (mu.join(frontier, on=key_col)
                        .filter(F.col("u1") > F.col("_T")))
            sel = (cand.groupBy(key_col)
                   .agg(F.min(F.struct(*[F.col(f"u{i}")
                                         for i in range(1, k + 1)]))
                        .alias("_s"))
                   .select(key_col,
                           *[F.col(f"_s.u{i}").alias(f"u{i}")
                             for i in range(1, k + 1)],
                           F.lit(r).alias("match_idx"))
                   .localCheckpoint(eager=False))
            # LAZY checkpoint + count(): the emptiness probe IS the
            # materializing job, so each round costs one driver job
            # instead of two (eager checkpoint + isEmpty)
            if sel.count() == 0:
                break
            picked.append(sel)
            frontier = sel.select(key_col, F.col(f"u{k}").alias("_T"))
        if not picked:
            return m.select(key_col, *[f"t{i}" for i in range(1, k + 1)],
                            F.lit(1).alias("match_idx")).limit(0)
        out = picked[0]
        for p in picked[1:]:
            out = out.unionByName(p)
        return out.select(key_col, *[
            F.timestamp_add("MICROSECOND", F.col(f"u{i}"), epoch)
            .alias(f"t{i}")
            for i in range(1, k + 1)], "match_idx")
    finally:
        mu.unpersist()


def consumed_funnel_matches_duck(steps: list[str], max_matches: int,
                                 within_seconds: int | None = None,
                                 key_col: str = "user_id",
                                 ts_col: str = "ts",
                                 type_col: str = "event_type",
                                 table: str = "events") -> str:
    """DuckDB mirror of :func:`consumed_funnel_matches` — the same
    greedy leftmost rounds unrolled as chained MATERIALIZED CTEs over
    the all-matches core (the graph-oracle discipline)."""
    if max_matches < 1:
        raise ValueError(f"max_matches must be >= 1, got {max_matches}")
    k = len(steps)
    core = _all_matches_core_duck(steps, within_seconds, key_col,
                                  ts_col, type_col, table)
    us = ", ".join(f"u{i}" for i in range(1, k + 1))
    order = ", ".join(f"u{i}" for i in range(1, k + 1))
    cte = [f"m AS MATERIALIZED ({core})",
           f"s1 AS MATERIALIZED (SELECT {key_col}, {us} FROM m "
           f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {key_col} "
           f"ORDER BY {order}) = 1)"]
    for r in range(2, max_matches + 1):
        prev = f"s{r - 1}"
        mus = ", ".join(f"m.u{i}" for i in range(1, k + 1))
        morder = ", ".join(f"m.u{i}" for i in range(1, k + 1))
        cte.append(
            f"s{r} AS MATERIALIZED (SELECT m.{key_col}, {mus} "
            f"FROM m JOIN {prev} ON m.{key_col} = {prev}.{key_col} "
            f"WHERE m.u1 > {prev}.u{k} "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY m.{key_col} "
            f"ORDER BY {morder}) = 1)")
    tcols = ", ".join(f"make_timestamp(u{i}) AS t{i}"
                      for i in range(1, k + 1))
    parts = [f"SELECT {key_col}, {tcols}, {r} AS match_idx FROM s{r}"
             for r in range(1, max_matches + 1)]
    return ("WITH " + ",\n".join(cte) + "\n"
            + "\nUNION ALL\n".join(parts))


def _skip_phys_index(steps: list, skip_step: int, position: str
                     ) -> tuple[list, list[int], int]:
    """Resolve a ``skipToFirst(p)`` / ``skipToLast(p)`` reference to a
    PHYSICAL layer index over the quantifier expansion: first = the
    step's first repetition, last = its n-th. Shared by the operator
    and its mirror so both resolve identically. Raises the FlinkCEP
    infinite-loop guard when the skip target IS the match's own anchor
    (physical index 1): every round would re-anchor at the same event
    and selection could never advance — FlinkCEP's
    AfterMatchSkipStrategy throws for that configuration too."""
    flat, last = expand_quantified_steps(steps)
    k = len(steps)
    if not 1 <= skip_step <= k:
        raise ValueError(
            f"skip_step must be in 1..{k}, got {skip_step}")
    if position not in ("first", "last"):
        raise ValueError(
            f"position must be 'first' or 'last', got {position!r}")
    first_phys = 1 if skip_step == 1 else last[skip_step - 2] + 1
    skip_idx = first_phys if position == "first" else last[skip_step - 1]
    if skip_idx == 1:
        raise ValueError(
            "the skip target resolves to the match's own anchor "
            "(physical step 1) — selection could never advance; "
            "FlinkCEP rejects skipToFirst on the first pattern element "
            "for the same reason. Use skip_step >= 2, or a quantified "
            "first step with position='last'.")
    return flat, last, skip_idx


def skip_to_funnel_matches(events: DataFrame, steps: list,
                           skip_step: int, max_matches: int,
                           position: str = "first",
                           key_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           within_seconds: int | None = None
                           ) -> DataFrame:
    """Re-anchored funnel matches — FlinkCEP's
    ``AfterMatchSkipStrategy.skipToFirst(p)`` (``position='first'``) /
    ``skipToLast(p)`` (``position='last'``), completing the
    strategy enum beside noSkip (:func:`all_funnel_matches`, whose
    greedy earliest continuation also realizes skipToNext's
    one-match-per-anchor) and skipPastLastEvent
    (:func:`consumed_funnel_matches`): after a match emits, partial
    matches that started BEFORE the named step's matched event are
    discarded, and the next match may re-anchor AT that event or later
    (non-strict — runs starting at the skip point survive in FlinkCEP).

    ``steps`` accepts the quantified entries of
    :func:`expand_quantified_steps` (``(step, n)`` = n+ repetitions),
    which is where first vs last genuinely differ: for a quantified
    step, ``first`` re-anchors at its FIRST repetition, ``last`` at
    its n-th. ``skip_step`` is the 1-based ORIGINAL step index.
    Output: (key, t1..tk, match_idx) — one t per ORIGINAL step (a
    quantified step reports its completion instant, the quantified
    family's convention), match_idx 1-based in time order, at most
    ``max_matches`` per key (the bounded-rounds contract of
    :func:`consumed_funnel_matches`, which this operator shares —
    selection is inherently sequential per key, so the round count is
    part of the semantics and the oracle unrolls it).

    Selection replays the family's greedy leftmost discipline: round r
    picks each key's earliest (lexicographic (u1..uK) over the
    physical layers) surviving match with u1 ≥ round r−1's skip
    instant. Progress is guaranteed: the skip index resolves to a
    physical layer ≥ 2 (the guard in :func:`_skip_phys_index`), whose
    instant is strictly after the selected anchor, so anchors strictly
    increase across rounds.

    Scale shape: identical to :func:`consumed_funnel_matches` — the
    candidate set is :func:`all_funnel_matches` over the quantifier
    expansion (|step-1 events|-bounded, persisted once); each round is
    ONE key-partitioned join + partial-aggregated struct-min,
    localCheckpoint'ed, early exit when every key is exhausted."""
    if max_matches < 1:
        raise ValueError(f"max_matches must be >= 1, got {max_matches}")
    flat, last, skip_idx = _skip_phys_index(steps, skip_step, position)
    K = len(flat)
    k = len(steps)
    m = all_funnel_matches(events, flat, key_col, ts_col, type_col,
                           within_seconds)
    epoch = F.lit("1970-01-01 00:00:00").cast(dict(m.dtypes)["t1"])
    mu = m.select(key_col, *[
        F.timestamp_diff("MICROSECOND", epoch, F.col(f"t{i}"))
        .alias(f"u{i}")
        for i in range(1, K + 1)]).persist()
    try:
        picked: list[DataFrame] = []
        frontier = None      # (key, _T): the skip instant per key
        for r in range(1, max_matches + 1):
            if r == 1:
                cand = mu
            else:
                cand = (mu.join(frontier, on=key_col)
                        .filter(F.col("u1") >= F.col("_T")))
            sel = (cand.groupBy(key_col)
                   .agg(F.min(F.struct(*[F.col(f"u{i}")
                                         for i in range(1, K + 1)]))
                        .alias("_s"))
                   .select(key_col,
                           *[F.col(f"_s.u{i}").alias(f"u{i}")
                             for i in range(1, K + 1)],
                           F.lit(r).alias("match_idx"))
                   .localCheckpoint(eager=False))
            # lazy checkpoint + count() — one job per selection round
            # (see consumed_funnel_matches)
            if sel.count() == 0:
                break
            picked.append(sel)
            frontier = sel.select(key_col,
                                  F.col(f"u{skip_idx}").alias("_T"))
        tcols = lambda src: [  # noqa: E731
            F.timestamp_add("MICROSECOND",
                            F.col(f"u{last[j - 1]}"), epoch)
            .alias(f"t{j}") for j in range(1, k + 1)]
        if not picked:
            return mu.select(key_col, *tcols(mu),
                             F.lit(1).alias("match_idx")).limit(0)
        out = picked[0]
        for p in picked[1:]:
            out = out.unionByName(p)
        return out.select(key_col, *tcols(out), "match_idx")
    finally:
        mu.unpersist()


def skip_to_funnel_matches_duck(steps: list, skip_step: int,
                                max_matches: int,
                                position: str = "first",
                                within_seconds: int | None = None,
                                key_col: str = "user_id",
                                ts_col: str = "ts",
                                type_col: str = "event_type",
                                table: str = "events") -> str:
    """DuckDB mirror of :func:`skip_to_funnel_matches` — the same
    greedy re-anchored rounds unrolled as chained MATERIALIZED CTEs
    over the all-matches core on the quantifier expansion (the
    consumed-matches oracle discipline), with the non-strict
    ``u1 >= skip instant`` re-anchor rule."""
    if max_matches < 1:
        raise ValueError(f"max_matches must be >= 1, got {max_matches}")
    flat, last, skip_idx = _skip_phys_index(steps, skip_step, position)
    K = len(flat)
    k = len(steps)
    core = _all_matches_core_duck(flat, within_seconds, key_col,
                                  ts_col, type_col, table)
    us = ", ".join(f"u{i}" for i in range(1, K + 1))
    order = ", ".join(f"u{i}" for i in range(1, K + 1))
    cte = [f"m AS MATERIALIZED ({core})",
           f"s1 AS MATERIALIZED (SELECT {key_col}, {us} FROM m "
           f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {key_col} "
           f"ORDER BY {order}) = 1)"]
    for r in range(2, max_matches + 1):
        prev = f"s{r - 1}"
        mus = ", ".join(f"m.u{i}" for i in range(1, K + 1))
        morder = ", ".join(f"m.u{i}" for i in range(1, K + 1))
        cte.append(
            f"s{r} AS MATERIALIZED (SELECT m.{key_col}, {mus} "
            f"FROM m JOIN {prev} ON m.{key_col} = {prev}.{key_col} "
            f"WHERE m.u1 >= {prev}.u{skip_idx} "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY m.{key_col} "
            f"ORDER BY {morder}) = 1)")
    tcols = ", ".join(f"make_timestamp(u{last[j - 1]}) AS t{j}"
                      for j in range(1, k + 1))
    parts = [f"SELECT {key_col}, {tcols}, {r} AS match_idx FROM s{r}"
             for r in range(1, max_matches + 1)]
    return ("WITH " + ",\n".join(cte) + "\n"
            + "\nUNION ALL\n".join(parts))


def event_transitions(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      seq_col: str = "event_id") -> DataFrame:
    """Order-1 Markov transition matrix of the per-key event stream:
    (prev_type, next_type, n_pairs, p_next) with p_next = row-normalized
    transition probability. One lag window (same single exchange shape
    as the funnel) + one |types|²-bounded aggregate; the normalizing
    window runs over that tiny frame. Ties in ts order by ``seq_col``,
    which IS semantically load-bearing here (unlike the funnel's running
    mins) — documented, deterministic, and replayed identically by the
    oracle."""
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    pairs = (events
             .select(key_col, ts_col, seq_col, type_col)
             .withColumn("_prev", F.lag(type_col).over(w))
             .filter(F.col("_prev").isNotNull())
             .groupBy(F.col("_prev").alias("prev_type"),
                      F.col(type_col).alias("next_type"))
             .agg(F.count(F.lit(1)).alias("n_pairs")))
    norm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type", "next_type", "n_pairs",
        F.round(F.col("n_pairs") / F.sum("n_pairs").over(norm),
                ROUND_DP).alias("p_next"))


def event_transitions_duck(key_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           seq_col: str = "event_id",
                           table: str = "events") -> str:
    """DuckDB mirror of event_transitions."""
    return f"""
WITH p AS (
  SELECT LAG({type_col}) OVER (PARTITION BY {key_col}
                               ORDER BY {ts_col}, {seq_col}) AS prev_type,
         {type_col} AS next_type
  FROM {table}),
c AS (SELECT prev_type, next_type, COUNT(*) AS n_pairs
      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND(n_pairs / CAST(SUM(n_pairs) OVER (PARTITION BY prev_type)
                            AS DOUBLE), {ROUND_DP}) AS p_next
FROM c
"""


def cohort_retention(events: DataFrame, signup_type: str = "signup",
                     key_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type") -> DataFrame:
    """Weekly retention cohorts: keys cohorted by the Monday week of
    their FIRST ``signup_type`` event; for each (cohort_week,
    week_offset) the count of cohort keys active that week and the
    retention ratio vs the cohort's week-0 size (week 0 always exists —
    the signup event itself is activity at offset 0).

    Shape: one |keys|-bounded aggregate for anchors, one shuffle join on
    the key (both sides key-partitioned — no broadcast assumption, keys
    are corpus-scale), one distinct-count aggregate over (cohort, week),
    and a window over the |cohorts × weeks| result. countDistinct is
    exact because the oracle demands exact values; at 100 TB the same
    plan runs with approx_count_distinct or the rollup family's HLL
    partials (operators/rollup.py) as the documented swap."""
    anchors = (events.filter(F.col(type_col) == signup_type)
               .groupBy(key_col).agg(F.min(ts_col).alias("_t0")))
    act = (events.select(key_col, ts_col)
           .join(anchors, on=key_col)
           .filter(F.col(ts_col) >= F.col("_t0"))
           .select(F.date_trunc("week", F.col("_t0")).alias("cohort_week"),
                   F.floor(F.datediff(F.to_date(ts_col), F.to_date("_t0"))
                           / 7).cast("int").alias("week_offset"),
                   F.col(key_col)))
    grp = (act.groupBy("cohort_week", "week_offset")
           .agg(F.countDistinct(key_col).alias("n_active")))
    w0 = Window.partitionBy("cohort_week")
    return grp.select(
        "cohort_week", "week_offset", "n_active",
        F.round(F.col("n_active")
                / F.max(F.when(F.col("week_offset") == 0,
                               F.col("n_active"))).over(w0),
                ROUND_DP).alias("retention"))


def cohort_retention_duck(signup_type: str = "signup",
                          key_col: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type",
                          table: str = "events") -> str:
    """DuckDB mirror of cohort_retention (Monday-start date_trunc in
    both engines; day-level date difference floored to weeks)."""
    return f"""
WITH a AS (SELECT {key_col}, MIN({ts_col}) AS _t0
           FROM {table} WHERE {type_col} = {_q(signup_type)}
           GROUP BY {key_col}),
act AS (
  SELECT date_trunc('week', a._t0) AS cohort_week,
         CAST(floor(date_diff('day', CAST(a._t0 AS DATE),
                              CAST(e.{ts_col} AS DATE)) / 7.0) AS INT)
           AS week_offset,
         e.{key_col} AS k
  FROM {table} e JOIN a ON e.{key_col} = a.{key_col}
  WHERE e.{ts_col} >= a._t0),
g AS (SELECT cohort_week, week_offset, COUNT(DISTINCT k) AS n_active
      FROM act GROUP BY 1, 2)
SELECT cohort_week, week_offset, CAST(n_active AS BIGINT) AS n_active,
       ROUND(n_active / CAST(MAX(CASE WHEN week_offset = 0 THEN n_active
                                      END) OVER (PARTITION BY cohort_week)
                             AS DOUBLE), {ROUND_DP}) AS retention
FROM g
"""


# ------------------------------------------------ revenue attribution

ATTR_DEC = "decimal(20,6)"


def last_touch_attribution(events: DataFrame, touch_types: list[str],
                           conversion_type: str,
                           key_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           seq_col: str = "event_id",
                           value_col: str = "value") -> DataFrame:
    """Last-touch revenue attribution: every conversion's value is
    credited to the key's most recent PRIOR touch event (the standard
    product-analytics attribution model; first-touch is the same plan
    with ``first`` over the frame). Conversions with no prior touch
    land in the NULL bucket (reported as unattributed rather than
    silently dropped). Output: (touch_type, n_conversions,
    attributed_value, value_share).

    Plan: the funnel family's single exchange — one (key, ts, seq)
    window carrying ``last(touch, ignorenulls)`` over the
    unbounded-preceding frame, then one |touch types|-bounded
    aggregate; the share window runs over that tiny frame. Values
    quantize to DECIMAL(20,6) before summing (order-independent
    aggregate, the decay discipline). Same-timestamp touch-then-convert
    pairs resolve by ``seq_col`` — the deterministic tie the transition
    matrix also uses."""
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    relevant = events.filter(
        F.col(type_col).isin(list(touch_types) + [conversion_type]))
    tagged = relevant.withColumn(
        "_touch",
        F.last(F.when(F.col(type_col).isin(touch_types), F.col(type_col)),
               ignorenulls=True).over(w))
    conv = (tagged.filter(F.col(type_col) == conversion_type)
            .select(F.col("_touch").alias("touch_type"),
                    F.col(value_col).cast("double").cast(ATTR_DEC)
                    .alias("_v")))
    agg = (conv.groupBy("touch_type")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
                F.sum("_v").alias("_sv")))
    w_tot = Window.partitionBy()
    return agg.select(
        "touch_type", "n_conversions",
        F.col("_sv").cast("double").alias("attributed_value"),
        F.round(F.col("_sv").cast("double")
                / F.sum("_sv").over(w_tot).cast("double"),
                6).alias("value_share"))


def last_touch_attribution_duck(touch_types: list[str],
                                conversion_type: str,
                                key_col: str = "user_id",
                                ts_col: str = "ts",
                                type_col: str = "event_type",
                                seq_col: str = "event_id",
                                value_col: str = "value",
                                table: str = "events") -> str:
    """DuckDB mirror of :func:`last_touch_attribution`."""
    touches = ", ".join(_q(t) for t in touch_types)
    return f"""
WITH rel AS (
  SELECT {key_col}, {ts_col}, {seq_col}, {type_col},
         CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)) AS v
  FROM {table}
  WHERE {type_col} IN ({touches}, {_q(conversion_type)})),
tagged AS (
  SELECT *, LAST_VALUE(CASE WHEN {type_col} IN ({touches})
                            THEN {type_col} END IGNORE NULLS)
            OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col}
                  ROWS UNBOUNDED PRECEDING) AS touch_type
  FROM rel),
agg AS (
  SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
         SUM(v) AS sv
  FROM tagged WHERE {type_col} = {_q(conversion_type)} GROUP BY 1)
SELECT touch_type, n_conversions,
       CAST(sv AS DOUBLE) AS attributed_value,
       ROUND(CAST(sv AS DOUBLE) / CAST(SUM(sv) OVER () AS DOUBLE), 6)
         AS value_share
FROM agg
"""


def linear_attribution(events: DataFrame, touch_types: list[str],
                       conversion_type: str,
                       key_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       seq_col: str = "event_id",
                       value_col: str = "value") -> DataFrame:
    """Linear multi-touch attribution — last-touch's fairness
    complement: each conversion's value splits EQUALLY across the
    DISTINCT touch TYPES the key has seen before converting (the
    type-level linear model; with T touch types the denominators are
    1..T, so per-conversion credits stay exactly representable where an
    every-event split's 1/n could land on a rounding boundary).
    Conversions with no prior touch land in the NULL bucket intact.
    Output: (touch_type, n_conversions, attributed_value, value_share)
    — ``n_conversions`` counts conversions the type received credit
    from (the NULL row counts unattributed conversions).

    Plan: the funnel family's single (key, ts, seq) exchange — one
    running MAX per touch type marks "seen so far" (|T| bounded window
    columns, like the funnel's layers); per-conversion credits quantize
    to DECIMAL(20,6) (term-level rounding, the decay discipline) and
    fold in ONE aggregate; the |T|+1-row report unpivots via stack."""
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    relevant = events.filter(
        F.col(type_col).isin(list(touch_types) + [conversion_type]))
    for i, t in enumerate(touch_types):
        relevant = relevant.withColumn(
            f"_s{i}",
            F.max(F.when(F.col(type_col) == t, 1).otherwise(0)).over(w))
    n_seen = sum(F.col(f"_s{i}") for i in range(len(touch_types)))
    conv = (relevant.filter(F.col(type_col) == conversion_type)
            .withColumn("_n", n_seen))
    v = F.col(value_col).cast("double")
    aggs = []
    for i, t in enumerate(touch_types):
        credit = F.when(
            F.col(f"_s{i}") == 1,
            F.round(v / F.col("_n"), 6).cast(ATTR_DEC))
        aggs += [F.sum(credit).alias(f"_v{i}"),
                 F.count(F.when(F.col(f"_s{i}") == 1, 1))
                 .alias(f"_c{i}")]
    un = F.when(F.col("_n") == 0, v.cast(ATTR_DEC))
    aggs += [F.sum(un).alias("_vn"),
             F.count(F.when(F.col("_n") == 0, 1)).alias("_cn")]
    one = conv.agg(*aggs)
    # keep the sums DECIMAL through the share math (exact,
    # order-independent) — the last_touch discipline
    pairs = ", ".join(
        [f"{_q(t)}, _c{i}, _v{i}" for i, t in enumerate(touch_types)]
        + ["CAST(NULL AS STRING), _cn, _vn"])
    rows = one.select(F.expr(
        f"stack({len(touch_types) + 1}, {pairs}) "
        "as (touch_type, n_conversions, _av)"))
    w_tot = Window.partitionBy()
    return (rows.filter(F.col("n_conversions") > 0)
            .select("touch_type",
                    F.col("n_conversions").cast("bigint")
                    .alias("n_conversions"),
                    F.col("_av").cast("double").alias("attributed_value"),
                    F.round((F.col("_av") / F.sum("_av").over(w_tot))
                            .cast("double"), 6).alias("value_share")))


def linear_attribution_duck(touch_types: list[str],
                            conversion_type: str,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            seq_col: str = "event_id",
                            value_col: str = "value",
                            table: str = "events") -> str:
    """DuckDB mirror of :func:`linear_attribution` — same running
    seen-flags, same per-term DECIMAL quantization, same unpivot."""
    touches = ", ".join(_q(t) for t in touch_types)
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    seen = ", ".join(
        f"MAX(CASE WHEN {type_col} = {_q(t)} THEN 1 ELSE 0 END) {over} "
        f"AS s{i}" for i, t in enumerate(touch_types))
    n = " + ".join(f"s{i}" for i in range(len(touch_types)))
    agg_cols = ", ".join(
        [f"SUM(CASE WHEN s{i} = 1 THEN CAST(ROUND(v / n, 6) "
         f"AS DECIMAL(20,6)) END) AS v{i}, "
         f"COUNT(CASE WHEN s{i} = 1 THEN 1 END) AS c{i}"
         for i in range(len(touch_types))]
        + ["SUM(CASE WHEN n = 0 THEN CAST(v AS DECIMAL(20,6)) END) AS vn",
           "COUNT(CASE WHEN n = 0 THEN 1 END) AS cn"])
    rows = " UNION ALL ".join(
        [f"SELECT {_q(t)} AS touch_type, c{i} AS n_conversions, "
         f"v{i} AS av FROM agg"
         for i, t in enumerate(touch_types)]
        + ["SELECT NULL, cn, vn FROM agg"])
    return f"""
WITH rel AS (
  SELECT {key_col}, {ts_col}, {seq_col}, {type_col},
         CAST({value_col} AS DOUBLE) AS v
  FROM {table}
  WHERE {type_col} IN ({touches}, {_q(conversion_type)})),
seen AS (SELECT *, {seen} FROM rel),
conv AS (SELECT *, {n} AS n FROM seen
         WHERE {type_col} = {_q(conversion_type)}),
agg AS (SELECT {agg_cols} FROM conv),
rows_ AS ({rows})
SELECT touch_type, CAST(n_conversions AS BIGINT) AS n_conversions,
       CAST(av AS DOUBLE) AS attributed_value,
       ROUND(CAST(av / SUM(av) OVER () AS DOUBLE), 6) AS value_share
FROM rows_ WHERE n_conversions > 0
"""



def first_touch_attribution(events: DataFrame, touch_types: list[str],
                            conversion_type: str,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            seq_col: str = "event_id",
                            value_col: str = "value") -> DataFrame:
    """First-touch revenue attribution — the acquisition-credit twin of
    :func:`last_touch_attribution` (which its docstring promised: "the
    same plan with ``first`` over the frame"): every conversion's value
    is credited to the key's EARLIEST prior touch event. Identical
    output contract, identical single-exchange plan."""
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    relevant = events.filter(
        F.col(type_col).isin(list(touch_types) + [conversion_type]))
    tagged = relevant.withColumn(
        "_touch",
        F.first(F.when(F.col(type_col).isin(touch_types),
                       F.col(type_col)),
                ignorenulls=True).over(w))
    conv = (tagged.filter(F.col(type_col) == conversion_type)
            .select(F.col("_touch").alias("touch_type"),
                    F.col(value_col).cast("double").cast(ATTR_DEC)
                    .alias("_v")))
    agg = (conv.groupBy("touch_type")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
                F.sum("_v").alias("_sv")))
    w_tot = Window.partitionBy()
    return agg.select(
        "touch_type", "n_conversions",
        F.col("_sv").cast("double").alias("attributed_value"),
        F.round(F.col("_sv").cast("double")
                / F.sum("_sv").over(w_tot).cast("double"),
                6).alias("value_share"))


def first_touch_attribution_duck(touch_types: list[str],
                                 conversion_type: str,
                                 key_col: str = "user_id",
                                 ts_col: str = "ts",
                                 type_col: str = "event_type",
                                 seq_col: str = "event_id",
                                 value_col: str = "value",
                                 table: str = "events") -> str:
    """DuckDB mirror of :func:`first_touch_attribution`."""
    touches = ", ".join(_q(t) for t in touch_types)
    return f"""
WITH rel AS (
  SELECT {key_col}, {ts_col}, {seq_col}, {type_col},
         CAST(CAST({value_col} AS DOUBLE) AS DECIMAL(20,6)) AS v
  FROM {table}
  WHERE {type_col} IN ({touches}, {_q(conversion_type)})),
tagged AS (
  SELECT *, FIRST_VALUE(CASE WHEN {type_col} IN ({touches})
                             THEN {type_col} END IGNORE NULLS)
            OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col}
                  ROWS UNBOUNDED PRECEDING) AS touch_type
  FROM rel),
agg AS (
  SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
         SUM(v) AS sv
  FROM tagged WHERE {type_col} = {_q(conversion_type)} GROUP BY 1)
SELECT touch_type, n_conversions,
       CAST(sv AS DOUBLE) AS attributed_value,
       ROUND(CAST(sv AS DOUBLE) / CAST(SUM(sv) OVER () AS DOUBLE), 6)
         AS value_share
FROM agg
"""


#: decimal places for decayed attribution weight terms (the decay
#: family's quantization — weights are O(1), so 9 dp absorbs engine
#: POWER ulp drift before the order-independent sum)
DECAY_ATTR_W_DP = 9


def time_decay_attribution(events: DataFrame, touch_types: list[str],
                           conversion_type: str,
                           half_life_seconds: float,
                           window_seconds: int,
                           key_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type",
                           seq_col: str = "event_id",
                           value_col: str = "value") -> DataFrame:
    """Time-decay multi-touch attribution — recency-weighted credit:
    each conversion splits its value across its prior touch EVENTS in
    proportion to 2^(−Δt/half_life), Δt the touch-to-conversion gap.
    The standard "recent touches matter more" model between last-touch
    (δ at Δt=0) and linear (flat). Touches older than
    ``window_seconds`` get zero credit (the attribution window every
    analytics product applies); conversions with NO in-window touch
    land in the NULL bucket intact. Output contract identical to the
    siblings: (touch_type, n_conversions, attributed_value,
    value_share).

    Unlike the window-based siblings this kernel is not expressible as
    a running aggregate (2^(−Δt/hl) does not factorize into bounded
    per-row state — the telescoped form overflows doubles across long
    histories), so the plan PAIRS conversions with their in-window
    touches: one equi-join on the key with the window riding the join
    condition as a range predicate. Per-key cost is |conversions| ×
    |in-window touches| — bounded by the window, the documented hazard
    being power keys with dense touch streams (shrink the window, or
    pre-aggregate touches to coarser buckets, before blaming the join).

    Exactness (the decay-family discipline): weights are O(1) doubles
    quantized to 9-dp DECIMAL before summing (engine POWER ulp drift
    dies in the quantization), shares are decimal-ratio doubles, and
    per-conversion credits round at 6 dp into DECIMAL for the final
    order-independent sum."""
    if half_life_seconds <= 0:
        raise ValueError(
            f"half_life_seconds must be > 0, got {half_life_seconds}")
    if window_seconds <= 0:
        raise ValueError(
            f"window_seconds must be > 0, got {window_seconds}")
    hl_us = float(half_life_seconds) * 1e6
    conv = (events.filter(F.col(type_col) == conversion_type)
            .select(F.col(key_col).alias("_k"),
                    F.col(ts_col).alias("_cts"),
                    F.col(seq_col).alias("_cseq"),
                    F.col(value_col).cast("double").alias("_v")))
    touch = (events.filter(F.col(type_col).isin(touch_types))
             .select(F.col(key_col).alias("_k"),
                     F.col(ts_col).alias("_tts"),
                     F.col(type_col).alias("_ttype")))
    d_us = F.timestamp_diff("MICROSECOND", F.col("_tts"), F.col("_cts"))
    # the window predicate rides the LEFT JOIN CONDITION (exactly like
    # the mirror's ON clause): a post-join filter would silently drop
    # conversions whose only touches are out-of-window instead of
    # null-extending them into the unattributed bucket
    pairs = conv.join(
        touch,
        on=[conv["_k"] == touch["_k"],
            touch["_tts"] < conv["_cts"],
            d_us <= F.lit(int(window_seconds) * 1_000_000)],
        how="left")
    wdec = f"decimal(20,{DECAY_ATTR_W_DP})"
    wq = F.when(
        F.col("_tts").isNotNull(),
        F.round(F.pow(F.lit(0.5), d_us.cast("double") / F.lit(hl_us)),
                DECAY_ATTR_W_DP).cast(wdec))
    per_type = (pairs
                .select(conv["_k"].alias("_k"), "_cseq", "_v", "_ttype",
                        wq.alias("_w"))
                .groupBy("_k", "_cseq", "_v", "_ttype")
                .agg(F.sum("_w").alias("_wt")))
    w_conv = Window.partitionBy("_k", "_cseq")
    credited = per_type.withColumn("_tot", F.sum("_wt").over(w_conv))
    # the share divides double÷double, NOT decimal÷decimal-then-cast:
    # both engines agree on the 9-dp decimal inputs, so IEEE division
    # of the identical doubles gives an identical quotient/product/
    # round, whereas each engine's decimal division resolves at its own
    # result scale and the 6-dp round can flip at the 1e-7 boundary
    credit = F.when(
        F.col("_tot").isNotNull(),
        F.round(F.col("_v") * (F.col("_wt").cast("double")
                               / F.col("_tot").cast("double")),
                6).cast(ATTR_DEC))
    un = F.when(F.col("_tot").isNull(), F.col("_v").cast(ATTR_DEC))
    agg = (credited
           .select(F.when(F.col("_tot").isNotNull(), F.col("_ttype"))
                   .alias("touch_type"),
                   F.coalesce(credit, un).alias("_av"))
           .groupBy("touch_type")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
                F.sum("_av").alias("_sv")))
    w_tot = Window.partitionBy()
    return agg.select(
        "touch_type", "n_conversions",
        F.col("_sv").cast("double").alias("attributed_value"),
        F.round(F.col("_sv").cast("double")
                / F.sum("_sv").over(w_tot).cast("double"),
                6).alias("value_share"))


def time_decay_attribution_duck(touch_types: list[str],
                                conversion_type: str,
                                half_life_seconds: float,
                                window_seconds: int,
                                key_col: str = "user_id",
                                ts_col: str = "ts",
                                type_col: str = "event_type",
                                seq_col: str = "event_id",
                                value_col: str = "value",
                                table: str = "events") -> str:
    """DuckDB mirror of :func:`time_decay_attribution` — same pairing,
    same 9-dp weight quantization, same per-conversion credit rounds."""
    touches = ", ".join(_q(t) for t in touch_types)
    hl_us = float(half_life_seconds) * 1e6
    dp = DECAY_ATTR_W_DP
    return f"""
WITH conv AS (
  SELECT {key_col} AS k, {ts_col} AS cts, {seq_col} AS cseq,
         CAST({value_col} AS DOUBLE) AS v
  FROM {table} WHERE {type_col} = {_q(conversion_type)}),
touch AS (
  SELECT {key_col} AS k, {ts_col} AS tts, {type_col} AS ttype
  FROM {table} WHERE {type_col} IN ({touches})),
pairs AS (
  SELECT c.k, c.cseq, c.v, t.ttype,
         CASE WHEN t.tts IS NOT NULL THEN
           CAST(ROUND(POWER(0.5,
               CAST(epoch_us(c.cts) - epoch_us(t.tts) AS DOUBLE)
               / {hl_us!r}), {dp}) AS DECIMAL(20,{dp})) END AS w
  FROM conv c
  LEFT JOIN touch t ON t.k = c.k AND t.tts < c.cts
    AND epoch_us(c.cts) - epoch_us(t.tts)
        <= {int(window_seconds) * 1_000_000}),
per_type AS (
  SELECT k, cseq, v, ttype, SUM(w) AS wt
  FROM pairs GROUP BY k, cseq, v, ttype),
credited AS (
  SELECT *, SUM(wt) OVER (PARTITION BY k, cseq) AS tot
  FROM per_type),
rows_ AS (
  SELECT CASE WHEN tot IS NOT NULL THEN ttype END AS touch_type,
         COALESCE(
           CASE WHEN tot IS NOT NULL THEN
             CAST(ROUND(v * (CAST(wt AS DOUBLE) / CAST(tot AS DOUBLE)),
                        6) AS DECIMAL(20,6)) END,
           CASE WHEN tot IS NULL THEN CAST(v AS DECIMAL(20,6)) END)
           AS av
  FROM credited),
agg AS (
  SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
         SUM(av) AS sv
  FROM rows_ GROUP BY touch_type)
SELECT touch_type, n_conversions,
       CAST(sv AS DOUBLE) AS attributed_value,
       ROUND(CAST(sv AS DOUBLE) / CAST(SUM(sv) OVER () AS DOUBLE), 6)
         AS value_share
FROM agg
"""


def ushaped_attribution(events: DataFrame, touch_types: list[str],
                        conversion_type: str,
                        key_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type",
                        seq_col: str = "event_id",
                        value_col: str = "value") -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution —
    the standard middle ground between last-touch (all credit to
    recency) and linear (no position signal): per conversion, the FIRST
    prior touch EVENT's type gets 40%, the LAST prior touch event's
    type gets 40%, and the remaining 20% splits equally across the
    middle touch events (credited to their types; repeated types
    accumulate). The small-path conventions every analytics product
    uses: one touch → 100%, two touches → 50/50, none → the NULL
    bucket intact. Same output contract as the siblings:
    (touch_type, n_conversions, attributed_value, value_share).

    Unlike :func:`linear_attribution` (which splits across distinct
    touch TYPES), position weights are inherently EVENT-level — the
    first and last are events, and middle credit is per middle event —
    so a type touched five times mid-path earns five middle shares.

    Plan: the funnel family's single (key, ts, seq) exchange — per
    touch type one running COUNT (the linear operator's seen-flags,
    counting), plus one running first-touch and last-touch type column,
    all on the same window; per-conversion per-type credits quantize to
    DECIMAL(20,6) (term-level rounding, the decay discipline) and fold
    in ONE aggregate; the |T|+1-row report unpivots via stack."""
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    relevant = events.filter(
        F.col(type_col).isin(list(touch_types) + [conversion_type]))
    is_touch = F.col(type_col).isin(touch_types)
    tagged = (relevant
              .withColumn("_first", F.first(
                  F.when(is_touch, F.col(type_col)),
                  ignorenulls=True).over(w))
              .withColumn("_last", F.last(
                  F.when(is_touch, F.col(type_col)),
                  ignorenulls=True).over(w)))
    for i, t in enumerate(touch_types):
        tagged = tagged.withColumn(
            f"_k{i}",
            F.sum(F.when(F.col(type_col) == t, 1).otherwise(0)).over(w))
    n_ev = sum(F.col(f"_k{i}") for i in range(len(touch_types)))
    conv = (tagged.filter(F.col(type_col) == conversion_type)
            .withColumn("_n", n_ev))
    v = F.col(value_col).cast("double")
    aggs = []
    for i, t in enumerate(touch_types):
        first_i = (F.col("_first") == t).cast("int")
        last_i = (F.col("_last") == t).cast("int")
        mid_i = F.col(f"_k{i}") - first_i - last_i
        share = (F.when(F.col("_n") == 1,
                        first_i.cast("double"))
                 .when(F.col("_n") == 2,
                       (first_i + last_i).cast("double") * 0.5)
                 .when(F.col("_n") >= 3,
                       (first_i + last_i).cast("double") * 0.4
                       + mid_i.cast("double") * 0.2
                       / (F.col("_n") - 2).cast("double")))
        credit = F.when(share > 0,
                        F.round(v * share, 6).cast(ATTR_DEC))
        aggs += [F.sum(credit).alias(f"_v{i}"),
                 F.count(credit).alias(f"_c{i}")]
    un = F.when(F.col("_n") == 0, v.cast(ATTR_DEC))
    aggs += [F.sum(un).alias("_vn"),
             F.count(F.when(F.col("_n") == 0, 1)).alias("_cn")]
    one = conv.agg(*aggs)
    pairs = ", ".join(
        [f"{_q(t)}, _c{i}, _v{i}" for i, t in enumerate(touch_types)]
        + ["CAST(NULL AS STRING), _cn, _vn"])
    rows = one.select(F.expr(
        f"stack({len(touch_types) + 1}, {pairs}) "
        "as (touch_type, n_conversions, _av)"))
    w_tot = Window.partitionBy()
    return (rows.filter(F.col("n_conversions") > 0)
            .select("touch_type",
                    F.col("n_conversions").cast("bigint")
                    .alias("n_conversions"),
                    F.col("_av").cast("double").alias("attributed_value"),
                    F.round((F.col("_av") / F.sum("_av").over(w_tot))
                            .cast("double"), 6).alias("value_share")))


def ushaped_attribution_duck(touch_types: list[str],
                             conversion_type: str,
                             key_col: str = "user_id", ts_col: str = "ts",
                             type_col: str = "event_type",
                             seq_col: str = "event_id",
                             value_col: str = "value",
                             table: str = "events") -> str:
    """DuckDB mirror of :func:`ushaped_attribution` — same running
    first/last/count columns, same position-weight CASE ladder, same
    per-term DECIMAL quantization."""
    touches = ", ".join(_q(t) for t in touch_types)
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    kcols = ", ".join(
        f"SUM(CASE WHEN {type_col} = {_q(t)} THEN 1 ELSE 0 END) {over} "
        f"AS k{i}" for i, t in enumerate(touch_types))
    n = " + ".join(f"k{i}" for i in range(len(touch_types)))
    agg_parts = []
    for i, t in enumerate(touch_types):
        fi = f"CASE WHEN f = {_q(t)} THEN 1 ELSE 0 END"
        la = f"CASE WHEN l = {_q(t)} THEN 1 ELSE 0 END"
        share = (f"CASE WHEN n = 1 THEN CAST({fi} AS DOUBLE) "
                 f"WHEN n = 2 THEN CAST({fi} + {la} AS DOUBLE) * 0.5 "
                 f"WHEN n >= 3 THEN CAST({fi} + {la} AS DOUBLE) * 0.4 "
                 f"+ CAST(k{i} - ({fi}) - ({la}) AS DOUBLE) * 0.2 "
                 f"/ CAST(n - 2 AS DOUBLE) END")
        agg_parts.append(
            f"SUM(CASE WHEN {share} > 0 THEN CAST(ROUND(v * ({share}), 6) "
            f"AS DECIMAL(20,6)) END) AS v{i}")
        agg_parts.append(
            f"COUNT(CASE WHEN {share} > 0 THEN 1 END) AS c{i}")
    agg_parts.append(
        "SUM(CASE WHEN n = 0 THEN CAST(v AS DECIMAL(20,6)) END) AS vn")
    agg_parts.append("COUNT(CASE WHEN n = 0 THEN 1 END) AS cn")
    agg_cols = ", ".join(agg_parts)
    rows = " UNION ALL ".join(
        [f"SELECT {_q(t)} AS touch_type, c{i} AS n_conversions, "
         f"v{i} AS av FROM agg"
         for i, t in enumerate(touch_types)]
        + ["SELECT NULL, cn, vn FROM agg"])
    return f"""
WITH rel AS (
  SELECT {key_col}, {ts_col}, {seq_col}, {type_col},
         CAST({value_col} AS DOUBLE) AS v
  FROM {table}
  WHERE {type_col} IN ({touches}, {_q(conversion_type)})),
pos AS (
  SELECT *,
         FIRST_VALUE(CASE WHEN {type_col} IN ({touches})
                          THEN {type_col} END IGNORE NULLS) {over} AS f,
         LAST_VALUE(CASE WHEN {type_col} IN ({touches})
                         THEN {type_col} END IGNORE NULLS) {over} AS l,
         {kcols}
  FROM rel),
conv AS (SELECT *, {n} AS n FROM pos
         WHERE {type_col} = {_q(conversion_type)}),
agg AS (SELECT {agg_cols} FROM conv),
rows_ AS ({rows})
SELECT touch_type, CAST(n_conversions AS BIGINT) AS n_conversions,
       CAST(av AS DOUBLE) AS attributed_value,
       ROUND(CAST(av / SUM(av) OVER () AS DOUBLE), 6) AS value_share
FROM rows_ WHERE n_conversions > 0
"""



# ------------------------------------------------- frequent event paths


def frequent_paths(events: DataFrame, path_len: int,
                   key_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type",
                   seq_col: str = "event_id",
                   top_n: int = 20, sep: str = ">") -> DataFrame:
    """Most common length-``path_len`` CONSECUTIVE event-type paths —
    "what do users actually do in three steps?", the exploratory
    complement of the funnel family (funnels test a GIVEN pattern;
    this surfaces the patterns worth testing). Every window of
    ``path_len`` consecutive events per key contributes one path
    (types joined by ``sep``); output is the global top-``top_n`` by
    (count DESC, path ASC) with the distinct-key reach alongside:
    (path, n_occurrences, n_keys, rank).

    Paths cross session boundaries by design — pre-filter to one
    session (operators/sequences.py sessionization) for within-session
    paths. Timestamp ties order by ``seq_col`` (the family's tie rule).

    Plan at 100 TB: ONE per-key ordered window materializes the
    path_len−1 leads (the ACF discipline — no self-joins), one
    (path)-grouped count+distinct aggregate, and a
    TakeOrderedAndProject top-N — no global sort of the path
    universe."""
    if path_len < 2:
        raise ValueError(f"path_len must be >= 2, got {path_len}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    # NULL-typed events drop BEFORE the lead pass: concat_ws silently
    # skips NULLs, which would otherwise count a shortened (L−1)-path
    # as a full L-path
    events = events.filter(F.col(type_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    leads = events.select(
        key_col, F.col(type_col).alias("_t0"),
        *[F.lead(type_col, d).over(w).alias(f"_t{d}")
          for d in range(1, path_len)])
    path = F.concat_ws(sep, *[F.col(f"_t{d}")
                              for d in range(path_len)])
    agg = (leads.filter(F.col(f"_t{path_len - 1}").isNotNull())
           .select(key_col, path.alias("path"))
           .groupBy("path")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
                F.countDistinct(key_col).cast("bigint").alias("n_keys")))
    top = (agg.orderBy(F.desc("n_occurrences"), F.col("path"))
           .limit(top_n))
    return top.withColumn(
        "rank", F.row_number().over(
            Window.orderBy(F.desc("n_occurrences"), F.col("path"))))


def frequent_paths_duck(path_len: int, key_col: str = "user_id",
                        ts_col: str = "ts", type_col: str = "event_type",
                        seq_col: str = "event_id", top_n: int = 20,
                        sep: str = ">", table: str = "events") -> str:
    """DuckDB mirror of :func:`frequent_paths`."""
    over = f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col})"
    leads = ", ".join(
        f"LEAD({type_col}, {d}) {over} AS t{d}"
        for d in range(1, path_len))
    parts = ", ".join(["t0"] + [f"t{d}" for d in range(1, path_len)])
    return f"""
WITH leads AS (
  SELECT {key_col}, {type_col} AS t0, {leads}
  FROM {table} WHERE {type_col} IS NOT NULL),
paths AS (
  SELECT {key_col}, concat_ws({_q(sep)}, {parts}) AS path
  FROM leads WHERE t{path_len - 1} IS NOT NULL),
agg AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT {key_col}) AS BIGINT) AS n_keys
  FROM paths GROUP BY path)
SELECT path, n_occurrences, n_keys,
       CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, path)
            AS INT) AS rank
FROM agg
ORDER BY n_occurrences DESC, path
LIMIT {top_n}
"""


# ------------------------------------------------------ sessionization

def sessionize(events: DataFrame, gap_seconds: int,
               key_col: str = "user_id", ts_col: str = "ts",
               seq_col: str = "event_id") -> DataFrame:
    """Assign explicit session ids to EVENTS: a new session starts at a
    key's first event and wherever the gap since the previous event
    exceeds ``gap_seconds`` (the strict->/<= boundary matches Spark's
    ``session_window``: a gap of exactly ``gap_seconds`` stays in the
    session). The per-ROW labeling twin of the session_window aggregate
    — joins, attribution and path analysis need the label on the event,
    not just the window bounds. Output: input columns + ``session_id``
    (1-based per key, time order).

    Gaps-and-islands on the funnel family's single (key, ts, seq)
    exchange: one lag + one running sum, zero joins."""
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    # timestampdiff(MICROSECOND), not unix_timestamp: exact integer
    # arithmetic that NTZ timestamps accept, timezone- and DST-free
    # (unix_timestamp on NTZ is timezone-applied), and sub-second-exact
    # (a SECOND-granularity diff would truncate fractional gaps)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
    new_s = F.when(F.col("_prev_ts").isNull()
                   | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return (events.withColumn("_prev_ts", prev)
            .withColumn(
                "session_id",
                F.sum(new_s).over(
                    w.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)).cast("bigint"))
            .drop("_prev_ts"))


def session_stats(events: DataFrame, gap_seconds: int,
                  key_col: str = "user_id", ts_col: str = "ts",
                  seq_col: str = "event_id") -> DataFrame:
    """Per-session summary over :func:`sessionize`: (key, session_id,
    session_start, session_end, n_events, duration_s). One aggregate
    reusing the sessionize exchange."""
    s = sessionize(events, gap_seconds, key_col, ts_col, seq_col)
    return (s.groupBy(key_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .withColumn("duration_s",
                        F.round(F.expr(
                            "timestampdiff(MICROSECOND, session_start, "
                            "session_end)") / 1e6, 6)))


def session_stats_duck(gap_seconds: int, key_col: str = "user_id",
                       ts_col: str = "ts", seq_col: str = "event_id",
                       table: str = "events") -> str:
    """DuckDB mirror of :func:`session_stats` — same boundary contract,
    same (ts, seq) order."""
    return f"""
WITH g AS (
  SELECT *, CASE WHEN epoch_us({ts_col})
                      - LAG(epoch_us({ts_col})) OVER w
                      > {gap_seconds} * 1000000
                 OR LAG({ts_col}) OVER w IS NULL THEN 1 ELSE 0 END AS ns
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col})),
s AS (
  SELECT *, SUM(ns) OVER (PARTITION BY {key_col}
                          ORDER BY {ts_col}, {seq_col}
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g)
SELECT {key_col}, CAST(session_id AS BIGINT) AS session_id,
       MIN({ts_col}) AS session_start, MAX({ts_col}) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND((epoch_us(MAX({ts_col})) - epoch_us(MIN({ts_col})))
             / 1e6, 6) AS duration_s
FROM s GROUP BY {key_col}, session_id
"""


def _until_desugar(steps: list, until: dict) -> tuple[list, dict, list]:
    """Shared desugaring for the Spark and Duck ``until`` renderings:
    expand the quantifiers, map each until'd ORIGINAL step to negations
    on its expansion's INTERNAL gaps. Returns (flat, negations, last)."""
    flat, last = expand_quantified_steps(steps)
    starts = [1] + [li + 1 for li in last[:-1]]
    negations: dict = {}
    for j, stop in until.items():
        if not (1 <= j <= len(steps)):
            raise ValueError(f"until step {j} out of range "
                             f"(1..{len(steps)})")
        s, e = starts[j - 1], last[j - 1]
        if e - s < 1:
            raise ValueError(
                f"until at step {j} needs a quantifier of 2+ "
                "repetitions — under earliest-completion semantics a "
                "single-repetition loop finishes at its first match, "
                "so a stop condition can never interleave (vacuous)")
        for g in range(s, e):
            negations[g] = stop
    return flat, negations, last


def until_funnel_times(events: DataFrame, steps: list,
                       until: dict[int, str | Column],
                       key_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       seq_col: str = "event_id",
                       within_seconds: int | None = None) -> DataFrame:
    """Quantified funnel with FlinkCEP's ``until`` stop condition:
    ``until[j]`` is an event type (or Column predicate) that must NOT
    occur while quantified step j's loop is collecting — i.e. strictly
    inside ANY gap of its repetition chain (between the 1st and the
    n-th accepted repetition). The last uncovered FlinkCEP pattern
    construct, expressed as pure COMPOSITION: the quantifier expansion
    feeds ``negated_funnel_times`` with one absence layer per internal
    loop gap — no new window machinery, same single exchange, same
    monotone-violation argument deciding each gap exactly.

    Output: one t_j per ORIGINAL step (the quantified collapse) plus
    ``c{j}`` per until'd step — the earliest stop instant that voided
    (or, if the pattern completed, trailed) step j's loop; NULL = the
    stop condition never fired inside the loop window."""
    if not until:
        raise ValueError("until must be non-empty — use "
                         "quantified_funnel_times without a stop "
                         "condition")
    flat, negations, last = _until_desugar(steps, until)
    nf = negated_funnel_times(events, flat, negations, key_col, ts_col,
                              type_col, seq_col, within_seconds)
    starts = [1] + [li + 1 for li in last[:-1]]
    cols = [F.col(f"t{li}").alias(f"t{j}")
            for j, li in enumerate(last, start=1)]
    for j in sorted(until):
        gaps = range(starts[j - 1], last[j - 1])
        cols.append(F.least(*[F.col(f"c{g}") for g in gaps])
                    .alias(f"c{j}") if len(list(gaps)) > 1
                    else F.col(f"c{starts[j - 1]}").alias(f"c{j}"))
    return nf.select(key_col, *cols)


def until_funnel_times_duck(steps: list, until: dict[int, str],
                            within_seconds: int | None = None,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            seq_col: str = "event_id",
                            table: str = "events") -> str:
    """DuckDB mirror of :func:`until_funnel_times` — the negated-funnel
    replay of the same desugaring, collapsed the same way (LEAST skips
    NULLs in both engines — verified)."""
    flat, negations, last = _until_desugar(steps, until)
    inner = negated_funnel_times_duck(flat, negations, within_seconds,
                                      key_col, ts_col, type_col,
                                      seq_col, table)
    starts = [1] + [li + 1 for li in last[:-1]]
    sel = [f"t{li} AS t{j}" for j, li in enumerate(last, start=1)]
    for j in sorted(until):
        gaps = list(range(starts[j - 1], last[j - 1]))
        expr = (f"LEAST({', '.join(f'c{g}' for g in gaps)})"
                if len(gaps) > 1 else f"c{gaps[0]}")
        sel.append(f"{expr} AS c{j}")
    return (f"SELECT {key_col}, {', '.join(sel)} "
            f"FROM ({inner}) _until_inner")


# --------------------------------------------- optional() pattern steps

#: cap on the number of optional steps per pattern: the desugaring is
#: 2^m layers by construction (each optional step doubles the variant
#: count), so the bound keeps the plan's window-column stack honest
OPTIONAL_MAX = 6


def _optional_layers(k: int, optional: list
                     ) -> list[tuple[tuple[int, ...], list[int]]]:
    """Desugar FlinkCEP ``optional()`` steps into include/exclude
    LAYERS: one funnel variant per subset of the optional set, every
    variant keeping all required steps in order. An ``optional`` entry
    is a 1-based step index, or a TUPLE of indices that toggle as one
    UNIT (an optional pattern GROUP — ``Pattern.begin(group)
    .optional()`` skips or keeps the whole subsequence, never part of
    it). Returns (inclusion_bits, included_original_indices) pairs in
    PREFERENCE order — more included steps first, then the variant
    including the earliest-indexed optional units — the deterministic
    tie-break the pick stage applies when two variants complete at the
    same instant. Shared by the operator and its mirror so both
    desugar identically.

    Parity note (reference FlinkCEP semantics, Pattern.optional() —
    flink-cep's Pattern.java): a pattern with optional elements matches
    with or without those events; under this family's single-match
    earliest-completion semantics the reported match is the variant
    completing FIRST, and including an event never loses to skipping it
    at the same completion instant."""
    import itertools

    units = [tuple(sorted(set(u))) if isinstance(u, (tuple, list))
             else (u,) for u in optional]
    units = sorted(set(units))
    if not units:
        raise ValueError("optional must be non-empty — use "
                         "funnel_times for a plain pattern")
    flat_opt = [j for u in units for j in u]
    if len(flat_opt) != len(set(flat_opt)):
        raise ValueError(
            f"optional units must not overlap, got {optional!r}")
    if min(flat_opt) < 1 or max(flat_opt) > k:
        raise ValueError(f"optional indices must be in 1..{k}, "
                         f"got {optional!r}")
    if len(units) > OPTIONAL_MAX:
        raise ValueError(
            f"at most {OPTIONAL_MAX} optional units per pattern "
            f"(2^m desugared layers), got {len(units)}")
    if len(flat_opt) == k:
        raise ValueError("at least one step must be required — an "
                         "all-optional pattern matches the empty "
                         "sequence (FlinkCEP rejects it too)")
    opt_of = {j: u for u in units for j in u}
    layers = []
    for bits in itertools.product((1, 0), repeat=len(units)):
        chosen = {j for u, b in zip(units, bits) if b for j in u}
        inc = [j for j in range(1, k + 1)
               if j not in opt_of or j in chosen]
        layers.append((bits, inc))
    # itertools.product((1, 0), ...) already yields all-included first
    # and prefers including earlier optional units among equal counts;
    # the sort makes the more-steps-first preference explicit
    layers.sort(key=lambda p: (-len(p[1]),
                               tuple(1 - b for b in p[0])))
    return layers


def optional_funnel_times(events: DataFrame, steps: list[str | Column],
                          optional: list[int],
                          key_col: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type",
                          seq_col: str = "event_id",
                          within_seconds: int | None = None
                          ) -> DataFrame:
    """``funnel_times`` with FlinkCEP ``optional()`` steps (the last
    pattern-construct straggler beside the covered strict / negation /
    quantifier / until / skip-strategy surface): ``optional`` lists the
    1-based step indices that may be SKIPPED. Per key, every
    include/exclude variant of the optional set runs as its own
    running-min layer stack over the SAME single (key, ts) exchange —
    2^m column layers, never another shuffle — and the reported match
    is the variant whose FINAL step completes earliest, ties preferring
    the variant that includes more steps (skipping an event never beats
    matching it at the same instant), then the earliest-indexed
    inclusion. Output: (key, t1..tk) — a skipped optional step reports
    NULL t while later steps still report their variant's instants; a
    key matching no variant reports all-NULL.

    ``within_seconds`` anchors each VARIANT at its own first included
    step (a skipped optional step 1 re-anchors the window at step 2 —
    the FlinkCEP reading, where the window spans the matched events).

    Scale shape: identical to the flat funnel — the layers are window
    columns over one exchange, so ``m`` optional steps cost 2^m × k
    running-min columns on one sort (bounded by ``OPTIONAL_MAX``), not
    2^m scans or joins."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    layers = _optional_layers(k, optional)
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in steps]
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    if all(isinstance(s, str) for s in steps):
        df = (events.filter(F.col(type_col).isin(list(steps)))
              .select(key_col, seq_col, ts_col, type_col))
    else:
        any_step = conds[0]
        for c in conds[1:]:
            any_step = any_step | c
        df = events.filter(any_step)
    for li, (_bits, inc) in enumerate(layers):
        for pos, j in enumerate(inc, start=1):
            cond = conds[j - 1]
            if pos > 1:
                cond = cond & (F.col(ts_col) > F.col(f"_o{li}r{pos - 1}"))
                if within_seconds is not None:
                    cond = cond & (
                        F.col(ts_col) <= F.col(f"_o{li}r1")
                        + F.expr(f"INTERVAL {within_seconds} SECOND"))
            df = df.withColumn(
                f"_o{li}r{pos}",
                F.min(F.when(cond, F.col(ts_col))).over(w))
    agg = df.groupBy(key_col).agg(*[
        F.min(f"_o{li}r{pos}").alias(f"_m{li}p{pos}")
        for li, (_b, inc) in enumerate(layers)
        for pos in range(1, len(inc) + 1)])
    finals = [F.col(f"_m{li}p{len(inc)}")
              for li, (_b, inc) in enumerate(layers)]
    best = finals[0] if len(finals) == 1 else F.least(*finals)
    pick = None
    for li, (_b, inc) in enumerate(layers):
        c = F.col(f"_m{li}p{len(inc)}").isNotNull() & \
            (F.col(f"_m{li}p{len(inc)}") == best)
        pick = (F.when(c, F.lit(li)) if pick is None
                else pick.when(c, F.lit(li)))
    out_cols = []
    for j in range(1, k + 1):
        tj = None
        for li, (_b, inc) in enumerate(layers):
            if j not in inc:
                continue
            pos = inc.index(j) + 1
            c = pick == F.lit(li)
            tj = (F.when(c, F.col(f"_m{li}p{pos}")) if tj is None
                  else tj.when(c, F.col(f"_m{li}p{pos}")))
        out_cols.append(tj.alias(f"t{j}"))
    return agg.select(key_col, *out_cols)


def optional_funnel_times_duck(steps: list[str], optional: list[int],
                               within_seconds: int | None = None,
                               key_col: str = "user_id",
                               ts_col: str = "ts",
                               type_col: str = "event_type",
                               seq_col: str = "event_id",
                               table: str = "events") -> str:
    """DuckDB mirror of :func:`optional_funnel_times` — the same layer
    desugaring as stacked running-min CTEs, the same earliest-final /
    most-inclusive pick (LEAST skips NULLs in both engines). String
    steps only (the flat mirror's Column caveat)."""
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError("optional_funnel_times_duck only mirrors "
                        f"string steps; got: {bad!r}")
    k = len(steps)
    layers = _optional_layers(k, optional)
    in_list = ", ".join(_q(s) for s in sorted(set(steps)))
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    ctes = []
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    n = 0
    for li, (_b, inc) in enumerate(layers):
        for pos, j in enumerate(inc, start=1):
            cond = f"{type_col} = {_q(steps[j - 1])}"
            if pos > 1:
                cond += f" AND {ts_col} > _o{li}r{pos - 1}"
                if within_seconds is not None:
                    cond += (f" AND {ts_col} <= _o{li}r1 + "
                             f"INTERVAL {within_seconds} SECOND")
            n += 1
            ctes.append(
                f"l{n} AS (SELECT {prev_cols}, "
                f"MIN(CASE WHEN {cond} THEN {ts_col} END) {over} "
                f"AS _o{li}r{pos} FROM {src})")
            prev_cols += f", _o{li}r{pos}"
            src = f"l{n}"
    mins = ", ".join(
        f"MIN(_o{li}r{pos}) AS _m{li}p{pos}"
        for li, (_b, inc) in enumerate(layers)
        for pos in range(1, len(inc) + 1))
    finals = [f"_m{li}p{len(inc)}" for li, (_b, inc) in enumerate(layers)]
    best = finals[0] if len(finals) == 1 else f"LEAST({', '.join(finals)})"
    pick = "CASE " + " ".join(
        f"WHEN _m{li}p{len(inc)} IS NOT NULL "
        f"AND _m{li}p{len(inc)} = _best THEN {li}"
        for li, (_b, inc) in enumerate(layers)) + " END"
    t_sel = []
    for j in range(1, k + 1):
        arms = []
        for li, (_b, inc) in enumerate(layers):
            if j in inc:
                pos = inc.index(j) + 1
                arms.append(f"WHEN _pick = {li} THEN _m{li}p{pos}")
        t_sel.append(f"CASE {' '.join(arms)} END AS t{j}")
    return f"""
WITH e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col}
           FROM {table} WHERE {type_col} IN ({in_list})),
{", ".join(ctes)},
per_key AS (SELECT {key_col}, {mins} FROM {src} GROUP BY {key_col}),
picked AS (SELECT *, {best} AS _best FROM per_key),
chosen AS (SELECT *, {pick} AS _pick FROM picked)
SELECT {key_col}, {", ".join(t_sel)} FROM chosen
"""


# ------------------------------------------------- pattern groups


class Group:
    """A FlinkCEP pattern GROUP — ``Pattern.begin(Pattern)`` — as a
    funnel entry: a subsequence of steps treated as one unit, with the
    group-level modifiers the reference's engine family composes on it
    (``times(n)`` repeats the WHOLE subsequence n times back-to-back;
    ``optional()`` skips or keeps the whole subsequence, never part of
    it). ``times`` follows the step-quantifier collapse: under
    earliest-completion semantics ``times(n)``/``timesOrMore(n)``
    complete at the same instant (the n-th repetition), so one
    expansion serves both."""

    __slots__ = ("steps", "times", "optional")

    def __init__(self, steps: list, times: int = 1,
                 optional: bool = False):
        if not steps:
            raise ValueError("a pattern group needs at least one step")
        if not isinstance(times, int) or times < 1:
            raise ValueError(f"times must be an int >= 1, got {times!r}")
        self.steps = list(steps)
        self.times = times
        self.optional = bool(optional)


def expand_group_entries(entries: list) -> tuple[list, list[int], list]:
    """Desugar a mixed entry list — plain steps, ``(step, n)``
    quantifiers, and :class:`Group` subpatterns — into the flat
    strict-after expansion the window layers run. Returns
    (flat_steps, last_flat_index_per_original_entry, optional_units)
    where each optional unit is the tuple of flat indices an optional
    group toggles as one (feeding :func:`_optional_layers`). Shared by
    the operator and its mirror."""
    flat: list = []
    last: list[int] = []
    units: list = []
    for e in entries:
        if isinstance(e, Group):
            start = len(flat) + 1
            for _ in range(e.times):
                for s in e.steps:
                    if isinstance(s, tuple):
                        step, n = s
                        if not isinstance(n, int) or n < 1:
                            raise ValueError(
                                f"quantifier must be an int >= 1, "
                                f"got {n!r}")
                        flat.extend([step] * n)
                    else:
                        flat.append(s)
            if e.optional:
                units.append(tuple(range(start, len(flat) + 1)))
        elif isinstance(e, tuple):
            step, n = e
            if not isinstance(n, int) or n < 1:
                raise ValueError(
                    f"quantifier must be an int >= 1, got {n!r}")
            flat.extend([step] * n)
        else:
            flat.append(e)
        last.append(len(flat))
    return flat, last, units


def group_funnel_times(events: DataFrame, entries: list,
                       key_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       seq_col: str = "event_id",
                       within_seconds: int | None = None) -> DataFrame:
    """``funnel_times`` over FlinkCEP pattern GROUPS
    (``Pattern.begin(Pattern)``): each :class:`Group` entry is a
    subsequence composed as one unit — ``times(n)`` unrolls it n times
    back-to-back on the same strict-after chain (the quantified-step
    collapse, so ``timesOrMore`` completes identically), and
    ``optional()`` desugars into with/without variant LAYERS toggling
    the WHOLE subsequence (via :func:`_optional_layers` units — 2 per
    optional group, not 2^|group|). Output: (key, t1..tE) — ONE column
    per original ENTRY, an entry completing at its expansion's final
    step (a skipped optional group reports NULL, later entries their
    variant's instants).

    Scale shape: identical to the quantified/optional funnels — the
    expansion adds window LAYERS over the single (key, ts) exchange
    (2^g stacks for g optional groups, bounded by ``OPTIONAL_MAX``),
    never another shuffle."""
    flat, last, units = expand_group_entries(entries)
    if not flat:
        raise ValueError("entries must be non-empty")
    if not units:
        ft = funnel_times(events, flat, key_col, ts_col, type_col,
                          seq_col, within_seconds)
        return ft.select(key_col, *[
            F.col(f"t{li}").alias(f"t{j}")
            for j, li in enumerate(last, start=1)])
    K = len(flat)
    layers = _optional_layers(K, units)
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in flat]
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    if all(isinstance(s, str) for s in flat):
        df = (events.filter(F.col(type_col).isin(list(set(flat))))
              .select(key_col, seq_col, ts_col, type_col))
    else:
        any_step = conds[0]
        for c in conds[1:]:
            any_step = any_step | c
        df = events.filter(any_step)
    for li, (_b, inc) in enumerate(layers):
        for pos, j in enumerate(inc, start=1):
            cond = conds[j - 1]
            if pos > 1:
                cond = cond & (F.col(ts_col) > F.col(f"_g{li}r{pos - 1}"))
                if within_seconds is not None:
                    cond = cond & (
                        F.col(ts_col) <= F.col(f"_g{li}r1")
                        + F.expr(f"INTERVAL {within_seconds} SECOND"))
            df = df.withColumn(
                f"_g{li}r{pos}",
                F.min(F.when(cond, F.col(ts_col))).over(w))
    agg = df.groupBy(key_col).agg(*[
        F.min(f"_g{li}r{pos}").alias(f"_m{li}p{pos}")
        for li, (_b, inc) in enumerate(layers)
        for pos in range(1, len(inc) + 1)])
    finals = [F.col(f"_m{li}p{len(inc)}")
              for li, (_b, inc) in enumerate(layers)]
    best = finals[0] if len(finals) == 1 else F.least(*finals)
    pick = None
    for li, (_b, inc) in enumerate(layers):
        c = F.col(f"_m{li}p{len(inc)}").isNotNull() & \
            (F.col(f"_m{li}p{len(inc)}") == best)
        pick = (F.when(c, F.lit(li)) if pick is None
                else pick.when(c, F.lit(li)))
    out_cols = []
    for j, li_flat in enumerate(last, start=1):
        tj = None
        for li, (_b, inc) in enumerate(layers):
            if li_flat not in inc:
                continue
            pos = inc.index(li_flat) + 1
            c = pick == F.lit(li)
            tj = (F.when(c, F.col(f"_m{li}p{pos}")) if tj is None
                  else tj.when(c, F.col(f"_m{li}p{pos}")))
        out_cols.append(tj.alias(f"t{j}"))
    return agg.select(key_col, *out_cols)


def group_funnel_times_duck(entries: list,
                            within_seconds: int | None = None,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            seq_col: str = "event_id",
                            table: str = "events") -> str:
    """DuckDB mirror of :func:`group_funnel_times` — the same group
    desugaring feeding the layered running-min CTE stack and pick.
    String steps only."""
    flat, last, units = expand_group_entries(entries)
    bad = [s for s in flat if not isinstance(s, str)]
    if bad:
        raise TypeError("group_funnel_times_duck only mirrors string "
                        f"steps; got: {bad!r}")
    if not units:
        inner = quantified_funnel_times_duck(
            [(s, 1) for s in flat], within_seconds, key_col, ts_col,
            type_col, seq_col, table)
        sel = ", ".join(f"t{li} AS t{j}"
                        for j, li in enumerate(last, start=1))
        return (f"SELECT {key_col}, {sel} FROM ({inner}) _grp_inner")
    K = len(flat)
    layers = _optional_layers(K, units)
    in_list = ", ".join(_q(s) for s in sorted(set(flat)))
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    ctes = []
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    n = 0
    for li, (_b, inc) in enumerate(layers):
        for pos, j in enumerate(inc, start=1):
            cond = f"{type_col} = {_q(flat[j - 1])}"
            if pos > 1:
                cond += f" AND {ts_col} > _g{li}r{pos - 1}"
                if within_seconds is not None:
                    cond += (f" AND {ts_col} <= _g{li}r1 + "
                             f"INTERVAL {within_seconds} SECOND")
            n += 1
            ctes.append(
                f"l{n} AS (SELECT {prev_cols}, "
                f"MIN(CASE WHEN {cond} THEN {ts_col} END) {over} "
                f"AS _g{li}r{pos} FROM {src})")
            prev_cols += f", _g{li}r{pos}"
            src = f"l{n}"
    mins = ", ".join(
        f"MIN(_g{li}r{pos}) AS _m{li}p{pos}"
        for li, (_b, inc) in enumerate(layers)
        for pos in range(1, len(inc) + 1))
    finals = [f"_m{li}p{len(inc)}" for li, (_b, inc) in enumerate(layers)]
    best = finals[0] if len(finals) == 1 else f"LEAST({', '.join(finals)})"
    pick = "CASE " + " ".join(
        f"WHEN _m{li}p{len(inc)} IS NOT NULL "
        f"AND _m{li}p{len(inc)} = _best THEN {li}"
        for li, (_b, inc) in enumerate(layers)) + " END"
    t_sel = []
    for j, li_flat in enumerate(last, start=1):
        arms = []
        for li, (_b, inc) in enumerate(layers):
            if li_flat in inc:
                pos = inc.index(li_flat) + 1
                arms.append(f"WHEN _pick = {li} THEN _m{li}p{pos}")
        t_sel.append(f"CASE {' '.join(arms)} END AS t{j}")
    return f"""
WITH e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col}
           FROM {table} WHERE {type_col} IN ({in_list})),
{", ".join(ctes)},
per_key AS (SELECT {key_col}, {mins} FROM {src} GROUP BY {key_col}),
picked AS (SELECT *, {best} AS _best FROM per_key),
chosen AS (SELECT *, {pick} AS _pick FROM picked)
SELECT {key_col}, {", ".join(t_sel)} FROM chosen
"""


# ------------------------------------------------- greedy() loops


def _greedy_validate(steps: list, greedy: int, n: int) -> None:
    """Shared argument contract for the greedy-loop pair."""
    k = len(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    if not isinstance(n, int) or n < 1:
        raise ValueError(f"n must be an int >= 1, got {n!r}")
    if not 1 <= greedy <= k:
        raise ValueError(f"greedy step index must be in 1..{k}, "
                         f"got {greedy}")
    if greedy == k:
        raise ValueError(
            "a greedy loop cannot be the pattern's LAST step — with "
            "nothing after it the absorption never closes (FlinkCEP "
            "rejects a trailing greedy() for the same reason); use "
            "timesOrMore via quantified_funnel_times instead")
    s_loop, s_next = steps[greedy - 1], steps[greedy]
    if (isinstance(s_loop, str) and isinstance(s_next, str)
            and s_loop == s_next):
        raise ValueError(
            "the greedy loop's condition must not overlap the following "
            f"step's ({s_loop!r} == {s_next!r}): greedy absorption would "
            "steal the follower's events and the completion instant "
            "becomes NFA-path-dependent; disjoint step conditions are "
            "the caller's contract (only string equality is checkable)")


def greedy_funnel_times(events: DataFrame, steps: list[str | Column],
                        greedy: int, n: int = 1,
                        key_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type",
                        seq_col: str = "event_id",
                        within_seconds: int | None = None) -> DataFrame:
    """``funnel_times`` with a GREEDY looping step — FlinkCEP's
    ``times(n).greedy()`` / ``oneOrMore().greedy()`` (Pattern.java's
    last loop modifier beside the covered quantifier / until /
    consecutive surface; the reference runs FlinkCEP 1.18, cf.
    RAG.java's pipeline frame): step ``greedy`` (1-based) repeats n or
    more times and absorbs as MANY repetitions as possible before the
    pattern advances.

    Parity mapping (the documented contract a FlinkCEP port needs):
    with the loop's condition disjoint from the following step's
    (enforced for string steps), greedy absorption cannot steal the
    follower's events, so every COMPLETION instant is identical to the
    reluctant ``quantified_funnel_times`` chain — what changes is the
    loop's ATTRIBUTION: the loop claims every qualifying event strictly
    between the prefix completion and the first suffix instant
    (FlinkCEP's getEventsForPattern for a greedy group), so

    - ``t_greedy`` reports the LAST absorbed repetition (the reluctant
      chain reports the n-th),
    - ``absorbed`` counts the whole run (>= n when the match closes).

    Output: (key, t1..tk, absorbed). While the first suffix event has
    not arrived the run is still open — t_greedy and absorbed report
    NULL (the streaming monitor's undecided state), earlier steps still
    report their instants; keys with no qualifying events report
    all-NULL like the flat funnel.

    Scale shape: the flat funnel's — k+n-1 chained running-min layers
    plus two per-key scalar windows and one conditional aggregate, all
    on ONE (key, ts) exchange; no joins, no second shuffle (the final
    groupBy reuses the window's hash partitioning)."""
    _greedy_validate(steps, greedy, n)
    k, g = len(steps), greedy
    flat = list(steps[:g - 1]) + [steps[g - 1]] * n + list(steps[g:])
    m = len(flat)
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in flat]
    loop_cond = (F.col(type_col) == steps[g - 1]
                 if isinstance(steps[g - 1], str) else steps[g - 1])
    if all(isinstance(s, str) for s in steps):
        df = (events.filter(F.col(type_col).isin(
            [s for s in steps if isinstance(s, str)]))
            .select(key_col, seq_col, ts_col, type_col))
    else:
        any_step = conds[0]
        for c in conds[1:]:
            any_step = any_step | c
        df = events.filter(any_step)
    w = (Window.partitionBy(key_col).orderBy(ts_col, seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for i in range(1, m + 1):
        cond = conds[i - 1]
        if i > 1:
            cond = cond & (F.col(ts_col) > F.col(f"_gr{i - 1}"))
            if within_seconds is not None:
                cond = cond & (
                    F.col(ts_col) <= F.col("_gr1")
                    + F.expr(f"INTERVAL {within_seconds} SECOND"))
        df = df.withColumn(f"_gr{i}",
                           F.min(F.when(cond, F.col(ts_col))).over(w))
    # per-key scalars: the chain columns are running mins, so their
    # partition-wide min IS the chain value — an unordered window on
    # the same key adds no shuffle
    w_all = Window.partitionBy(key_col)
    s1 = F.min(F.col(f"_gr{g + n}")).over(w_all)
    absorb = loop_cond & s1.isNotNull() & (F.col(ts_col) < s1)
    if g > 1:
        pe = F.min(F.col(f"_gr{g - 1}")).over(w_all)
        absorb = absorb & pe.isNotNull() & (F.col(ts_col) > pe)
    df = df.withColumn("_gabs", F.when(absorb, F.col(ts_col)))
    aggs = [F.min(f"_gr{i}").alias(f"_m{i}") for i in range(1, m + 1)]
    aggs += [F.max("_gabs").alias("_gbend"),
             F.count("_gabs").cast("bigint").alias("_gcnt")]
    agg = df.groupBy(key_col).agg(*aggs)
    out = []
    for j in range(1, k + 1):
        if j < g:
            out.append(F.col(f"_m{j}").alias(f"t{j}"))
        elif j == g:
            out.append(F.col("_gbend").alias(f"t{j}"))
        else:
            out.append(F.col(f"_m{j + n - 1}").alias(f"t{j}"))
    out.append(F.when(F.col("_gbend").isNotNull(), F.col("_gcnt"))
               .alias("absorbed"))
    return agg.select(key_col, *out)


def greedy_funnel_times_duck(steps: list[str], greedy: int, n: int = 1,
                             within_seconds: int | None = None,
                             key_col: str = "user_id", ts_col: str = "ts",
                             type_col: str = "event_type",
                             seq_col: str = "event_id",
                             table: str = "events") -> str:
    """DuckDB mirror of :func:`greedy_funnel_times` — the same flat
    expansion as stacked running-min CTEs, the same per-key scalar
    windows bounding the absorption, the same conditional aggregate.
    String steps only (the flat mirror's Column caveat)."""
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError("greedy_funnel_times_duck only mirrors string "
                        f"steps; got: {bad!r}")
    _greedy_validate(steps, greedy, n)
    k, g = len(steps), greedy
    flat = list(steps[:g - 1]) + [steps[g - 1]] * n + list(steps[g:])
    m = len(flat)
    in_list = ", ".join(_q(s) for s in sorted(set(steps)))
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {seq_col} "
            "ROWS UNBOUNDED PRECEDING)")
    ctes = []
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    for i, step in enumerate(flat, start=1):
        cond = f"{type_col} = {_q(step)}"
        if i > 1:
            cond += f" AND {ts_col} > _gr{i - 1}"
            if within_seconds is not None:
                cond += (f" AND {ts_col} <= _gr1 + "
                         f"INTERVAL {within_seconds} SECOND")
        ctes.append(
            f"l{i} AS (SELECT {prev_cols}, "
            f"MIN(CASE WHEN {cond} THEN {ts_col} END) {over} "
            f"AS _gr{i} FROM {src})")
        prev_cols += f", _gr{i}"
        src = f"l{i}"
    pw = f"OVER (PARTITION BY {key_col})"
    pe_sel = (f"MIN(_gr{g - 1}) {pw} AS _pe, " if g > 1 else "")
    absorb = (f"{type_col} = {_q(steps[g - 1])} "
              f"AND _s1 IS NOT NULL AND {ts_col} < _s1")
    if g > 1:
        absorb += f" AND _pe IS NOT NULL AND {ts_col} > _pe"
    t_sel = []
    for j in range(1, k + 1):
        if j < g:
            t_sel.append(f"MIN(_gr{j}) AS t{j}")
        elif j == g:
            t_sel.append(f"MAX(_ga) AS t{j}")
        else:
            t_sel.append(f"MIN(_gr{j + n - 1}) AS t{j}")
    return f"""
WITH e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col}
           FROM {table} WHERE {type_col} IN ({in_list})),
{", ".join(ctes)},
sc AS (SELECT *, {pe_sel}MIN(_gr{g + n}) {pw} AS _s1 FROM {src}),
ab AS (SELECT *, CASE WHEN {absorb} THEN {ts_col} END AS _ga FROM sc)
SELECT {key_col}, {", ".join(t_sel)},
       CASE WHEN MAX(_ga) IS NOT NULL
            THEN CAST(COUNT(_ga) AS BIGINT) END AS absorbed
FROM ab GROUP BY {key_col}
"""


# ------------------------------------- followedByAny (bounded top-N)

ANY_MATCHES_MAX = 50


def any_funnel_matches(events: DataFrame, steps: list[str | Column],
                       per_anchor: int = 5,
                       key_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       seq_col: str = "event_id") -> DataFrame:
    """FlinkCEP ``followedByAny`` — BOUNDED: each step after the first
    may match ANY later qualifying event (not just the earliest), so a
    key's match set is the full combination tree — exponential BY
    SEMANTICS, which is why the unbounded form stayed documented out
    of scope. This variant makes the bound explicit and deterministic:
    per step-1 anchor EVENT, the first ``per_anchor`` completed
    matches in lexicographic (t2, …, tk) timestamp order.

    Correctness of the bound: a VIABLE prefix (every chosen event can
    still be followed by a full suffix — the reverse max-chain check)
    completes at least once, and the lex-top-N full tuples extend the
    lex-top-N viable prefixes, so keeping only N viable prefixes per
    anchor at EVERY stage loses nothing — the tree never materializes
    beyond N rows per anchor per stage.

    Output: one row per emitted match — (key, t1..tk, match_rank)
    with match_rank 1-based in lex order per anchor; anchors with no
    completion emit nothing (the all_funnel_matches contract).
    ``within`` windows are NOT supported here (a deadline makes
    viability anchor-relative and the stage bound unsound) — use
    ``all_funnel_matches`` for the windowed single-match form.

    Plan at 100 TB: k−1 per-key scalar viability windows on one
    exchange; each stage then gives every viable step-j event a
    per-key ORDINAL (one ranking window), computes — via a
    union-window cumulative count — how many of them precede each
    prefix, and EQUI-joins on (key, ordinal = c + i) after exploding
    the N candidate ordinals: the join probes are exactly N per prefix
    BY CONSTRUCTION, so a hot key never pays the |anchors| × |events|
    pair block an inequality join would nested-loop inside the key
    group; every window and join shares the key partitioning."""
    k = len(steps)
    if k < 2:
        raise ValueError("steps must have at least 2 entries")
    if not 1 <= per_anchor <= ANY_MATCHES_MAX:
        raise ValueError(
            f"per_anchor must be in 1..{ANY_MATCHES_MAX}, "
            f"got {per_anchor}")
    conds = [F.col(type_col) == s if isinstance(s, str) else s
             for s in steps]
    if all(isinstance(s, str) for s in steps):
        df = (events.filter(F.col(type_col).isin(list(steps)))
              .select(key_col, seq_col, ts_col, type_col))
    else:
        any_step = conds[0]
        for c in conds[1:]:
            any_step = any_step | c
        df = events.filter(any_step)
    # reverse viability chain: v_k = max ts of step k; v_j = max ts of
    # step j strictly before v_{j+1} — per-key scalars via running-max
    # window layers mirrored from the funnel's running mins
    w_desc = (Window.partitionBy(key_col)
              .orderBy(F.desc(ts_col), F.desc(seq_col))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(key_col)
    for j in range(k, 1, -1):
        cond = conds[j - 1]
        if j < k:
            cond = cond & (F.col(ts_col) < F.col(f"_av{j + 1}"))
        df = df.withColumn(f"_av{j}",
                           F.max(F.when(cond, F.col(ts_col))).over(w_desc))
    for j in range(2, k + 1):
        df = df.withColumn(f"_av{j}",
                           F.max(F.col(f"_av{j}")).over(w_all))
    # anchors: every step-1 event with a viable step-2 after it
    cur = (df.filter(conds[0] & (F.col(ts_col) < F.col("_av2")))
           .select(F.col(key_col).alias("_k"),
                   F.col(ts_col).alias("_t1"),
                   F.col(seq_col).alias("_a")))
    js = F.array(*[F.lit(i) for i in range(1, per_anchor + 1)])
    for j in range(2, k + 1):
        viab = conds[j - 1]
        if j < k:
            viab = viab & (F.col(ts_col) < F.col(f"_av{j + 1}"))
        ev = (df.filter(viab)
              .select(F.col(key_col).alias("_k"),
                      F.col(ts_col).alias("_ets")))
        # per-key ordinal of each viable step-j event (tie order among
        # equal instants is irrelevant: the selected VALUES are the
        # instants, and the band keeps the same multiset either way)
        ev_idx = ev.withColumn(
            "_idx", F.row_number().over(
                Window.partitionBy("_k").orderBy("_ets")))
        # union-window cumulative count: each prefix learns how many
        # viable step-j events sit at or before its frontier (events
        # sort BEFORE probes at equal instants — candidates must be
        # STRICTLY later, so equal-instant events are consumed into c)
        null_cols = [F.lit(None).cast(cur.schema[c].dataType).alias(c)
                     for c in cur.columns if c != "_k"]
        pr = cur.select("*", F.col(f"_t{j - 1}").alias("_ets"),
                        F.lit(0).alias("_is_ev"))
        evu = ev.select(F.col("_k"), *null_cols, F.col("_ets"),
                        F.lit(1).alias("_is_ev")).select(*pr.columns)
        w_cum = (Window.partitionBy("_k")
                 .orderBy(F.col("_ets"), F.desc("_is_ev"))
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
        probes = (pr.unionByName(evu)
                  .withColumn("_c", F.sum("_is_ev").over(w_cum))
                  .filter(F.col("_is_ev") == 0).drop("_is_ev", "_ets"))
        # exactly N candidate ordinals per prefix -> pure equi-join
        cand = (probes.withColumn("_j", F.explode(js))
                .withColumn("_cidx", F.col("_c") + F.col("_j"))
                .drop("_c", "_j"))
        cur = (cand.join(ev_idx.withColumnRenamed("_k", "_k2"),
                         (F.col("_k") == F.col("_k2"))
                         & (F.col("_cidx") == F.col("_idx")))
               .withColumn(f"_t{j}", F.col("_ets"))
               .drop("_k2", "_cidx", "_idx", "_ets"))
        w_rank = (Window.partitionBy("_k", "_a")
                  .orderBy(*[F.col(f"_t{i}") for i in range(2, j + 1)]))
        cur = (cur.withColumn("_r", F.row_number().over(w_rank))
               .filter(F.col("_r") <= per_anchor).drop("_r"))
    w_final = (Window.partitionBy("_k", "_a")
               .orderBy(*[F.col(f"_t{i}") for i in range(2, k + 1)]))
    return (cur.withColumn("match_rank",
                           F.row_number().over(w_final))
            .select(F.col("_k").alias(key_col),
                    *[F.col(f"_t{i}").alias(f"t{i}")
                      for i in range(1, k + 1)],
                    "match_rank"))


def any_funnel_matches_duck(steps: list[str], per_anchor: int = 5,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            seq_col: str = "event_id",
                            table: str = "events") -> str:
    """DuckDB mirror of :func:`any_funnel_matches` — the same reverse
    viability chain as running-max CTEs and the same per-stage
    QUALIFY bound. String steps only."""
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError("any_funnel_matches_duck only mirrors string "
                        f"steps; got: {bad!r}")
    k = len(steps)
    if k < 2:
        raise ValueError("steps must have at least 2 entries")
    if not 1 <= per_anchor <= ANY_MATCHES_MAX:
        raise ValueError(
            f"per_anchor must be in 1..{ANY_MATCHES_MAX}, "
            f"got {per_anchor}")
    in_list = ", ".join(_q(s) for s in sorted(set(steps)))
    over = (f"OVER (PARTITION BY {key_col} ORDER BY {ts_col} DESC, "
            f"{seq_col} DESC ROWS UNBOUNDED PRECEDING)")
    ctes = [f"e AS (SELECT {key_col}, {seq_col}, {ts_col}, {type_col} "
            f"FROM {table} WHERE {type_col} IN ({in_list}))"]
    prev_cols = f"{key_col}, {seq_col}, {ts_col}, {type_col}"
    src = "e"
    for j in range(k, 1, -1):
        cond = f"{type_col} = {_q(steps[j - 1])}"
        if j < k:
            cond += f" AND {ts_col} < _av{j + 1}"
        ctes.append(
            f"rv{j} AS (SELECT {prev_cols}, "
            f"MAX(CASE WHEN {cond} THEN {ts_col} END) {over} AS _av{j} "
            f"FROM {src})")
        prev_cols += f", _av{j}"
        src = f"rv{j}"
    scal = ", ".join(
        f"MAX(_av{j}) OVER (PARTITION BY {key_col}) AS _av{j}"
        for j in range(2, k + 1))
    ctes.append(f"sc AS (SELECT {key_col}, {seq_col}, {ts_col}, "
                f"{type_col}, {scal} FROM {src})")
    # anchors
    ctes.append(
        f"s1 AS (SELECT {key_col} AS _k, {ts_col} AS _t1, "
        f"{seq_col} AS _a FROM sc "
        f"WHERE {type_col} = {_q(steps[0])} AND {ts_col} < _av2)")
    src = "s1"
    for j in range(2, k + 1):
        viab = f"{type_col} = {_q(steps[j - 1])}"
        if j < k:
            viab += f" AND {ts_col} < _av{j + 1}"
        order = ", ".join(f"_t{i}" for i in range(2, j + 1))
        ctes.append(
            f"s{j} AS (SELECT p.*, n.{ts_col} AS _t{j} "
            f"FROM {src} p JOIN "
            f"(SELECT {key_col} AS _k2, {ts_col} FROM sc WHERE {viab}) n "
            f"ON p._k = n._k2 AND n.{ts_col} > p._t{j - 1} "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY p._k, p._a "
            f"ORDER BY {order}) <= {per_anchor})")
        src = f"s{j}"
    order = ", ".join(f"_t{i}" for i in range(2, k + 1))
    t_cols = ", ".join(f"_t{i} AS t{i}" for i in range(1, k + 1))
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT _k AS {key_col}, {t_cols},
       CAST(ROW_NUMBER() OVER (PARTITION BY _k, _a ORDER BY {order})
            AS BIGINT) AS match_rank
FROM {src}
"""
