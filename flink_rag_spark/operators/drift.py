"""Distribution-drift monitoring — Population Stability Index (PSI).

A pipeline feeding a trained model needs to know when the data moved:
PSI between a REFERENCE sample (training-time distribution) and the
CURRENT window is the standard production drift score (credit-risk
lineage; same quantity as the discrete KL symmetrization
Σ (p_cur − p_ref)·ln(p_cur/p_ref) over a fixed binning). Rule of thumb:
< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.

Spark-first shape, both passes scan-shaped:

- bin boundaries come from the REFERENCE side only (equal-frequency,
  the same interpolated ``percentile`` 1-row aggregate as
  profiling.quantile_bins — swap to ``approx_percentile`` at 100 TB via
  ``exact=False``, identical plan, t-digest mergeable partials);
- both frames get their bin via the broadcast-boundaries conditional
  sum (codegen, no join, no shuffle);
- per-bin counts are map-side-combined aggregates over ≤ n_bins groups;
  everything after (probability floors, the PSI fold) is arithmetic
  over an n_bins-row frame.

The ε floor keeps empty bins finite (standard PSI practice) and makes
the score defined even under total support shift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel

ROUND_DP = 6
PSI_EPS = 1e-6


def quantile_boundaries(df: DataFrame, value_col: str, n_bins: int,
                        exact: bool = True) -> list[float]:
    """Equal-frequency bin boundaries (n_bins−1 numbers) of ``df``'s
    ``value_col`` as driver metadata — one 1-row aggregate scan, the
    same interpolated ``percentile`` (or ``approx_percentile`` at
    scale) as profiling.quantile_bins. Raises on an empty frame: NULL
    boundaries would silently bin everything into bucket 1 and produce
    a finite-looking garbage PSI instead of an error."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fn = "percentile" if exact else "approx_percentile"
    ps = [i / n_bins for i in range(1, n_bins)]
    [brow] = df.agg(*[
        F.expr(f"{fn}({value_col}, {p!r})").alias(f"_qb{i}")
        for i, p in enumerate(ps)]).collect()
    if any(brow[f"_qb{i}"] is None for i in range(len(ps))):
        raise ValueError(
            f"reference frame has no non-NULL {value_col!r} values — "
            "cannot profile bin boundaries")
    return [float(brow[f"_qb{i}"]) for i in range(len(ps))]


def binned_counts(df: DataFrame, value_col: str,
                  boundaries: list[float], out: str = "n") -> DataFrame:
    """(bin, ``out``) counts with bin = 1 + Σ(value > boundary) —
    literal boundaries, codegen conditional sum, ties LOW. NULL values
    are EXCLUDED (they would otherwise silently land in bin 1 and
    distort every probability, while the boundaries were profiled from
    non-NULL values only — a mostly-NULL batch should be caught by a
    completeness rule, not misread as low-value drift). The ONE binning
    convention shared by psi_drift, the streaming monitor's reference
    profile, and per-batch scoring — change it here and every PSI
    surface moves together."""
    idx = F.lit(1)
    for b in boundaries:
        idx = idx + F.when(F.col(value_col) > F.lit(b), 1).otherwise(0)
    return (df.filter(F.col(value_col).isNotNull())
            .select(idx.cast("int").alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias(out)))


def psi_drift(ref: DataFrame, cur: DataFrame, value_col: str,
              n_bins: int = 10, eps: float = PSI_EPS,
              exact: bool = True) -> DataFrame:
    """Per-bin PSI decomposition between ``ref`` and ``cur`` on
    ``value_col``: (bin, n_ref, n_cur, p_ref, p_cur, psi_term,
    psi_total) — one row per occupied bin, ``psi_total`` (the headline
    score) repeated on every row so the result is self-contained.
    Boundaries are ``ref``'s equal-frequency quantiles, collected as
    driver metadata (n_bins−1 numbers — same broadcast-boundaries
    pattern as profiling.quantile_bins; raises on an empty reference);
    ties bin LOW (strict >) exactly like quantile_bins, so assignment
    is deterministic and engine-replayable."""
    bounds = quantile_boundaries(ref, value_col, n_bins, exact=exact)
    rc = binned_counts(ref, value_col, bounds, "n_ref")
    cc = binned_counts(cur, value_col, bounds, "n_cur")
    # persisted: the ≤ n_bins-row joined frame feeds BOTH the totals
    # aggregate and the per-bin terms — unpersisted, each consumer
    # re-runs both binning scans, doubling the operator's I/O
    j = (rc.join(cc, on="bin", how="full")
         .select("bin",
                 F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                 F.coalesce("n_cur", F.lit(0)).alias("n_cur"))
         .persist())
    tot = j.agg(F.sum("n_ref").cast("double").alias("t_ref"),
                F.sum("n_cur").cast("double").alias("t_cur"))
    p_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    p_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    terms = (j.crossJoin(F.broadcast(tot))
             .select("bin", "n_ref", "n_cur",
                     F.round(p_ref, ROUND_DP).alias("p_ref"),
                     F.round(p_cur, ROUND_DP).alias("p_cur"),
                     F.round((p_cur - p_ref) * F.log(p_cur / p_ref),
                             ROUND_DP).alias("psi_term")))
    from flink_rag_spark.operators.util import track_cached_deps
    return track_cached_deps(
        terms.withColumn(
            "psi_total",
            F.round(F.sum("psi_term").over(
                Window.partitionBy(F.lit(1))), ROUND_DP)),
        [j])


def psi_drift_duck(ref_sql: str, cur_sql: str, value_col: str,
                   n_bins: int = 10, eps: float = PSI_EPS) -> str:
    """DuckDB mirror of the exact path: quantile_cont boundaries from
    the reference CTE, same strict-> binning, same ε floor, rounding,
    and windowed total. ``ref_sql``/``cur_sql`` are SELECTs producing
    ``value_col``."""
    ps = [i / n_bins for i in range(1, n_bins)]
    bs = ", ".join(f"quantile_cont({value_col}, {p!r}) AS _qb{i}"
                   for i, p in enumerate(ps))
    terms = " + ".join(
        f"(CASE WHEN {value_col} > _qb{i} THEN 1 ELSE 0 END)"
        for i in range(len(ps)))
    pr = f"greatest(n_ref / t.t_ref, {eps!r})"
    pc = f"greatest(n_cur / t.t_cur, {eps!r})"
    return f"""
WITH refv AS ({ref_sql}), curv AS ({cur_sql}),
b AS (SELECT {bs} FROM refv),
rc AS (SELECT CAST(1 + {terms} AS INT) AS bin, COUNT(*) AS n_ref
       FROM refv, b WHERE {value_col} IS NOT NULL GROUP BY 1),
cc AS (SELECT CAST(1 + {terms} AS INT) AS bin, COUNT(*) AS n_cur
       FROM curv, b WHERE {value_col} IS NOT NULL GROUP BY 1),
j AS (SELECT COALESCE(rc.bin, cc.bin) AS bin,
             CAST(COALESCE(n_ref, 0) AS BIGINT) AS n_ref,
             CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
      FROM rc FULL OUTER JOIN cc ON rc.bin = cc.bin),
t AS (SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref,
             CAST(SUM(n_cur) AS DOUBLE) AS t_cur FROM j),
terms AS (
  SELECT bin, n_ref, n_cur,
         ROUND({pr}, {ROUND_DP}) AS p_ref,
         ROUND({pc}, {ROUND_DP}) AS p_cur,
         ROUND(({pc} - {pr}) * ln({pc} / {pr}), {ROUND_DP}) AS psi_term
  FROM j, t)
SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term,
       ROUND(SUM(psi_term) OVER (), {ROUND_DP}) AS psi_total
FROM terms
"""


# ------------------------------------ embedding-space (semantic) drift

EMB_DRIFT_TERM_DP = 9
EMB_DRIFT_DP = 6
EMB_DRIFT_DEC = "decimal(20,6)"


def embedding_drift(ref: DataFrame, cur: DataFrame,
                    vec_col: str = "embedding") -> DataFrame:
    """Semantic drift between two embedded corpus slices — "did the
    MEANING of the corpus move?", the vector-space complement of PSI's
    scalar binning and the KS test's scalar ECDF (a corpus can drift
    semantically while every scalar feature's distribution holds):

    * ``centroid_cosine`` — cosine between the two slices' mean
      vectors (1 = same direction; the headline drift number),
    * ``centroid_l2`` — the Euclidean distance between the centroids,
    * ``mean_norm_ref`` / ``mean_norm_cur`` — the centroid magnitudes
      (a shrinking centroid with stable norms = rising dispersion).

    Output ONE row: (n_ref, n_cur, centroid_cosine, centroid_l2,
    mean_norm_ref, mean_norm_cur).

    Exactness: vector components quantize to DECIMAL(20,6) (the
    corr_matrix discipline) and the per-dimension sums are exact
    decimals inside ONE posexplode + aggregate per side, so the
    centroids are bit-stable under any partitioning; the |dims|-row
    dot/norm terms quantize to 9-dp DECIMAL before their bounded sums,
    and the final quotients round at 6 dp. NULL and empty vectors are
    excluded; mixed dimensionalities raise (a dims mismatch between
    slices means the comparison is meaningless).

    Plan at 100 TB: one narrow posexplode + partial+final aggregate
    per slice (the only full-data work — |dims|·n rows but each row is
    (int, decimal)), then everything runs on a ≤|dims|-row frame."""
    def _dim_sums(df: DataFrame, side: str) -> DataFrame:
        v = F.col(vec_col)
        ex = (df.filter(v.isNotNull() & (F.size(v) > 0))
              .select(F.posexplode(v).alias("dim", "_x")))
        return (ex.groupBy("dim")
                .agg(F.sum(F.col("_x").cast("double")
                           .cast(EMB_DRIFT_DEC)).alias(f"_s_{side}"),
                     F.count(F.lit(1)).alias(f"_n_{side}")))
    a = _dim_sums(ref, "a")
    b = _dim_sums(cur, "b")
    # persist the ≤|dims|-row joined frame BEFORE the eager
    # dimensionality check: without it the check would execute both
    # full-data posexplode aggregates and the returned DataFrame would
    # re-run them — doubling the documented one-pass-per-slice plan
    j = (a.join(b, "dim", "full")
         .persist(StorageLevel.MEMORY_AND_DISK))
    # a dim present on one side only = mixed dimensionality
    bad = j.filter(F.col("_s_a").isNull() | F.col("_s_b").isNull())
    if bad.limit(1).count() > 0:
        j.unpersist()
        raise ValueError(
            "embedding_drift: slices have different dimensionalities")
    na = F.col("_n_a").cast("double")
    nb = F.col("_n_b").cast("double")
    ma = F.col("_s_a").cast("double") / na
    mb = F.col("_s_b").cast("double") / nb
    dec9 = f"decimal(30,{EMB_DRIFT_TERM_DP})"
    terms = j.select(
        F.col("_n_a").alias("_na"), F.col("_n_b").alias("_nb"),
        F.round(ma * mb, EMB_DRIFT_TERM_DP).cast(dec9).alias("_ab"),
        F.round(ma * ma, EMB_DRIFT_TERM_DP).cast(dec9).alias("_aa"),
        F.round(mb * mb, EMB_DRIFT_TERM_DP).cast(dec9).alias("_bb"),
        F.round((ma - mb) * (ma - mb), EMB_DRIFT_TERM_DP).cast(dec9)
        .alias("_d2"))
    agg = terms.agg(
        F.max("_na").cast("bigint").alias("n_ref"),
        F.max("_nb").cast("bigint").alias("n_cur"),
        F.sum("_ab").alias("_sab"), F.sum("_aa").alias("_saa"),
        F.sum("_bb").alias("_sbb"), F.sum("_d2").alias("_sd2"))
    saa = F.col("_saa").cast("double")
    sbb = F.col("_sbb").cast("double")
    cos = F.when((saa > 0) & (sbb > 0),
                 F.col("_sab").cast("double") / F.sqrt(saa * sbb))
    return agg.select(
        "n_ref", "n_cur",
        F.round(cos, EMB_DRIFT_DP).alias("centroid_cosine"),
        F.round(F.sqrt(F.col("_sd2").cast("double")), EMB_DRIFT_DP)
        .alias("centroid_l2"),
        F.round(F.sqrt(saa), EMB_DRIFT_DP).alias("mean_norm_ref"),
        F.round(F.sqrt(sbb), EMB_DRIFT_DP).alias("mean_norm_cur"))


def embedding_drift_duck(ref_sql: str, cur_sql: str,
                         vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`embedding_drift` — same DECIMAL(20,6)
    component quantization, same 9-dp centroid-term quantization."""
    dp, odp = EMB_DRIFT_TERM_DP, EMB_DRIFT_DP

    def dim_sums(sql, side):
        # the catalog's positional-unnest idiom (WITH ORDINALITY is
        # unimplemented in this DuckDB): a lateral index range +
        # 1-based list subscript
        return f"""
  SELECT i.dim,
         SUM(CAST(CAST(t.{vec_col}[i.dim] AS DOUBLE)
                  AS DECIMAL(20,6))) AS s_{side},
         COUNT(*) AS n_{side}
  FROM ({sql}) t,
       LATERAL (SELECT UNNEST(range(1, len(t.{vec_col}) + 1))
                AS dim) i
  WHERE t.{vec_col} IS NOT NULL AND len(t.{vec_col}) > 0
  GROUP BY i.dim"""
    return f"""
WITH da AS ({dim_sums(ref_sql, "a")}),
db AS ({dim_sums(cur_sql, "b")}),
j AS (SELECT COALESCE(da.dim, db.dim) AS dim, s_a, n_a, s_b, n_b
      FROM da FULL JOIN db ON da.dim = db.dim),
terms AS (
  -- a one-sided dim = mixed dimensionality; surface it as an error
  -- exactly like the Spark contract instead of silently dropping
  -- dims. The guard lives INSIDE ab (which feeds the output's sab)
  -- so the optimizer cannot prune it away unevaluated.
  SELECT n_a, n_b,
         CASE WHEN s_a IS NULL OR s_b IS NULL
              THEN error('embedding_drift: slices have different '
                         || 'dimensionalities')
         ELSE
         CAST(ROUND((CAST(s_a AS DOUBLE) / n_a)
                    * (CAST(s_b AS DOUBLE) / n_b), {dp})
              AS DECIMAL(30,{dp})) END AS ab,
         CAST(ROUND((CAST(s_a AS DOUBLE) / n_a)
                    * (CAST(s_a AS DOUBLE) / n_a), {dp})
              AS DECIMAL(30,{dp})) AS aa,
         CAST(ROUND((CAST(s_b AS DOUBLE) / n_b)
                    * (CAST(s_b AS DOUBLE) / n_b), {dp})
              AS DECIMAL(30,{dp})) AS bb,
         CAST(ROUND((CAST(s_a AS DOUBLE) / n_a
                     - CAST(s_b AS DOUBLE) / n_b)
                    * (CAST(s_a AS DOUBLE) / n_a
                       - CAST(s_b AS DOUBLE) / n_b), {dp})
              AS DECIMAL(30,{dp})) AS d2
  FROM j),
agg AS (
  SELECT CAST(MAX(n_a) AS BIGINT) AS n_ref,
         CAST(MAX(n_b) AS BIGINT) AS n_cur,
         SUM(ab) AS sab, SUM(aa) AS saa, SUM(bb) AS sbb,
         SUM(d2) AS sd2
  FROM terms)
SELECT n_ref, n_cur,
       ROUND(CASE WHEN CAST(saa AS DOUBLE) > 0
                   AND CAST(sbb AS DOUBLE) > 0
             THEN CAST(sab AS DOUBLE)
                  / SQRT(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))
             END, {odp}) AS centroid_cosine,
       ROUND(SQRT(CAST(sd2 AS DOUBLE)), {odp}) AS centroid_l2,
       ROUND(SQRT(CAST(saa AS DOUBLE)), {odp}) AS mean_norm_ref,
       ROUND(SQRT(CAST(sbb AS DOUBLE)), {odp}) AS mean_norm_cur
FROM agg
"""


# ---------------------- distribution distances: JSD / Hellinger / TV

DIST_TERM_DP = 9


def distribution_distance(ref: DataFrame, cur: DataFrame,
                          value_col: str, n_bins: int = 10,
                          exact: bool = True) -> DataFrame:
    """Bounded two-sample distribution distances over the PSI bin
    frame — the three a drift consumer wants when PSI's unbounded
    log-ratio (and its ε floor) is the wrong shape:

        JSD = ½·KL(P‖M) + ½·KL(Q‖M),  M = (P+Q)/2   (∈ [0, ln 2])
        Hellinger = √(1 − Σ√(p·q))                   (∈ [0, 1])
        TV  = ½·Σ|p − q|                             (∈ [0, 1])

    all ZERO-SAFE (an empty bin contributes its x·ln x → 0 limit —
    no ε floor, unlike PSI). Boundaries are ``ref``'s equal-frequency
    quantiles (the psi_drift pattern, broadcast driver metadata).
    Output ONE row: (n_ref, n_cur, n_bins_occupied, jsd, hellinger,
    tv); an empty side yields NULL distances.

    Exactness: bin counts are exact integers; each per-bin term
    quantizes to ``DIST_TERM_DP``-dp DECIMAL before the bin-bounded
    sum (order-independent), the G-test discipline.

    Plan at 100 TB: two binned one-scan aggregates (≤ n_bins rows
    each), one tiny full join, a 1-row fold."""
    from flink_rag_spark.operators.util import dec_to_double

    bounds = quantile_boundaries(ref, value_col, n_bins, exact=exact)
    rc = binned_counts(ref, value_col, bounds, "n_ref")
    cc = binned_counts(cur, value_col, bounds, "n_cur")
    j = (rc.join(cc, on="bin", how="full")
         .select("bin",
                 F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                 F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    tot = j.agg(F.sum("n_ref").cast("double").alias("t_ref"),
                F.sum("n_cur").cast("double").alias("t_cur"))
    g = j.crossJoin(F.broadcast(tot))
    p = F.col("n_ref") / F.col("t_ref")
    q = F.col("n_cur") / F.col("t_cur")
    tdec = f"decimal(24,{DIST_TERM_DP})"

    def t9(c):
        return F.round(c, DIST_TERM_DP).cast(tdec)

    jsd_term = (F.when(F.col("n_ref") > 0,
                       p * F.log(F.lit(2.0) * p / (p + q)))
                .otherwise(F.lit(0.0)) * F.lit(0.5)
                + F.when(F.col("n_cur") > 0,
                         q * F.log(F.lit(2.0) * q / (p + q)))
                .otherwise(F.lit(0.0)) * F.lit(0.5))
    agg = g.agg(
        F.max("t_ref").alias("_tr"), F.max("t_cur").alias("_tc"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins_occupied"),
        F.sum(t9(jsd_term)).alias("_jsd"),
        F.sum(t9(F.sqrt(p * q))).alias("_bc"),
        F.sum(t9(F.abs(p - q))).alias("_tv"))
    ok = (F.col("_tr") > 0) & (F.col("_tc") > 0)
    return agg.select(
        F.col("_tr").cast("bigint").alias("n_ref"),
        F.col("_tc").cast("bigint").alias("n_cur"),
        "n_bins_occupied",
        F.round(F.when(ok, dec_to_double(F.col("_jsd"))), ROUND_DP)
        .alias("jsd"),
        F.round(F.when(ok, F.sqrt(F.greatest(
            F.lit(1.0) - dec_to_double(F.col("_bc")), F.lit(0.0)))),
            ROUND_DP).alias("hellinger"),
        F.round(F.when(ok, dec_to_double(F.col("_tv")) / F.lit(2.0)),
                ROUND_DP).alias("tv"))


def distribution_distance_duck(ref_sql: str, cur_sql: str,
                               value_col: str,
                               n_bins: int = 10) -> str:
    """DuckDB mirror of :func:`distribution_distance` — quantile_cont
    boundaries, same strict-> binning, same quantized terms."""
    from flink_rag_spark.operators.util import dec_to_double_duck

    ps = [i / n_bins for i in range(1, n_bins)]
    bs = ", ".join(f"quantile_cont({value_col}, {p!r}) AS _qb{i}"
                   for i, p in enumerate(ps))
    terms = " + ".join(
        f"(CASE WHEN {value_col} > _qb{i} THEN 1 ELSE 0 END)"
        for i in range(len(ps)))
    dp = DIST_TERM_DP
    pp = "(n_ref / t_ref)"
    qq = "(n_cur / t_cur)"
    jsd = (f"0.5 * (CASE WHEN n_ref > 0 THEN {pp} * LN(2.0 * {pp} "
           f"/ ({pp} + {qq})) ELSE 0.0 END) "
           f"+ 0.5 * (CASE WHEN n_cur > 0 THEN {qq} * LN(2.0 * {qq} "
           f"/ ({pp} + {qq})) ELSE 0.0 END)")
    return f"""
WITH dd_ref AS ({ref_sql}), dd_cur AS ({cur_sql}),
dd_b AS (SELECT {bs} FROM dd_ref),
dd_rc AS (SELECT CAST(1 + {terms} AS INT) AS bin, COUNT(*) AS n_ref
          FROM dd_ref, dd_b WHERE {value_col} IS NOT NULL GROUP BY 1),
dd_cc AS (SELECT CAST(1 + {terms} AS INT) AS bin, COUNT(*) AS n_cur
          FROM dd_cur, dd_b WHERE {value_col} IS NOT NULL GROUP BY 1),
dd_j AS (SELECT COALESCE(dd_rc.bin, dd_cc.bin) AS bin,
                COALESCE(n_ref, 0) AS n_ref,
                COALESCE(n_cur, 0) AS n_cur
         FROM dd_rc FULL JOIN dd_cc ON dd_rc.bin = dd_cc.bin),
dd_t AS (SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref,
                CAST(SUM(n_cur) AS DOUBLE) AS t_cur
         FROM dd_j),
dd_g AS (SELECT * FROM dd_j CROSS JOIN dd_t),
dd_agg AS (
  SELECT MAX(t_ref) AS tr, MAX(t_cur) AS tc,
         CAST(COUNT(*) AS BIGINT) AS n_bins_occupied,
         SUM(CAST(ROUND({jsd}, {dp}) AS DECIMAL(24,{dp}))) AS jsd_s,
         SUM(CAST(ROUND(SQRT({pp} * {qq}), {dp})
                  AS DECIMAL(24,{dp}))) AS bc_s,
         SUM(CAST(ROUND(ABS({pp} - {qq}), {dp})
                  AS DECIMAL(24,{dp}))) AS tv_s
  FROM dd_g)
SELECT CAST(tr AS BIGINT) AS n_ref, CAST(tc AS BIGINT) AS n_cur,
       n_bins_occupied,
       ROUND(CASE WHEN tr > 0 AND tc > 0
             THEN {dec_to_double_duck('jsd_s')} END, {ROUND_DP}) AS jsd,
       ROUND(CASE WHEN tr > 0 AND tc > 0
             THEN SQRT(GREATEST(1.0 - {dec_to_double_duck('bc_s')},
                                0.0)) END, {ROUND_DP}) AS hellinger,
       ROUND(CASE WHEN tr > 0 AND tc > 0
             THEN {dec_to_double_duck('tv_s')} / 2.0 END, {ROUND_DP})
         AS tv
FROM dd_agg
"""
