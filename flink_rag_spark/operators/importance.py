"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw-corpus document by how much more
likely its hashed n-gram bag is under a TARGET domain's distribution
than under the raw corpus's own, then keep the top-weighted documents.
The pretraining-data recipe behind "select web text that looks like
Wikipedia/books": a 100 TB crawl is reduced to the slice that matches
the domain a model should learn, using only two bag-of-hashed-ngrams
language models.

Math (paper §3): features are unigram + bigram hashes bucketed into B
bins; both distributions are add-α smoothed multinomials
p(b) = (count_b + α) / (N + α·B); a document's log importance weight is
log w(z) = Σ_b c_b(z) · (ln p_target(b) − ln p_raw(b)). The paper then
Gumbel-resamples; this operator exposes the deterministic top-n variant
(weight DESC, id ASC) so the result is engine-replayable and
oracle-checkable — the sampling twist is one seeded-noise column away
and documented rather than hidden.

Spark-first shape, every pass scan-shaped:

- feature extraction reuses the dedup family's polynomial token hashes
  and 2-token rolling shingle hashes (functions/hashing.py), so the
  DuckDB oracle replays features bit-identically;
- the importance estimator is ONE aggregate per corpus: explode
  features → groupBy(bucket) count — B-bounded results. The two
  B-row count frames join into one persisted frame (two consumers:
  totals + ratios) whose λ(b) = ln p_t(b) − ln p_r(b) projection is
  BROADCAST (2·B numbers — the "trained estimator" is
  driver-metadata-sized, like the drift monitor's reference profile);
- scoring is a second corpus scan: explode → map-side broadcast join
  against λ → per-doc sum. No shuffle ever carries text; the exchanges
  carry (bucket, count) and (id, partial-sum) rows;
- top-n is TakeOrderedAndProject with a row_number over only the n
  survivors.

Total: two passes over the raw corpus (fit, score) + one over the small
target — the same I/O the paper's pipeline pays.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

ROUND_DP = 6
DSIR_ALPHA = 1.0


def _features_expr(text_col: str, n_buckets: int) -> str:
    """array<bigint> of hashed-n-gram feature buckets: unigram token
    hashes ++ 2-token rolling shingle hashes, each mod ``n_buckets``.
    Both hash families are the dedup family's (hash parity with the
    DuckDB oracle); the token-hash array binds once per branch."""
    from flink_rag_spark.operators.dedup import (
        shingle_hashes_expr,
        token_hashes_expr,
    )
    uni = token_hashes_expr(text_col)
    big = shingle_hashes_expr(text_col, 2)
    return (f"transform(concat({uni}, {big}), "
            f"h -> h % {n_buckets})")


def _features_duck(text_col: str, n_buckets: int) -> str:
    """DuckDB mirror of _features_expr."""
    from flink_rag_spark.functions.hashing import (
        shingle_hashes_duck,
        token_hashes_duck,
    )
    uni = token_hashes_duck(text_col)
    big = shingle_hashes_duck(text_col, 2)
    return (f"list_transform(list_concat({uni}, {big}), "
            f"h -> h % {n_buckets})")


def bucket_joint_counts(raw: DataFrame, target: DataFrame, text_col: str,
                        n_buckets: int) -> DataFrame:
    """(b, c_raw, c_tgt) joined B-row bucket counts — the estimator's
    sufficient statistics, shared by the batch operator and the
    streaming sidecar fitter (streaming/importance_gate.py) so the two
    can never drift. A full outer join keeps buckets seen on one side
    only (their counts smooth to α downstream)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    feats = F.expr(_features_expr(text_col, n_buckets))

    def bucket_counts(df: DataFrame, out: str) -> DataFrame:
        return (df.select(F.explode(feats).alias("b"))
                .groupBy("b").agg(F.count(F.lit(1)).alias(out)))

    return (bucket_counts(raw, "c_raw")
            .join(bucket_counts(target, "c_tgt"), on="b", how="full")
            .select("b",
                    F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
                    F.coalesce("c_tgt", F.lit(0)).alias("c_tgt")))


def dsir_log_weights(raw: DataFrame, target: DataFrame, text_col: str,
                     id_col: str, n_buckets: int = 512,
                     alpha: float = DSIR_ALPHA) -> DataFrame:
    """Per-document DSIR log importance weights of ``raw`` documents
    toward ``target``'s hashed-n-gram distribution: (id, n_feats,
    log_weight). The B-row bucket-count frame is persisted (two
    consumers: the totals aggregate and the λ projection — unpersisted,
    each would re-run both corpus-stats scans) and the derived λ table
    broadcast; raw is scanned once for the estimator and once for
    scoring."""
    feats = F.expr(_features_expr(text_col, n_buckets))
    j = bucket_joint_counts(raw, target, text_col, n_buckets).persist()
    tot = j.agg(F.sum("c_raw").cast("double").alias("n_raw"),
                F.sum("c_tgt").cast("double").alias("n_tgt"))
    lam = (j.crossJoin(F.broadcast(tot))
           .select("b", (
               F.log((F.col("c_tgt") + alpha)
                     / (F.col("n_tgt") + alpha * n_buckets))
               - F.log((F.col("c_raw") + alpha)
                       / (F.col("n_raw") + alpha * n_buckets))
           ).alias("lam")))
    scored = (raw.select(F.col(id_col), F.explode(feats).alias("b"))
              .join(F.broadcast(lam), on="b")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_feats"),
                   F.round(F.sum("lam"), ROUND_DP).alias("log_weight")))
    return scored


def dsir_select(raw: DataFrame, target: DataFrame, text_col: str,
                id_col: str, top_n: int, n_buckets: int = 512,
                alpha: float = DSIR_ALPHA,
                keep_cols: list[str] | None = None) -> DataFrame:
    """Deterministic top-``top_n`` DSIR selection: the ``top_n`` raw
    documents most target-like by log importance weight, tie-broken on
    id. Returns (id, keep_cols..., n_feats, log_weight, rank). The
    keep_cols join runs AFTER the top-n cut, so raw's extra scan joins
    against a broadcast of top_n rows instead of shuffling the corpus a
    second time."""
    lw = dsir_log_weights(raw, target, text_col, id_col,
                          n_buckets=n_buckets, alpha=alpha)
    w = Window.orderBy(F.desc("log_weight"), F.asc(id_col))
    top = (lw.orderBy(F.desc("log_weight"), F.asc(id_col)).limit(top_n)
           .withColumn("rank", F.row_number().over(w)))
    cols = [F.col(id_col)] + [F.col(c) for c in (keep_cols or [])]
    return raw.select(*cols).join(F.broadcast(top), on=id_col)


def dsir_select_duck(raw_pred: str, target_pred: str, top_n: int,
                     n_buckets: int = 512, alpha: float = DSIR_ALPHA,
                     keep_cols: str = "", id_col: str = "doc_id",
                     text_col: str = "text",
                     table: str = "documents") -> str:
    """DuckDB mirror of dsir_select with the two corpora defined by SQL
    predicates over one table: same features, smoothing, log-ratio,
    rounding, and (weight DESC, id) tie-break."""
    feats = _features_duck(text_col, n_buckets)
    keep = f", {keep_cols}" if keep_cols else ""
    return f"""
WITH rawd AS (SELECT {id_col}, {text_col} FROM {table} WHERE {raw_pred}),
tgtd AS (SELECT {id_col}, {text_col} FROM {table} WHERE {target_pred}),
rf AS (SELECT unnest({feats}) AS b FROM rawd),
tf AS (SELECT unnest({feats}) AS b FROM tgtd),
rc AS (SELECT b, COUNT(*) AS c_raw FROM rf GROUP BY b),
tc AS (SELECT b, COUNT(*) AS c_tgt FROM tf GROUP BY b),
j AS (SELECT COALESCE(rc.b, tc.b) AS b,
             COALESCE(c_raw, 0) AS c_raw, COALESCE(c_tgt, 0) AS c_tgt
      FROM rc FULL OUTER JOIN tc ON rc.b = tc.b),
t AS (SELECT CAST(SUM(c_raw) AS DOUBLE) AS n_raw,
             CAST(SUM(c_tgt) AS DOUBLE) AS n_tgt FROM j),
lam AS (SELECT b, ln((c_tgt + {alpha!r}) / (t.n_tgt + {alpha!r} * {n_buckets}))
               - ln((c_raw + {alpha!r}) / (t.n_raw + {alpha!r} * {n_buckets}))
               AS lam
        FROM j, t),
df AS (SELECT {id_col}, unnest({feats}) AS b FROM rawd),
sc AS (SELECT df.{id_col}, COUNT(*) AS n_feats,
              ROUND(SUM(lam), {ROUND_DP}) AS log_weight
       FROM df JOIN lam ON df.b = lam.b GROUP BY df.{id_col}),
sel AS (SELECT d.{id_col}{keep}, sc.n_feats, sc.log_weight,
               CAST(ROW_NUMBER() OVER (ORDER BY sc.log_weight DESC,
                                       d.{id_col}) AS INT) AS rank
        FROM {table} d JOIN sc ON d.{id_col} = sc.{id_col}
        WHERE {raw_pred})
SELECT * FROM sel WHERE rank <= {top_n}
"""
