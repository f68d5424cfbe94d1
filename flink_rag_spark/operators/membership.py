"""Bloom-filter membership pre-filtering — exact large-against-small
anti/semi joins without shuffling the large side (the benchmark-
decontamination shape of a training-data pipeline; complements the
near-dup decontamination scan in plans/llm.py:contamination_neardup_overlap
with the exact-membership tier).

The at-scale problem: "remove every training document whose key appears in
the benchmark set" is an anti join of a 100 TB corpus against a few
million keys. A plain anti join either shuffles the corpus on the key or
(broadcast) hashes every corpus row against the full benchmark hash map.
The bloom shape short-circuits almost all of it:

1. build a bloom filter over the benchmark keys as ONE declarative
   aggregation: k seeded positions per key → (word, bit) rows →
   ``groupBy(word).agg(bit_or(mask))`` — a sparse bitmap bounded by
   m/64 words, collected once and broadcast (~1.2 MB per million keys at
   1% fpp; the same budget as Spark's own runtime bloom join filter);
2. probe the corpus KEY COLUMN ONLY with a vectorized Arrow batch lookup
   (a column-pruned scan; Python only does the k modular position checks
   against the broadcast bitmap) — a narrow map, no shuffle, no join.
   Suspect keys (true matches + fpp false positives) are distinct-ed and
   exact-joined against the benchmark keys, yielding the CONFIRMED
   contaminated key set — bounded by the true contamination, which is
   tiny at real contamination rates;
3. the confirmed keys broadcast into a plain JVM anti join over the full
   corpus — no Python in that pass, no shuffle of the corpus, and no
   union of two branches re-running the probe (Catalyst cannot share an
   opaque map stage across union arms, so the earlier two-branch shape
   paid the bloom probe twice). Bloom filters have no false negatives, so
   no true match can escape the suspect set — the result is EXACT.

Everything is deterministic: hash positions come from the shared seeded
polynomial family (functions/hashing.py), so build and probe agree
bit-for-bit and results are layout/run-independent.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.functions.hashing import POLY_P, minhash_params


class Bloom(NamedTuple):
    """A built bloom filter: bit count, seeded (a, b) hash params, and the
    packed bitmap (uint64 words, dense, length m_bits/64)."""
    m_bits: int
    params: list[tuple[int, int]]
    words: "np.ndarray"


def _position_exprs(key_col: str, m_bits: int,
                    params: list[tuple[int, int]]) -> list[str]:
    """SQL for the k bit positions of a BIGINT key: ((a·x̃ + b) mod P) mod m
    with x̃ = pmod(key, P) so arbitrary longs can't overflow (a, x̃ < P <
    2^31 ⇒ a·x̃ < 2^62)."""
    x = f"pmod({key_col}, {POLY_P})"
    return [f"pmod(pmod({a} * {x} + {b}, {POLY_P}), {m_bits})"
            for a, b in params]


def build_bloom(keys: DataFrame, key_col: str, fpp: float = 0.01,
                expected_items: int | None = None,
                cfg: EngineConfig = DEFAULT_CONFIG) -> Bloom:
    """Build a bloom filter over a BIGINT key column in one declarative
    aggregation. The collect is bounded by the bitmap size (m/64 words),
    never by the key count."""
    n = keys.count() if expected_items is None else expected_items
    n = max(n, 1)
    m_bits = max(64, int(math.ceil(-n * math.log(fpp)
                                   / (math.log(2) ** 2) / 64.0)) * 64)
    k = max(1, round(math.log(2) * m_bits / n))
    params = minhash_params(k, cfg.seed + 7)  # distinct from minhash family
    pos = _position_exprs(key_col, m_bits, params)
    rows = (keys.select(F.explode(F.array(
                *[F.expr(p).cast("long") for p in pos])).alias("pos"))
            .select((F.col("pos") / 64).cast("long").alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pos % 64 AS INT))").alias("mask"))
            .groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
            .collect())
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in rows:
        words[int(r["word"])] = np.uint64(np.int64(r["bits"]).view(np.uint64))
    return Bloom(m_bits, params, words)


def with_bloom_maybe(df: DataFrame, key_col: str, bloom: Bloom,
                     out_col: str = "bloom_maybe") -> DataFrame:
    """Attach a boolean: does the bloom filter POSSIBLY contain the key?
    False is definitive (no false negatives). One vectorized Arrow pass
    against the broadcast bitmap — no join, no shuffle.

    Implemented as ``mapInPandas`` (not a scalar pandas UDF column):
    downstream filters on the flag then sit ABOVE an opaque map stage,
    where projection collapse cannot inline the Python call into a
    JVM-side predicate (which Catalyst refuses to evaluate — pandas UDFs
    inside pushed-down filter conditions are unplannable)."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    bc = df.sparkSession.sparkContext.broadcast(
        (bloom.m_bits, bloom.params, bloom.words))
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, BooleanType())])

    def probe(batches):
        import numpy as np_
        m_bits, params, words = bc.value
        for b in batches:
            keys = b[key_col]
            if len(keys) == 0:
                continue
            # a NULL key matches nothing (SQL join semantics) →
            # definitively not-member, as the exact anti join would decide
            isnull = keys.isna().to_numpy()
            x = np_.mod(keys.fillna(0).to_numpy(dtype=np_.int64), POLY_P)
            ok = ~isnull
            for a, b_ in params:
                pos = np_.mod(np_.mod(a * x + b_, POLY_P), m_bits)
                w = words[pos >> 6]
                bit = (w >> pos.astype(np_.uint64) % np_.uint64(64)) \
                    & np_.uint64(1)
                ok &= bit.astype(bool)
            b[out_col] = ok
            yield b

    return df.mapInPandas(probe, schema=out_schema)


def decontaminate_exact(train: DataFrame, bench: DataFrame, key_col: str,
                        fpp: float = 0.01,
                        cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """EXACT anti join of ``train`` against ``bench`` keys, bloom-
    prefiltered. Result is identical to
    ``train.join(bench, key, "left_anti")`` — proven in
    tests/test_membership.py.

    Plan shape (module doc): one column-pruned probe pass over the key
    column distills the CONFIRMED contaminated key set (suspects ∩ bench —
    bounded by true contamination), then one pure-JVM broadcast anti join
    removes those rows from the full corpus. The bloom probe runs exactly
    once (the earlier clean/suspects union re-executed the opaque map stage
    per branch). If contamination could approach |bench| at a scale where
    the confirmed set itself won't broadcast, drop the broadcast hint and
    let AQE pick the join — the suspects-only shuffle is still bounded by
    the bloom positives."""
    from pyspark.sql.functions import broadcast

    bloom = build_bloom(bench.select(key_col), key_col, fpp=fpp, cfg=cfg)
    suspect_keys = (with_bloom_maybe(train.select(key_col), key_col,
                                     bloom, "_maybe")
                    .filter(F.col("_maybe")).select(key_col).distinct())
    confirmed_keys = suspect_keys.join(bench.select(key_col).distinct(),
                                       on=key_col, how="left_semi")
    return train.join(broadcast(confirmed_keys), on=key_col,
                      how="left_anti")
