"""Deterministic hashing shared by the engine and its DuckDB oracle.

Spark's built-in hash functions (murmur3 ``hash()``, ``xxhash64``) have no
DuckDB counterpart, so every hash that participates in an oracle-checked
result is a polynomial rolling hash over unicode code points — expressible
as a sequential left-fold in BOTH engines (Spark ``aggregate`` HOF, DuckDB
``list_reduce``) with bit-identical integer results.

h(s) = fold(c in s) (acc * BASE + codepoint(c)) mod P

All arithmetic stays < 2^63 (P < 2^31, BASE = 31) so BIGINT never overflows.
These hashes power minhash/LSH dedup, simhash, and document fingerprinting
(the "north star" ops — absent from the reference, SURVEY.md §2.2).
"""

from __future__ import annotations

import random

POLY_BASE = 31
POLY_P = 1_000_000_007


def poly_hash_expr(s: str) -> str:
    """Spark SQL: polynomial hash of a string expression → BIGINT."""
    return (
        f"aggregate(split({s}, ''), CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * {POLY_BASE} + ascii(c)) % {POLY_P})"
    )


def poly_hash_duck(s: str) -> str:
    """DuckDB SQL: same polynomial hash (sequential list_reduce fold)."""
    return (
        f"CASE WHEN length({s}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({s}, ''), c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_P}) END"
    )


def minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the minhash family
    h_i(x) = (a_i * x + b_i) mod P. Same parameters are baked into both the
    Spark plan and the oracle SQL string, so signatures agree exactly."""
    rng = random.Random(seed)
    return [(rng.randrange(1, POLY_P), rng.randrange(0, POLY_P)) for _ in range(num_hashes)]


def minhash_sig_expr(hashes_arr: str, a: int, b: int) -> str:
    """Spark SQL: one minhash value over an array<bigint> of shingle hashes."""
    return (
        f"array_min(transform({hashes_arr}, x -> (x * {a} + {b}) % {POLY_P}))"
    )


def minhash_sig_duck(hashes_arr: str, a: int, b: int) -> str:
    """DuckDB SQL mirror of minhash_sig_expr."""
    return (
        f"list_min(list_transform({hashes_arr}, x -> (x * {a} + {b}) % {POLY_P}))"
    )


def simhash_bit_params(bits: int, seed: int) -> list[tuple[int, int]]:
    """Per-bit universal-hash params for the simhash fingerprint.

    The polynomial token hash is mod P < 2^31, so its raw bits above ~30 are
    always zero — a 64-bit simhash taken directly from ``(h >> i) & 1`` would
    have 34 dead bits. Instead bit i of the fingerprint votes on
    ``parity((h * a_i + b_i) mod P)`` — 64 independent 1-bit hashes of the
    token, every bit carrying real entropy. The (a, b) stream is disjoint
    from the minhash stream (different seed derivation)."""
    return minhash_params(bits, seed + 7919)


def _bit_lit(i: int) -> str:
    """SQL literal for bit i of a BIGINT, valid in BOTH Spark and DuckDB.

    Bit 63 is the sign bit: DuckDB raises on ``1 << 63`` and Spark's ANSI
    parser rejects the raw min-bigint literal, so it is spelled
    ``-9223372036854775807 - 1``."""
    if i == 63:
        return "(CAST(-9223372036854775807 AS BIGINT) - 1)"
    return f"(CAST(1 AS BIGINT) << {i})"


def simhash_vote_spark(h: str, a: int, b: int) -> str:
    """Spark SQL: one token's ±1 vote for one fingerprint bit."""
    return (f"CASE WHEN (({h} * {a} + {b}) % {POLY_P}) % 2 = 1 "
            f"THEN 1 ELSE -1 END")


def simhash_fp_spark_terms(bits: int, seed: int) -> tuple[list[str], str]:
    """(vote aggregate exprs over an exploded token-hash column ``h``,
    fingerprint reassembly expr over v0..v{bits-1}) — the Spark side of the
    shared simhash definition."""
    params = simhash_bit_params(bits, seed)
    votes = [f"sum({simhash_vote_spark('h', a, b)})"
             for (a, b) in params]
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {_bit_lit(i)} ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits))
    return votes, fp


def simhash_fp_duck(th: str, bits: int, seed: int) -> str:
    """DuckDB SQL mirror: simhash fingerprint over a token-hash list expr."""
    params = simhash_bit_params(bits, seed)
    terms = []
    for i, (a, b) in enumerate(params):
        vote = (f"list_sum(list_transform({th}, h -> "
                f"CASE WHEN ((h * {a} + {b}) % {POLY_P}) % 2 = 1 "
                f"THEN 1 ELSE -1 END))")
        terms.append(f"(CASE WHEN {vote} > 0 THEN {_bit_lit(i)} "
                     f"ELSE CAST(0 AS BIGINT) END)")
    return "(" + " + ".join(terms) + ")"


SHINGLE_BASE = 1_000_003  # keep in sync with operators.dedup.SHINGLE_BASE


def token_hashes_duck(text: str) -> str:
    """DuckDB SQL mirror of operators.dedup.token_hashes_expr.

    greatest(unicode(c), 0): DuckDB's unicode('') is -1 while Spark's
    ascii('') is 0; an empty token (empty/whitespace-only document) must
    hash to 0 in both engines or every minhash/LSH/jaccard/simhash oracle
    breaks on such rows."""
    toks = f"string_split_regex(trim(lower({text})), '\\s+')"
    inner = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(t, ''), "
        f"c -> greatest(CAST(unicode(c) AS BIGINT), 0))), "
        f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_P})"
    )
    return f"list_transform({toks}, t -> {inner})"


def shingle_hashes_duck(text: str, k: int) -> str:
    """DuckDB SQL mirror of operators.dedup.shingle_hashes_expr (same rolling
    combination of per-token hashes, same padding semantics)."""
    comb = "CAST(0 AS BIGINT)"
    for j in range(k):
        comb = (f"(({comb} * {SHINGLE_BASE} + "
                f"coalesce(list_extract(th, i + {j}), CAST(0 AS BIGINT))) % {POLY_P})")
    return (
        f"list_transform([{token_hashes_duck(text)}], "
        f"th -> list_transform(range(1, greatest(len(th) - {k - 1}, 1) + 1), "
        f"i -> {comb}))[1]"
    )


def hash_capped_sql(inner_sql: str, group_col: str, item_col: str,
                    cap: int) -> str:
    """DuckDB twin of ``operators.util.hash_capped_groups`` — the ONE
    SQL rendering of the per-group hash-ordered take-N hub bound, so a
    cap change moves every mirror together. ``inner_sql`` must yield
    columns named ``group_col`` and ``item_col``."""
    h = poly_hash_duck(f"CAST({item_col} AS VARCHAR)")
    return f"""
SELECT {group_col}, {item_col} FROM (
  SELECT {group_col}, {item_col},
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {h}, {item_col}) AS _hc_rk
  FROM ({inner_sql}))
WHERE _hc_rk <= {cap}"""
