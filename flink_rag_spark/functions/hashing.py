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
