"""PII redaction — the scrub pass every training-data pipeline runs before
a corpus ships (ABSENT in the reference, which stores raw strings;
north-star curation surface, SURVEY.md §2.2).

Pure declarative regexp_replace / regexp_count chains — no Python, whole
pipeline inside whole-stage codegen, embarrassingly parallel (per-row, no
shuffle). Patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB) — no lookaround, no backreferences — so the
DuckDB oracle applies the IDENTICAL patterns and the redacted output is
value-exact across engines.

The pattern set is a pragmatic floor (emails, IPv4, US-style phone
numbers), not a compliance claim: production adds locale packs and a
learned NER tier behind the same column contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: (name, pattern, replacement) — ORDER MATTERS (emails contain digit runs
#: a phone pattern could nibble; scrub the most specific first)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_col(col: str) -> Column:
    """The redacted text column: patterns applied in order."""
    out = F.col(col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count_cols(col: str) -> list[Column]:
    """One count column per pattern (n_email, n_ipv4, n_phone), counted on
    the ORIGINAL text with the same precedence (each pattern counts what
    remains after the more specific ones are scrubbed, so an email's
    digits are never double-counted as a phone)."""
    cols = []
    remaining = F.col(col)
    for name, pat, repl in PII_PATTERNS:
        cols.append(F.regexp_count(remaining, F.lit(pat))
                    .cast("bigint").alias(f"n_{name}"))
        remaining = F.regexp_replace(remaining, pat, repl)
    return cols


def redact_pii(df: DataFrame, col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Append per-category PII counts and the scrubbed text. One narrow
    projection — no shuffle, no Python."""
    return df.select("*", *pii_count_cols(col), redact_col(col).alias(out_col))


# ---------------------------------------------------------------- oracle


def redact_duck(col: str) -> str:
    """DuckDB mirror of redact_col (RE2 'g' flag = global, matching
    Spark's replace-all semantics)."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def pii_counts_duck(col: str) -> list[str]:
    """DuckDB mirrors of pii_count_cols (same precedence chain)."""
    exprs = []
    remaining = col
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        exprs.append(
            f"CAST(len(regexp_extract_all({remaining}, '{p}')) AS BIGINT)"
            f" AS n_{name}")
        remaining = f"regexp_replace({remaining}, '{p}', '{repl}', 'g')"
    return exprs
