"""Text-analysis column functions (north-star ops; ABSENT in the reference,
whose only text op is prompt templating, ``RAG.java:67-84``).

Everything here is pure Spark SQL expressions — no Python UDFs — so the whole
text-analysis pipeline stays inside whole-stage codegen and scales linearly
with executors. Each function has a DuckDB mirror for the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# whitespace tokenization shared by both engines
TOKENS_SPARK = "split(trim({s}), '\\\\s+')"
TOKENS_DUCK = "string_split_regex(trim({s}), '\\s+')"

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic, data-independent.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "la", "los", "que", "y"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def tokens_col(s: str) -> Column:
    return F.expr(TOKENS_SPARK.format(s=s))


def token_count_expr(s: str) -> str:
    return f"size({TOKENS_SPARK.format(s=s)})"


def token_count_duck(s: str) -> str:
    return f"len({TOKENS_DUCK.format(s=s)})"


def punct_ratio_expr(s: str) -> str:
    """share of characters that are not [a-zA-Z0-9 ]."""
    return (
        f"CAST(length(regexp_replace({s}, '[a-zA-Z0-9 ]', '')) AS DOUBLE)"
        f" / length({s})"
    )


def punct_ratio_duck(s: str) -> str:
    return (
        f"CAST(length(regexp_replace({s}, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / length({s})"
    )


def stopword_ratio_expr(s: str, words: list[str]) -> str:
    """share of whitespace tokens that appear in `words` (Spark SQL)."""
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    toks = TOKENS_SPARK.format(s=s)
    return (
        f"CAST(size(filter({toks}, t -> array_contains({arr}, lower(t)))) AS DOUBLE)"
        f" / greatest(size({toks}), 1)"
    )


def stopword_ratio_duck(s: str, words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    toks = TOKENS_DUCK.format(s=s)
    return (
        f"CAST(len(list_filter({toks}, t -> list_contains({arr}, lower(t)))) AS DOUBLE)"
        f" / greatest(len({toks}), 1)"
    )
