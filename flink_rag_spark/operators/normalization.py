"""Text normalization — the canonical-form pass before dedup/tokenize.

Every large-corpus pipeline normalizes text before hashing or training
(CCNet lowercases and strips accents/punctuation before its LM filter;
exact-dedup is worthless if 'Foo  bar' and 'foo bar' hash apart). The
reference ingests raw Kafka strings with no normalization
(`StreamingStoreKnowledge.java:40-52`).

Two tiers, mirroring the codec pattern elsewhere in this repo:

- ``normalize_text`` — the SQL-expressible core (control-char strip,
  lowercase, whitespace squeeze, trim) as pure codegen expressions with
  a bit-identical DuckDB mirror. Regex subset chosen to mean the same
  thing in Java regex (Spark) and RE2 (DuckDB): explicit hex classes
  and ``\\s``, whose ASCII sets coincide.
- ``nfc_normalize_col`` — Unicode NFC canonicalization, genuinely
  non-relational (needs the Unicode tables), as an Arrow-batched pandas
  UDF over stdlib ``unicodedata``; pytest pins it against DuckDB's
  native ``nfc_normalize``.

Both are row-local, shuffle-free map stages — at 100 TB they pipeline
into whatever scan feeds them and cost one pass.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

_CTRL = "[\\x00-\\x1F\\x7F]"


def normalize_text(c: Column | str) -> Column:
    """Deterministic canonical form: control chars → space, lowercase,
    any whitespace run → one space, trimmed."""
    s = F.col(c) if isinstance(c, str) else c
    s = F.regexp_replace(s, _CTRL, " ")
    s = F.lower(s)
    s = F.regexp_replace(s, "\\s+", " ")
    return F.trim(s)


def normalize_text_duck(c: str) -> str:
    """DuckDB mirror of ``normalize_text`` (RE2 'g' = replace-all, which
    is Spark's regexp_replace default)."""
    return (
        f"trim(regexp_replace(lower(regexp_replace({c}, "
        f"'{_CTRL}', ' ', 'g')), '\\s+', ' ', 'g'))"
    )


def nfc_normalize_col() -> "F.udf":
    """Arrow-batched Unicode NFC canonicalization (stdlib unicodedata —
    no external deps). Compose with ``normalize_text`` when the corpus
    mixes composed/decomposed code points; NFC must run FIRST so the
    lowercase/squeeze steps see canonical characters."""
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda t: None if t is None
                     else unicodedata.normalize("NFC", t))

    return _nfc
