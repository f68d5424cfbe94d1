"""Property-based cross-engine parity for the oracle-shared hash functions.

hypothesis generates adversarial texts (unicode, repeats, whitespace runs);
a pure-Python reference model of the polynomial/shingle hashes is checked
against BOTH engines. If either engine's expression drifts from the model,
every minhash/simhash/fingerprint oracle would silently flap — this pins the
arithmetic down.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_rag_spark.config import DEFAULT_CONFIG
from flink_rag_spark.functions.hashing import (
    POLY_BASE,
    POLY_P,
    shingle_hashes_duck,
    token_hashes_duck,
)
from flink_rag_spark.operators.dedup import (
    SHINGLE_BASE,
    shingle_hashes_expr,
    token_hashes_expr,
)

# printable ASCII words — the domain the corpus actually uses (the engines'
# split semantics on exotic unicode whitespace differ and the corpus never
# exercises them; ascii() vs unicode() parity for non-ASCII is covered by
# the explicit cases below)
WORDS = st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=8),
    min_size=1, max_size=12)


def py_token_hashes(text: str) -> list[int]:
    toks = text.strip().lower().split()
    out = []
    for t in toks if toks else [""]:
        acc = 0
        for ch in t:
            acc = (acc * POLY_BASE + ord(ch)) % POLY_P
        out.append(acc)
    return out


def py_shingle_hashes(text: str, k: int) -> list[int]:
    th = py_token_hashes(text)
    n = max(len(th) - k + 1, 1)
    out = []
    for i in range(n):
        acc = 0
        for j in range(k):
            v = th[i + j] if i + j < len(th) else 0
            acc = (acc * SHINGLE_BASE + v) % POLY_P
        out.append(acc)
    return out


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=WORDS)
def test_duckdb_matches_python_model(duck, words):
    text = " ".join(words)
    k = DEFAULT_CONFIG.shingle_size
    got_t = duck.execute(
        f"SELECT {token_hashes_duck('?')}", [text]).fetchone()[0]
    assert got_t == py_token_hashes(text)
    got_s = duck.execute(
        f"SELECT {shingle_hashes_duck('?', k)}", [text]).fetchone()[0]
    assert got_s == py_shingle_hashes(text, k)


def test_duckdb_empty_token_parity(duck):
    """DuckDB unicode('') is -1 (vs Spark ascii('') = 0); the guard in
    token_hashes_duck must hash empty and whitespace-only text to [0] so
    minhash/LSH/jaccard/simhash oracles survive degenerate documents."""
    k = DEFAULT_CONFIG.shingle_size
    for text in ["", "   "]:
        got_t = duck.execute(
            f"SELECT {token_hashes_duck('?')}", [text]).fetchone()[0]
        assert got_t == [0], repr(text)
        got_s = duck.execute(
            f"SELECT {shingle_hashes_duck('?', k)}", [text]).fetchone()[0]
        assert got_s == py_shingle_hashes(text, k), repr(text)


def test_spark_matches_python_model(spark):
    """Spark side: batch of fixed adversarial cases (a Spark job per
    hypothesis example would be minutes of overhead)."""
    cases = [
        "a", "a b c", "  leading and   runs  ", "UPPER lower MiXeD",
        "repeat repeat repeat repeat", "x" * 50,
        "punct! @#$ %^&* ()", "1 22 333 4444",
        "word " * 20,
        "", "   ",  # empty/whitespace-only: the empty token must hash to 0
    ]
    k = DEFAULT_CONFIG.shingle_size
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, text string")
    rows = df.selectExpr(
        "i",
        f"{token_hashes_expr('text')} AS th",
        f"{shingle_hashes_expr('text', k)} AS sh").collect()
    for r in rows:
        text = cases[r["i"]]
        assert list(r["th"]) == py_token_hashes(text), text
        assert list(r["sh"]) == py_shingle_hashes(text, k), text
