"""Unit tests for Gopher-style repetition signals (operators/quality.py)
and PII redaction (operators/redaction.py) on hand-computable fixtures."""

import pyspark.sql.functions as F

from flink_rag_spark.operators.quality import repetition_signals
from flink_rag_spark.operators.redaction import redact_pii


def test_repetition_signals_hand_model(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b"),                    # 4 toks, 2 distinct, top a=3
         (1, "x y z w"),                    # all distinct
         (2, "one"),                        # single token → no bigrams
         (3, "ab cd\nab cd\nef")],          # duplicate line
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}

    assert got[0]["n_tokens"] == 4
    assert got[0]["distinct_ratio"] == 0.5
    assert got[0]["top_word_frac"] == 0.75
    assert got[0]["top_bigram_frac"] == round(2 / 3, 6)  # "a a" twice of 3
    assert got[1]["distinct_ratio"] == 1.0
    assert got[1]["top_word_frac"] == 0.25
    assert got[1]["top_bigram_frac"] == round(1 / 3, 6)
    assert got[2]["n_tokens"] == 1
    assert got[2]["top_bigram_frac"] == 0.0  # guarded empty bigram array
    assert got[3]["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert got[0]["dup_line_frac"] == 0.0


def test_repetition_signals_case_folding(spark):
    docs = spark.createDataFrame([(0, "Spam SPAM spam")],
                                 "doc_id long, text string")
    row = repetition_signals(docs).first()
    assert row["distinct_ratio"] == round(1 / 3, 6)
    assert row["top_word_frac"] == 1.0


def test_redact_pii_replacements_and_counts(spark):
    docs = spark.createDataFrame(
        [(0, "mail a@b.com and c.d+x@e.org, call 555-123-4567 from 10.0.0.7"),
         (1, "no pii here"),
         (2, "ip-ish 999.1.2.3 still matches the regex floor")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}

    r0 = got[0]
    assert (r0["n_email"], r0["n_ipv4"], r0["n_phone"]) == (2, 1, 1)
    assert r0["redacted"] == ("mail <EMAIL> and <EMAIL>, call <PHONE> "
                              "from <IP>")
    r1 = got[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (0, 0, 0)
    assert r1["redacted"] == "no pii here"
    assert got[2]["n_ipv4"] == 1  # documented floor: no octet range check


def test_redact_pii_precedence_no_double_count(spark):
    """An email's digits must not also be counted by later patterns — the
    count chain applies patterns in scrub order."""
    docs = spark.createDataFrame(
        [(0, "reach 555-123-4567@example.com")], "doc_id long, text string")
    r = redact_pii(docs).first()
    assert r["n_email"] == 1 and r["n_phone"] == 0
    assert r["redacted"] == "reach <EMAIL>"


def test_redaction_is_narrow_plan(spark):
    """The scrub is one narrow projection: no exchange, no Python."""
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan
