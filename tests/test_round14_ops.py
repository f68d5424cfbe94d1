"""Round-14 operator tests: FlinkCEP optional() steps (batch +
streaming + mirror parity), pattern-group desugaring, and the round's
engine-exactness hardening."""

import duckdb
import pytest


# ---------------------------------------------- optional() steps


def _opt_events(spark):
    """Three users over a [view, click?, purchase] shape:
    u1: view@1, click@2, purchase@3  — inclusive variant ties the
        skip variant at t3=3 → click reported.
    u2: view@1, purchase@2, click@4, purchase@5 — the skip variant
        completes at 2 BEFORE any click → click skipped (NULL t2).
    u3: view@1, click@2 (no purchase) — no variant completes →
        all-NULL row."""
    rows = [("u1", 1, "view"), ("u1", 2, "click"), ("u1", 3, "purchase"),
            ("u2", 1, "view"), ("u2", 2, "purchase"), ("u2", 4, "click"),
            ("u2", 5, "purchase"),
            ("u3", 1, "view"), ("u3", 2, "click")]
    import pyspark.sql.functions as F
    return (spark.createDataFrame(
        [(u, s, t, i) for i, (u, s, t) in enumerate(rows)],
        "user_id string, s bigint, event_type string, event_id bigint")
        .select("user_id", "event_id",
                F.timestamp_seconds(F.col("s")).alias("ts"),
                "event_type"))


def _t(r, j):
    v = r[f"t{j}"]
    return None if v is None else int(v.timestamp())


def test_optional_funnel_hand_values(spark):
    """The earliest-final / most-inclusive contract: a click before the
    completing purchase is reported (tie → inclusive wins); a purchase
    completing before any click skips the click; no completion emits
    the all-NULL row."""
    from flink_rag_spark.operators.sequences import optional_funnel_times
    e = _opt_events(spark)
    out = {r["user_id"]: r for r in optional_funnel_times(
        e, ["view", "click", "purchase"], [2]).collect()}
    assert (_t(out["u1"], 1), _t(out["u1"], 2), _t(out["u1"], 3)) == \
        (1, 2, 3)
    assert (_t(out["u2"], 1), _t(out["u2"], 2), _t(out["u2"], 3)) == \
        (1, None, 2)
    assert (_t(out["u3"], 1), _t(out["u3"], 2), _t(out["u3"], 3)) == \
        (None, None, None)


def test_optional_funnel_multi_and_within(spark):
    """Two optional steps desugar to 4 layers; within_seconds anchors
    each variant at its OWN first included step (an optional step 1
    re-anchors the window at step 2)."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.sequences import optional_funnel_times
    rows = [("w", 1, "a"), ("w", 10, "b"), ("w", 11, "c"),
            ("x", 5, "b"), ("x", 6, "c")]
    e = (spark.createDataFrame(
        [(u, s, t, i) for i, (u, s, t) in enumerate(rows)],
        "user_id string, s bigint, event_type string, event_id bigint")
        .select("user_id", "event_id",
                F.timestamp_seconds(F.col("s")).alias("ts"),
                "event_type"))
    # a optional, b optional, c required: w completes inclusively at 11
    out = {r["user_id"]: r for r in optional_funnel_times(
        e, ["a", "b", "c"], [1, 2]).collect()}
    assert (_t(out["w"], 1), _t(out["w"], 2), _t(out["w"], 3)) == \
        (1, 10, 11)
    assert (_t(out["x"], 1), _t(out["x"], 2), _t(out["x"], 3)) == \
        (None, 5, 6)
    # within=2: w's inclusive variants blow the window from a@1, but
    # the skip-a variant anchors at b@10 and completes in-window
    win = {r["user_id"]: r for r in optional_funnel_times(
        e, ["a", "b", "c"], [1, 2], within_seconds=2).collect()}
    assert (_t(win["w"], 1), _t(win["w"], 2), _t(win["w"], 3)) == \
        (None, 10, 11)


def test_optional_funnel_guards():
    """Validation: empty/out-of-range/all-optional/too-many raise."""
    from flink_rag_spark.operators.sequences import _optional_layers
    with pytest.raises(ValueError, match="non-empty"):
        _optional_layers(3, [])
    with pytest.raises(ValueError, match="1..3"):
        _optional_layers(3, [4])
    with pytest.raises(ValueError, match="required"):
        _optional_layers(2, [1, 2])
    with pytest.raises(ValueError, match="at most"):
        _optional_layers(8, [1, 2, 3, 4, 5, 6, 7])
    # preference order: all-included first, then earlier inclusions
    layers = _optional_layers(3, [1, 2])
    assert [inc for _b, inc in layers] == \
        [[1, 2, 3], [1, 3], [2, 3], [3]]


def test_optional_funnel_duck_parity(spark):
    """The mirror desugars and picks identically on the hand fixture."""
    from flink_rag_spark.operators.sequences import (
        optional_funnel_times, optional_funnel_times_duck)
    e = _opt_events(spark)
    steps = ["view", "click", "purchase"]
    sp = {r["user_id"]: (_t(r, 1), _t(r, 2), _t(r, 3))
          for r in optional_funnel_times(e, steps, [2]).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT * FROM (VALUES "
                + ", ".join(
                    f"('{u}', {i}, to_timestamp({s}), '{t}')"
                    for i, (u, s, t) in enumerate(
                        [("u1", 1, "view"), ("u1", 2, "click"),
                         ("u1", 3, "purchase"),
                         ("u2", 1, "view"), ("u2", 2, "purchase"),
                         ("u2", 4, "click"), ("u2", 5, "purchase"),
                         ("u3", 1, "view"), ("u3", 2, "click")]))
                + ") v(user_id, event_id, ts, event_type)")
    du = {r[0]: tuple(None if v is None else int(v.timestamp())
                      for v in r[1:])
          for r in con.execute(
              optional_funnel_times_duck(steps, [2])).fetchall()}
    assert sp == du


def test_streaming_optional_matches_batch(spark, tmp_path):
    """optional() streaming ≡ batch completions (t_final non-NULL)
    under cross-batch disorder: u1's click arrives LATE but still
    reports inclusively; u2 skips; u3 never emits."""
    from flink_rag_spark.operators.sequences import optional_funnel_times
    from flink_rag_spark.streaming.cep import optional_funnel_monitor
    from tests.test_round13_ops import _drain, _write_cep_batch
    steps = ["view", "click", "purchase"]
    ev = [("2024-01-01 00:00:01", 1, "view"),
          ("2024-01-01 00:00:03", 1, "purchase"),
          ("2024-01-01 00:00:01", 2, "view"),
          ("2024-01-01 00:00:02", 2, "purchase"),
          ("2024-01-01 00:00:04", 2, "click"),
          ("2024-01-01 00:00:05", 2, "purchase"),
          ("2024-01-01 00:00:01", 3, "view"),
          ("2024-01-01 00:00:02", 3, "click")]
    late = [("2024-01-01 00:00:02", 1, "click")]
    tail = [("2024-01-10 00:00:00", 99, "view")]
    src = str(tmp_path / "opt_src")
    _write_cep_batch(spark, src, ev)
    _write_cep_batch(spark, src, late)
    _write_cep_batch(spark, src, tail)
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    got = sorted(
        (r["user_id"], r["t1"], r["t2"], r["t3"])
        for r in _drain(optional_funnel_monitor(
            stream, steps, [2], watermark="1 hour"),
            tmp_path, "opt_m").collect())
    want = sorted(
        (r["user_id"], r["t1"], r["t2"], r["t3"])
        for r in optional_funnel_times(
            spark.read.parquet(src), steps, [2]).collect()
        if r["t3"] is not None)
    assert got == want
    assert len(got) == 2          # u1 inclusive, u2 skipped
    by_u = {u: (t1, t2, t3) for u, t1, t2, t3 in got}
    assert by_u[1][1] is not None   # late click still reported
    assert by_u[2][1] is None       # skip variant won


# ---------------------------------------------- pattern groups


def test_group_funnel_hand_values(spark):
    """Group(times=2) unrolls the subsequence back-to-back on one
    strict-after chain; Group(optional=True) toggles the WHOLE unit
    (2 layers, not 2^|group|); a required tail completes either way."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.sequences import (Group,
                                                     group_funnel_times)
    rows = [
        # g1: full a (b c b c) d — inclusive variant ties at d@6? No:
        # with-group completes at d@6, skip-group at d@2 is impossible
        # (no d before 6)... d@6 both → inclusive reported
        ("g1", 1, "a"), ("g1", 2, "b"), ("g1", 3, "c"), ("g1", 4, "b"),
        ("g1", 5, "c"), ("g1", 6, "d"),
        # g2: a then d with only ONE b c — group can't double, skipped
        ("g2", 1, "a"), ("g2", 2, "b"), ("g2", 3, "c"), ("g2", 4, "d"),
        # g3: no a — nothing
        ("g3", 2, "b"), ("g3", 3, "c"),
    ]
    e = (spark.createDataFrame(
        [(u, s, t, i) for i, (u, s, t) in enumerate(rows)],
        "user_id string, s bigint, event_type string, event_id bigint")
        .select("user_id", "event_id",
                F.timestamp_seconds(F.col("s")).alias("ts"),
                "event_type"))
    entries = ["a", Group(["b", "c"], times=2, optional=True), "d"]
    out = {r["user_id"]: r for r in
           group_funnel_times(e, entries).collect()}
    assert (_t(out["g1"], 1), _t(out["g1"], 2), _t(out["g1"], 3)) == \
        (1, 5, 6)
    assert (_t(out["g2"], 1), _t(out["g2"], 2), _t(out["g2"], 3)) == \
        (1, None, 4)
    assert (_t(out["g3"], 1), _t(out["g3"], 2), _t(out["g3"], 3)) == \
        (None, None, None)
    # required group times=2, no optional: pure quantified collapse
    req = {r["user_id"]: r for r in group_funnel_times(
        e, ["a", Group(["b", "c"], times=2), "d"]).collect()}
    assert (_t(req["g1"], 1), _t(req["g1"], 2), _t(req["g1"], 3)) == \
        (1, 5, 6)
    assert _t(req["g2"], 3) is None         # can't double -> no d


def test_group_funnel_guards_and_expand():
    """Group validation + the desugaring's flat/last/units contract."""
    from flink_rag_spark.operators.sequences import (
        Group, expand_group_entries)
    with pytest.raises(ValueError, match="at least one step"):
        Group([])
    with pytest.raises(ValueError, match="times"):
        Group(["a"], times=0)
    flat, last, units = expand_group_entries(
        ["x", Group(["a", ("b", 2)], times=2, optional=True), ("y", 3)])
    assert flat == ["x", "a", "b", "b", "a", "b", "b", "y", "y", "y"]
    assert last == [1, 7, 10]
    assert units == [(2, 3, 4, 5, 6, 7)]


def test_group_funnel_duck_parity(spark):
    """Mirror parity on the hand fixture, both group shapes."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.sequences import (
        Group, group_funnel_times, group_funnel_times_duck)
    rows = [("g1", 1, "a"), ("g1", 2, "b"), ("g1", 3, "c"),
            ("g1", 4, "b"), ("g1", 5, "c"), ("g1", 6, "d"),
            ("g2", 1, "a"), ("g2", 2, "b"), ("g2", 3, "c"),
            ("g2", 4, "d"), ("g3", 2, "b"), ("g3", 3, "c")]
    e = (spark.createDataFrame(
        [(u, s, t, i) for i, (u, s, t) in enumerate(rows)],
        "user_id string, s bigint, event_type string, event_id bigint")
        .select("user_id", "event_id",
                F.timestamp_seconds(F.col("s")).alias("ts"),
                "event_type"))
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT * FROM (VALUES "
                + ", ".join(
                    f"('{u}', {i}, to_timestamp({s}), '{t}')"
                    for i, (u, s, t) in enumerate(rows))
                + ") v(user_id, event_id, ts, event_type)")
    for entries in (["a", Group(["b", "c"], times=2, optional=True), "d"],
                    ["a", Group(["b", "c"], times=2), "d"]):
        sp = {r["user_id"]: (_t(r, 1), _t(r, 2), _t(r, 3))
              for r in group_funnel_times(e, entries).collect()}
        du = {r[0]: tuple(None if v is None else int(v.timestamp())
                          for v in r[1:])
              for r in con.execute(
                  group_funnel_times_duck(entries)).fetchall()}
        assert sp == du, entries


# ---------------------------------------------- fuzzy term search


def test_fuzzy_match_terms_cascade(spark):
    """Length band and prefix prune are exact-preserving; the
    thresholded levenshtein decides: 'sport' at d=2 matches sort(1) and
    spark(2), never scan(3) or join; d=1 keeps only sort."""
    from flink_rag_spark.operators.ranking import fuzzy_match_terms
    vocab = spark.createDataFrame(
        [("sort",), ("spark",), ("scan",), ("join",), ("sports",),
         ("sp",), ("s",)], "term string")
    got = {r["term"]: r["distance"] for r in
           fuzzy_match_terms(vocab, "sport", 2).collect()}
    assert got == {"sort": 1, "spark": 2, "sports": 1}
    got1 = {r["term"]: r["distance"] for r in
            fuzzy_match_terms(vocab, "sport", 1).collect()}
    assert got1 == {"sort": 1, "sports": 1}
    with pytest.raises(ValueError, match="non-empty"):
        fuzzy_match_terms(vocab, "  ", 2)
    with pytest.raises(ValueError, match="fuzziness cap"):
        fuzzy_match_terms(vocab, "sport", 3)


def test_fuzzy_prefix_prune_never_drops_matches(spark):
    """Adversarial prefix cases — edits AT the start (insert, delete,
    substitute position 0) must all survive the prefix-character
    prune."""
    from flink_rag_spark.operators.ranking import fuzzy_match_terms
    vocab = spark.createDataFrame(
        [("xab",), ("bc",), ("zbc",), ("abc",), ("ab",)], "term string")
    got = {r["term"] for r in
           fuzzy_match_terms(vocab, "abc", 2).collect()}
    # xab: insert x + delete c = 2; bc: delete a = 1; zbc: sub a->z = 1
    assert got == {"xab", "bc", "zbc", "abc", "ab"}


def test_fuzzy_term_topk_indexed_matches_inline(spark, sf_oracle,
                                                tmp_path):
    """The serving path (persisted index, vocabulary from postings) is
    bit-identical to the inline corpus scan."""
    from flink_rag_spark.operators.ranking import (
        build_text_index, fuzzy_term_topk, fuzzy_term_topk_indexed)
    from flink_rag_spark.sources.tables import load_table
    d = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    path = str(tmp_path / "fuzzy_tix")
    build_text_index(spark, d, path, n_parts=8)
    inline = [(r["doc_id"], r["score"], r["rank"]) for r in
              fuzzy_term_topk(d, "sport", 2, k=15).collect()]
    indexed = [(r["doc_id"], r["score"], r["rank"]) for r in
               fuzzy_term_topk_indexed(spark, path, "sport", 2,
                                       k=15).collect()]
    assert inline == indexed
    assert len(inline) == 15
