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


# ---------------------------------------------- HHI concentration


def test_hhi_hand_values(spark):
    """Even 4-way split -> HHI .25, normalized 0; a 3:1 duopoly ->
    .625 / .25; a single member -> 1 with NULL normalized; decimal
    contract enforced."""
    from decimal import Decimal

    from flink_rag_spark.operators.profiling import (
        hhi_concentration, hhi_concentration_duck)
    rows = [("a", f"m{i}", Decimal("1.00")) for i in range(4)] + \
           [("b", "m1", Decimal("3.00")), ("b", "m2", Decimal("1.00")),
            ("c", "m1", Decimal("7.00")), ("c", "m1", Decimal("3.00"))]
    df = spark.createDataFrame(
        rows, "g string, m string, v decimal(15,2)")
    out = {r["g"]: r for r in
           hhi_concentration(df, "v", ["m"], ["g"]).collect()}
    assert out["a"]["hhi"] == 0.25 and out["a"]["hhi_normalized"] == 0.0
    assert out["b"]["hhi"] == 0.625
    assert out["b"]["hhi_normalized"] == 0.25
    assert out["c"]["hhi"] == 1.0 and out["c"]["hhi_normalized"] is None
    assert out["c"]["n_members"] == 1
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                "('a','m0',1.00),('a','m1',1.00),('a','m2',1.00),"
                "('a','m3',1.00),('b','m1',3.00),('b','m2',1.00),"
                "('c','m1',7.00),('c','m1',3.00)) v(g,m,v)")
    d = con.execute(hhi_concentration_duck(
        "SELECT g, m, CAST(v AS DECIMAL(15,2)) AS v FROM t",
        "v", ["m"], ["g"]) + " ORDER BY g").fetchall()
    assert [(r[2], r[3]) for r in d] == \
        [(0.25, 0.0), (0.625, 0.25), (1.0, None)]
    import pyspark.sql.functions as F
    bad = df.withColumn("v", F.col("v").cast("double"))
    with pytest.raises(TypeError, match="DECIMAL"):
        hhi_concentration(bad, "v", ["m"], ["g"])


# ---------------------------------------------- Kendall tau-b


def test_kendall_tau_hand_values(spark):
    """Perfect concordance -> tau 1; perfect discordance -> -1; the
    2x2 tie grid -> 0 with the tie-corrected variance; constant column
    -> NULL tau."""
    from flink_rag_spark.operators.hypothesis import (
        kendall_tau, kendall_tau_duck)

    def tau_of(pairs):
        df = spark.createDataFrame(pairs, "x int, y int")
        return kendall_tau(df, "x", "y").collect()[0]

    r = tau_of([(1, 1), (2, 2), (3, 3)])
    assert r["tau"] == 1.0 and r["n"] == 3
    r = tau_of([(1, 3), (2, 2), (3, 1)])
    assert r["tau"] == -1.0
    r = tau_of([(1, 1), (1, 2), (2, 1), (2, 2)])
    assert r["tau"] == 0.0 and not r["significant"]
    r = tau_of([(1, 7), (2, 7), (3, 7)])
    assert r["tau"] is None and not r["significant"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                "(1,1),(1,2),(2,1),(2,2)) v(x,y)")
    d = con.execute(kendall_tau_duck(
        "SELECT x, y FROM t", "x", "y")).fetchone()
    assert d[1] == 0.0


def test_kendall_tau_scipy_style_ties(spark):
    """A mixed-tie fixture against the hand-evaluated tie-corrected
    formula: x=[1,1,2,3], y=[1,2,2,3] -> C=4, D=0, n1=n2=1,
    tau = 4/sqrt(5*5) = 0.8."""
    from flink_rag_spark.operators.hypothesis import kendall_tau
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (3, 3)], "x int, y int")
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["tau"] == 0.8


# ---------------------------------------------- G-test


def test_g_test_hand_values(spark):
    """Uniform 2x2 -> G 0, not significant; diagonal [[20,0],[0,20]]
    -> G = 80 ln2 (quantized) -> significant at any small crit."""
    from flink_rag_spark.operators.hypothesis import (
        g_test_independence, g_test_independence_duck)
    rows = ([("a", "x")] * 10 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 10)
    df = spark.createDataFrame(rows, "r string, c string")
    out = g_test_independence(df, "r", "c", 3.841).collect()[0]
    assert out["g"] == 0.0 and not out["significant"]
    assert out["dof"] == 1 and out["n"] == 40
    rows = [("a", "x")] * 20 + [("b", "y")] * 20
    df = spark.createDataFrame(rows, "r string, c string")
    out = g_test_independence(df, "r", "c", 3.841).collect()[0]
    # two OBSERVED cells (G skips O=0, unlike chi-square's full grid):
    # 2 * 2 * 20 * round(ln 2, 9) = 55.451774 (9-dp quantized)
    assert out["g"] == 55.451774 and out["significant"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'a' AS r, 'x' AS c FROM "
                "range(20) UNION ALL SELECT 'b', 'y' FROM range(20)")
    d = con.execute(g_test_independence_duck(
        "SELECT r, c FROM t", "r", "c", 3.841)).fetchone()
    assert float(d[4]) == 55.451774 and d[5]


# ---------------------------------------------- Page-Hinkley


def _ph_reference(xs, delta, lam):
    """Independent python fold of the quantized PH definition."""
    from decimal import ROUND_HALF_UP, Decimal
    t, s = 0, Decimal(0)
    m_hi = m_lo = Decimal(0)
    min_hi = min_lo = None
    first_hi = first_lo = None
    max_hi = max_lo = Decimal(0)
    n_alarms = 0
    for i, x in enumerate(xs, start=1):
        xq = Decimal(str(x)).quantize(Decimal("1e-6"),
                                      rounding=ROUND_HALF_UP)
        t, s = i, s + xq
        fl = s.to_integral_value(rounding="ROUND_FLOOR")
        s_d = float(fl) + float(s - fl)
        xbar = s_d / t
        for side, sign in (("hi", 1), ("lo", -1)):
            term = sign * (float(xq) - xbar) - delta
            tq = Decimal(repr(term)).quantize(
                Decimal("1e-9"), rounding=ROUND_HALF_UP)
            if side == "hi":
                m_hi += tq
                min_hi = m_hi if min_hi is None else min(min_hi, m_hi)
                ph = float(m_hi - min_hi)
            else:
                m_lo += tq
                min_lo = m_lo if min_lo is None else min(min_lo, m_lo)
                ph = float(m_lo - min_lo)
            ph = round(ph, 6)
            if side == "hi":
                max_hi = max(max_hi, Decimal(str(ph)))
                if ph > lam and first_hi is None:
                    first_hi = i
            else:
                max_lo = max(max_lo, Decimal(str(ph)))
                if ph > lam and first_lo is None:
                    first_lo = i
    return first_hi, first_lo, float(max_hi), float(max_lo)


def test_page_hinkley_hand_values(spark):
    """A level shift upward fires the hi side at the instant the
    independent python fold predicts; a constant series never alarms;
    mirror parity on the same fixture."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.anomaly import (
        page_hinkley_alarms, page_hinkley_alarms_duck)
    xs = [10.0] * 6 + [60.0] * 6
    rows = [("u", i, float(x)) for i, x in enumerate(xs, start=1)]
    df = (spark.createDataFrame(rows, "k string, s bigint, v double")
          .select("k", F.col("s").alias("event_id"),
                  F.timestamp_seconds(F.col("s")).alias("ts"), "v"))
    out = page_hinkley_alarms(df, ["k"], "ts", "v", delta=2.0,
                              lam=50.0, seq_col="event_id").collect()[0]
    fh, fl, mh, ml = _ph_reference(xs, 2.0, 50.0)
    assert out["first_lo_ts"] is None
    assert int(out["first_hi_ts"].timestamp()) == fh
    assert out["max_ph_hi"] == mh
    flat = page_hinkley_alarms(
        df.withColumn("v", F.lit(5.0)), ["k"], "ts", "v",
        delta=2.0, lam=50.0, seq_col="event_id").collect()[0]
    assert flat["n_alarms"] == 0 and flat["first_hi_ts"] is None
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " + ", ".join(
        f"('u', {i}, to_timestamp({i}), {x})"
        for i, x in enumerate(xs, start=1)) + ") v(k, event_id, ts, v)")
    d = con.execute(page_hinkley_alarms_duck(
        "SELECT * FROM t", ["k"], "ts", "v", 2.0, 50.0,
        seq_col="event_id")).fetchone()
    assert int(d[1].timestamp()) == fh and float(d[3]) == mh


# ---------------------------------------------- TextRank


def test_textrank_hand_values(spark):
    """A symmetric 2-word chain ranks both words equally; a hub word
    outranks its spokes; edge builder emits both directions with
    window-banded pairs only."""
    from flink_rag_spark.operators.keywords import (
        textrank_cooccurrence_edges, textrank_keywords)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "hub x hub y hub z")],
        "doc_id bigint, text string")
    edges = {(r["src"], r["dst"]): r["w"] for r in
             textrank_cooccurrence_edges(
                 docs.filter("doc_id = 1"), "text", "doc_id",
                 window=1).collect()}
    assert edges == {("a", "b"): 3, ("b", "a"): 3}
    out = textrank_keywords(docs.filter("doc_id = 1"),
                            k=5, window=1).collect()
    assert [r["term"] for r in out] == ["a", "b"]
    assert out[0]["pr"] == out[1]["pr"]
    hub = textrank_keywords(docs.filter("doc_id = 2"),
                            k=5, window=1).collect()
    assert hub[0]["term"] == "hub"
    assert hub[0]["pr"] > hub[1]["pr"]


def test_textrank_duck_parity(spark):
    """Mirror parity: the same edges through the unrolled weighted
    pagerank, same top-k tie order."""
    from flink_rag_spark.operators.keywords import (
        textrank_keywords, textrank_keywords_duck)
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "c a d d c"), (3, "b d a c b")],
        "doc_id bigint, text string")
    sp = [(r["term"], r["pr"], r["rank"]) for r in
          textrank_keywords(docs, k=4, window=2).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                "(1, 'a b c a b'), (2, 'c a d d c'), (3, 'b d a c b')"
                ") v(doc_id, text)")
    du = [(r[0], float(r[1]), r[2]) for r in
          con.execute(textrank_keywords_duck(k=4, window=2)).fetchall()]
    assert sp == du


def test_streaming_page_hinkley_matches_batch(spark, tmp_path):
    """The streaming fold's final per-key state equals the batch
    page_hinkley_scores' last row over the same events — EXACT (the
    fold replays the batch quantization) — including cross-batch
    disorder inside the watermark; the first alarm_hi emission is the
    drift alert."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W
    from flink_rag_spark.operators.anomaly import page_hinkley_scores
    from flink_rag_spark.streaming.ph_monitor import page_hinkley_monitor
    from tests.test_round9_ops import _write_vbatch
    src = str(tmp_path / "ph_src")
    delta, lam = 2.0, 30.0
    _write_vbatch(spark, src, [
        ("2024-01-01 00:10:00", 1, 50.0),
        ("2024-01-01 00:00:00", 1, 10.0),
        ("2024-01-01 00:05:00", 2, 10.0),
    ])
    _write_vbatch(spark, src, [
        ("2024-01-01 00:05:00", 1, 10.125),   # late, in-watermark
        ("2024-01-01 00:20:00", 1, 55.5),
        ("2024-01-01 00:20:00", 2, 10.0),
        ("2024-06-01 00:00:00", 99, 0.0),     # flush key
    ])
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "value double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (page_hinkley_monitor(stream, delta, lam, watermark="30 days")
         .writeStream.format("memory").queryName("ph_t")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_ph"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain in time"
    emitted = spark.sql("select * from ph_t").collect()
    last = {}
    for r in emitted:
        if (r["user_id"] not in last
                or r["n_events"] > last[r["user_id"]]["n_events"]):
            last[r["user_id"]] = r
    assert set(last) == {1, 2}
    batch = page_hinkley_scores(
        spark.read.parquet(src).filter("user_id < 99"),
        ["user_id"], "ts", "value", delta, seq_col="event_id")
    final = {r["user_id"]: r for r in batch.withColumn(
        "_rn", F.row_number().over(
            W.partitionBy("user_id").orderBy(F.desc("ts"),
                                             F.desc("event_id"))))
        .filter("_rn = 1").collect()}
    for uid in (1, 2):
        assert last[uid]["ph_hi"] == final[uid]["ph_hi"], uid
        assert last[uid]["ph_lo"] == final[uid]["ph_lo"], uid
    assert last[1]["alarm_hi"] and not last[2]["alarm_hi"]
    assert [r for r in emitted if r["user_id"] == 1 and r["alarm_hi"]]


# ---------------------------------------------- Dickey-Fuller


def test_dickey_fuller_hand_values(spark):
    """y=[10,2,8,4,6]: centered sums give beta=-1.7, RSS=0.4,
    DF=-24.041631 (strongly mean-reverting -> stationary); a constant-
    difference trend has zero residual variance -> NULL stats; short
    series -> NULL."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.timeseries import (
        dickey_fuller, dickey_fuller_duck)

    def mk(name, ys):
        return [(name, i, float(y)) for i, y in enumerate(ys, start=1)]

    rows = mk("m", [10, 2, 8, 4, 6]) + mk("t", [1, 2, 3, 4, 5]) \
        + mk("s", [5, 6])
    df = (spark.createDataFrame(rows, "k string, s bigint, v double")
          .select("k", F.col("s").alias("event_id"),
                  F.timestamp_seconds(F.col("s")).alias("ts"), "v"))
    out = {r["k"]: r for r in dickey_fuller(
        df, ["k"], "ts", "v", seq_col="event_id").collect()}
    assert out["m"]["beta"] == -1.7
    assert out["m"]["df_stat"] == -24.041631
    assert out["m"]["stationary"]
    assert out["t"]["df_stat"] is None and not out["t"]["stationary"]
    assert out["s"]["df_stat"] is None and not out["s"]["stationary"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " + ", ".join(
        f"('{k}', {i}, to_timestamp({i}), {v})" for k, i, v in rows)
        + ") v(k, event_id, ts, v)")
    d = {r[0]: r for r in con.execute(dickey_fuller_duck(
        "SELECT * FROM t", ["k"], "ts", "v",
        seq_col="event_id")).fetchall()}
    assert float(d["m"][2]) == -1.7 and float(d["m"][3]) == -24.041631
    assert d["t"][3] is None and d["s"][3] is None


# ---------------------------------------------- RFM segmentation


def test_rfm_hand_values(spark):
    """Four keys over engineered dimensions: scores follow
    ceil(5·cum/N) with ties sharing a score; segment digits concat;
    mirror parity."""
    import pyspark.sql.functions as F
    from flink_rag_spark.operators.profiling import (
        rfm_scores, rfm_scores_duck)
    # k1: 1 event @t1 v=10; k2: 2 events @t2 v=20 total;
    # k3: 2 events @t3 v=40 total; k4: 1 event @t4 v=40
    rows = [("k1", 1, 10.0), ("k2", 2, 5.0), ("k2", 2, 15.0),
            ("k3", 3, 20.0), ("k3", 3, 20.0), ("k4", 4, 40.0)]
    df = (spark.createDataFrame(rows, "k string, s bigint, v double")
          .select("k", F.timestamp_seconds(F.col("s")).alias("ts"),
                  "v"))
    out = {r["key"]: r for r in
           rfm_scores(df, "k", "ts", "v", n_tiles=4).collect()}
    # recency: distinct ts 1<2<3<4 -> cum 1..4 of N=4 -> scores 1..4
    assert [out[f"k{i}"]["r_score"] for i in (1, 2, 3, 4)] == \
        [1, 2, 3, 4]
    # frequency: 1(x2 keys),2(x2): cum(1)=2 -> ceil(8/4)=2;
    # cum(2)=4 -> 4 — ties share
    assert [out[f"k{i}"]["f_score"] for i in (1, 2, 3, 4)] == \
        [2, 4, 4, 2]
    # monetary: 10<20<40(tie x2): cum 1,2,4 -> scores 1,2,4
    assert [out[f"k{i}"]["m_score"] for i in (1, 2, 3, 4)] == \
        [1, 2, 4, 4]
    assert out["k3"]["rfm_segment"] == "344"
    assert out["k3"]["monetary"] == 40.0
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " + ", ".join(
        f"('{k}', to_timestamp({s}), {v})" for k, s, v in rows)
        + ") v(k, ts, v)")
    du = {r[0]: r for r in con.execute(rfm_scores_duck(
        "SELECT * FROM t", "k", "ts", "v", n_tiles=4)).fetchall()}
    for k, r in out.items():
        assert (du[k][4], du[k][5], du[k][6], du[k][7]) == \
            (r["r_score"], r["f_score"], r["m_score"], r["rfm_segment"])
    with pytest.raises(ValueError, match="n_tiles"):
        rfm_scores(df, "k", "ts", "v", n_tiles=1)


# ---------------------------------------------- effect sizes


def test_cramers_v_hand_values(spark):
    """Perfect 2x2 association -> phi = V = 1; independence -> 0."""
    from flink_rag_spark.operators.hypothesis import (
        cramers_v, cramers_v_duck)
    rows = [("a", "x")] * 20 + [("b", "y")] * 20
    df = spark.createDataFrame(rows, "r string, c string")
    out = cramers_v(df, "r", "c", 3.841).collect()[0]
    assert out["phi"] == 1.0 and out["cramers_v"] == 1.0
    assert out["significant"]
    rows = ([("a", "x")] * 10 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 10)
    df = spark.createDataFrame(rows, "r string, c string")
    out = cramers_v(df, "r", "c", 3.841).collect()[0]
    assert out["cramers_v"] == 0.0 and not out["significant"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'a' AS r, 'x' AS c FROM "
                "range(20) UNION ALL SELECT 'b', 'y' FROM range(20)")
    d = con.execute(cramers_v_duck(
        "SELECT r, c FROM t", "r", "c", 3.841)).fetchone()
    assert float(d[6]) == 1.0


def test_mutual_information_hand_values(spark):
    """Perfect 2x2 association: MI = H(X) = H(Y) = ln 2, NMI = 1;
    independence: MI 0, NMI 0."""
    from flink_rag_spark.operators.hypothesis import (
        mutual_information, mutual_information_duck)
    rows = [("a", "x")] * 20 + [("b", "y")] * 20
    df = spark.createDataFrame(rows, "r string, c string")
    out = mutual_information(df, "r", "c").collect()[0]
    ln2_q = 0.693147  # round(round(ln 2, 9), 6)
    assert out["mi"] == ln2_q and out["h_x"] == ln2_q
    assert out["h_y"] == ln2_q and out["nmi"] == 1.0
    rows = ([("a", "x")] * 10 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 10)
    df = spark.createDataFrame(rows, "r string, c string")
    out = mutual_information(df, "r", "c").collect()[0]
    assert out["mi"] == 0.0 and out["nmi"] == 0.0
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'a' AS r, 'x' AS c FROM "
                "range(20) UNION ALL SELECT 'b', 'y' FROM range(20)")
    d = con.execute(mutual_information_duck(
        "SELECT r, c FROM t", "r", "c")).fetchone()
    assert float(d[1]) == ln2_q and float(d[4]) == 1.0


def test_streaming_group_matches_batch(spark, tmp_path):
    """Pattern-group streaming ≡ batch completions under cross-batch
    disorder: the doubled optional (b c)×2 group reports inclusively
    when it fits before the completing d, skips when it can't."""
    from flink_rag_spark.operators.sequences import (Group,
                                                     group_funnel_times)
    from flink_rag_spark.streaming.cep import group_funnel_monitor
    from tests.test_round13_ops import _drain, _write_cep_batch
    entries = ["a", Group(["b", "c"], times=2, optional=True), "d"]
    ev = [("2024-01-01 00:00:01", 1, "a"),
          ("2024-01-01 00:00:02", 1, "b"),
          ("2024-01-01 00:00:04", 1, "b"),
          ("2024-01-01 00:00:05", 1, "c"),
          ("2024-01-01 00:00:06", 1, "d"),
          ("2024-01-01 00:00:01", 2, "a"),
          ("2024-01-01 00:00:02", 2, "b"),
          ("2024-01-01 00:00:03", 2, "c"),
          ("2024-01-01 00:00:04", 2, "d")]
    late = [("2024-01-01 00:00:03", 1, "c")]   # completes g1's group
    tail = [("2024-01-10 00:00:00", 99, "a")]
    src = str(tmp_path / "grp_src")
    _write_cep_batch(spark, src, ev)
    _write_cep_batch(spark, src, late)
    _write_cep_batch(spark, src, tail)
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    got = sorted(
        (r["user_id"], r["t1"], r["t2"], r["t3"])
        for r in _drain(group_funnel_monitor(
            stream, entries, watermark="1 hour"),
            tmp_path, "grp_m").collect())
    want = sorted(
        (r["user_id"], r["t1"], r["t2"], r["t3"])
        for r in group_funnel_times(
            spark.read.parquet(src), entries).collect()
        if r["t3"] is not None)
    assert got == want
    by_u = {u: (t1, t2, t3) for u, t1, t2, t3 in got}
    assert by_u[1][1] is not None    # doubled group fits (late c)
    assert by_u[2][1] is None        # can't double -> group skipped
