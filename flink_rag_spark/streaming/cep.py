"""Streaming CEP: the sequence funnel as a keyed stateful operator.

FlinkCEP's core loop — buffer out-of-order events per key until the
event-time watermark passes, process them in event-time order against a
pattern automaton, emit a match — re-expressed with
``applyInPandasWithState``. The pattern here is the same
skip-till-next-match earliest-completion funnel as the batch operator
(``operators/sequences.py funnel_times``): state per key is the k
running-min completion timestamps plus the not-yet-finalizable event
buffer, and a key emits EXACTLY ONE row (its earliest completion) the
moment step k's running min becomes final.

Why the emitted completion is final even though later events keep
arriving: the fold only consumes events with ts ≤ watermark, in event-
time order, so when t_k first gets set every future event has a larger
timestamp than t_k and can never lower it (running mins only fall via
EARLIER candidates, which the watermark contract has already ruled
out). Events later than the watermark are dropped — the standard CEP
lateness contract, and the documented bound on batch-equivalence:
``streaming completions ≡ batch funnel_times completions`` whenever
per-key disorder stays within the watermark delay (pinned by test).

State size per key: k + |buffered events within the watermark horizon|
+ 3 scalars — bounded by the watermark, reclaimed for completed keys by
keeping only a ``done`` marker (a second completion for the same key
must never emit, so the marker outlives the buffers).

At 100 TB: the stream pre-filters to pattern-relevant event types
(pushed to the source scan), state shuffles once on the key — the same
single-exchange discipline as the batch twin — and the per-batch python
work is one sort + one linear fold over each key's small buffer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_NONE = -1  # sentinel for "step not yet completed" in the mins array


def _funnel_state_schema() -> str:
    return ("mins array<bigint>, buf_ts array<bigint>, "
            "buf_type array<string>, wm_us bigint, done boolean")


def _funnel_out_schema(n_steps: int, key_type: str = "bigint") -> str:
    ts = ", ".join(f"t{i} timestamp" for i in range(1, n_steps + 1))
    return f"user_id {key_type}, {ts}"


def _make_funnel_fn(steps: list[str], within_us: int | None):
    """Build the applyInPandasWithState body. The closure captures only
    plain python values (shippable without the test module)."""
    k = len(steps)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            mins, buf_ts, buf_type, wm_us, done = state.get
            mins, buf_ts, buf_type = list(mins), list(buf_ts), list(buf_type)
        else:
            mins, buf_ts, buf_type, wm_us, done = \
                [_NONE] * k, [], [], _NONE, False

        if not state.hasTimedOut:
            for pdf in pdfs:
                if done:
                    break  # completed key: only the done marker lives on
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, typ in zip(ts_us, pdf["event_type"]):
                    # Defense in depth: Spark's stateful-operator late
                    # filter drops rows strictly below the CURRENT
                    # watermark before they reach this function, and a
                    # row at EXACTLY the watermark may or may not be
                    # delivered (observed order-sensitive). Whenever a
                    # boundary-equal row IS delivered, this ≥ check
                    # keeps it — order-safe, since equal-ts events
                    # never interact under the strict-> step
                    # conditions — so delivery implies correct folding
                    # either way, including under future
                    # allowed-lateness configs.
                    if int(t) >= wm_us:
                        buf_ts.append(int(t))
                        buf_type.append(str(typ))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        if new_wm_us > wm_us and buf_ts and not done:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_type = [], []
            for i in order:
                t, typ = buf_ts[i], buf_type[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_type.append(typ)
                    continue
                for s in range(k):
                    if typ != steps[s]:
                        continue
                    if s == 0:
                        if mins[0] == _NONE or t < mins[0]:
                            mins[0] = t
                    elif mins[s - 1] != _NONE and t > mins[s - 1]:
                        if (within_us is not None
                                and t > mins[0] + within_us):
                            continue
                        if mins[s] == _NONE or t < mins[s]:
                            mins[s] = t
            buf_ts, buf_type = keep_ts, keep_type
        wm_us = max(wm_us, new_wm_us)

        if not done and mins[k - 1] != _NONE:
            done = True
            buf_ts, buf_type = [], []  # match found — buffers reclaimed
            yield pd.DataFrame({
                "user_id": [key[0]],
                **{f"t{i + 1}": [pd.Timestamp(mins[i], unit="us")]
                   for i in range(k)}})

        state.update((mins, buf_ts, buf_type, wm_us, done))
        if buf_ts and not done:
            # wake when the watermark can finalize the earliest buffered
            # event (timeout must sit strictly above the watermark)
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))

    return fn


def _make_negated_funnel_fn(steps: list[str], negations: dict[int, str],
                            within_us: int | None):
    """The funnel fold extended with absence gaps — the streaming twin
    of ``sequences.negated_funnel_times``. Per negated gap i the state
    tracks ``negs[i]`` = earliest forbidden event strictly after
    mins[i] (the event-time-ordered fold makes the same convergence
    argument as batch: when a forbidden event at t folds, mins[i] is
    already final for every t > t_i). Violation is decided EXACTLY
    once per the monotone argument: with negs[i] set, a completion
    candidate for step i+1 either exists (compare directly) or can
    only arrive with ts > watermark ≥ negs[i] — later than the
    forbidden instant either way — so the key is dead and is marked
    done WITHOUT emitting (batch's NULLed t_{i+1})."""
    k = len(steps)
    neg_types = {i - 1: t for i, t in negations.items()}  # 0-based gap

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            mins, negs, buf_ts, buf_type, wm_us, done = state.get
            mins, negs = list(mins), list(negs)
            buf_ts, buf_type = list(buf_ts), list(buf_type)
        else:
            mins, negs, buf_ts, buf_type, wm_us, done = \
                [_NONE] * k, [_NONE] * k, [], [], _NONE, False

        if not state.hasTimedOut:
            for pdf in pdfs:
                if done:
                    break
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, typ in zip(ts_us, pdf["event_type"]):
                    if int(t) >= wm_us:  # boundary rule: see funnel fn
                        buf_ts.append(int(t))
                        buf_type.append(str(typ))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        if new_wm_us > wm_us and buf_ts and not done:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_type = [], []
            for i in order:
                t, typ = buf_ts[i], buf_type[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_type.append(typ)
                    continue
                for s in range(k):
                    if typ == steps[s]:
                        if s == 0:
                            if mins[0] == _NONE or t < mins[0]:
                                mins[0] = t
                        elif mins[s - 1] != _NONE and t > mins[s - 1]:
                            if (within_us is not None
                                    and t > mins[0] + within_us):
                                continue
                            if mins[s] == _NONE or t < mins[s]:
                                mins[s] = t
                for g, ntyp in neg_types.items():
                    if (typ == ntyp and mins[g] != _NONE
                            and t > mins[g]
                            and (negs[g] == _NONE or t < negs[g])):
                        negs[g] = t
            buf_ts, buf_type = keep_ts, keep_type
        wm_us = max(wm_us, new_wm_us)

        if not done:
            for g in neg_types:
                if negs[g] != _NONE and (mins[g + 1] == _NONE
                                         or negs[g] < mins[g + 1]):
                    # dead key: every (remaining) step-(g+1) candidate is
                    # after the forbidden instant — batch voids it too
                    done = True
                    buf_ts, buf_type = [], []
                    break

        if not done and mins[k - 1] != _NONE:
            done = True
            buf_ts, buf_type = [], []
            yield pd.DataFrame({
                "user_id": [key[0]],
                **{f"t{i + 1}": [pd.Timestamp(mins[i], unit="us")]
                   for i in range(k)}})

        state.update((mins, negs, buf_ts, buf_type, wm_us, done))
        if buf_ts and not done:
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))

    return fn


def negated_funnel_monitor(events: DataFrame, steps: list[str],
                           negations: dict[int, str],
                           watermark: str = "10 minutes",
                           within_seconds: int | None = None,
                           key_col: str = "user_id", ts_col: str = "ts",
                           type_col: str = "event_type") -> DataFrame:
    """Streaming CEP with absence steps (FlinkCEP ``notFollowedBy``):
    one append-mode row per key at its earliest completion of ``steps``
    where no ``negations[i]`` event lies strictly between t_i and
    t_{i+1}; a key whose pattern is voided by a forbidden event emits
    NOTHING and its state collapses to the done marker. Emissions ≡
    the batch ``negated_funnel_times`` rows with t_k non-NULL, under
    the family's watermark-bounded-disorder contract (pinned by
    test)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    for i in negations:
        if not (1 <= i < len(steps)):
            raise ValueError(
                f"negation gap {i} out of range (1..{len(steps) - 1})")
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    types = list(steps) + list(negations.values())
    filtered = (events.filter(F.col(type_col).isin(types))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_negated_funnel_fn(steps, negations, within_us),
                outputStructType=_funnel_out_schema(len(steps), key_type),
                stateStructType=_negated_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def _negated_state_schema() -> str:
    return ("mins array<bigint>, negs array<bigint>, "
            "buf_ts array<bigint>, buf_type array<string>, "
            "wm_us bigint, done boolean")


def funnel_monitor(events: DataFrame, steps: list[str],
                   watermark: str = "10 minutes",
                   within_seconds: int | None = None,
                   key_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type") -> DataFrame:
    """Streaming funnel completions: one append-mode row per key —
    (key, t1..tk) — at its earliest in-order completion of ``steps``,
    with out-of-order events buffered until the event-time watermark
    (disorder beyond the watermark delay is dropped). Semantics match
    the batch ``funnel_times`` completions under that lateness bound."""
    if not steps:
        raise ValueError("steps must be non-empty")
    within_us = None if within_seconds is None else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]  # output key mirrors the input
    filtered = (events.filter(F.col(type_col).isin(steps))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_funnel_fn(steps, within_us),
                outputStructType=_funnel_out_schema(len(steps), key_type),
                stateStructType=_funnel_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


# ------------------------------------------------ strict contiguity


def _strict_state_schema() -> str:
    return ("mins array<bigint>, bi int, "
            "tail_ts array<bigint>, tail_seq array<bigint>, "
            "tail_type array<string>, "
            "pend_blk int, pend_ts array<bigint>, "
            "buf_ts array<bigint>, buf_seq array<bigint>, "
            "buf_type array<string>, wm_us bigint, done boolean")


def _make_strict_funnel_fn(steps: list[str], blocks: list[tuple[int, int]],
                           not_next: dict[int, str],
                           within_us: int | None):
    """The strict-contiguity fold — the streaming twin of
    ``sequences.strict_funnel_times``. Events finalize in (ts, seq)
    order; the state keeps the last max-block-length finalized events
    (the adjacency window), the per-step matched timestamps, the index
    of the first unmatched block, and at most ONE pending
    notNext candidate (only an anchor whose block ends at the newest
    event is undecided — every earlier anchor was decided by the event
    after it). Why first-match is final: anchors are decided in end-
    event order, so the first committed block-b match has the minimum
    end ts — exactly the batch running-min convergence."""
    k = len(steps)
    max_l = max(e - a + 1 for a, e in blocks)
    nn = dict(not_next or {})

    def _feed(ev, mins, bi, tail, pend):
        """Advance the automaton by one finalized (ts, seq, type)."""
        ts, seq, typ = ev
        if pend[0] != _NONE:
            b = pend[0]
            a, e = blocks[b]
            if typ != nn[e]:
                for d, t in enumerate(pend[1]):
                    mins[a - 1 + d] = t
                bi = b + 1
            pend[0], pend[1] = _NONE, []
        if bi < len(blocks):
            tail.append(ev)
            if len(tail) > max_l:
                tail.pop(0)
            a, e = blocks[bi]
            ln = e - a + 1
            if len(tail) >= ln:
                cand = tail[-ln:]
                ok = all(cand[d][2] == steps[a - 1 + d]
                         for d in range(ln))
                if ok and bi > 0:
                    prev_e = mins[blocks[bi - 1][1] - 1]
                    ok = prev_e != _NONE and cand[0][0] > prev_e
                if ok and within_us is not None:
                    bound = cand[0][0] if bi == 0 else mins[0]
                    ok = cand[-1][0] <= bound + within_us
                if ok:
                    if e in nn:
                        pend[0] = bi
                        pend[1] = [c[0] for c in cand]
                    else:
                        for d in range(ln):
                            mins[a - 1 + d] = cand[d][0]
                        bi += 1
        return bi

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (mins, bi, tail_ts, tail_seq, tail_type, pend_blk, pend_ts,
             buf_ts, buf_seq, buf_type, wm_us, done) = state.get
            mins = list(mins)
            tail = list(zip(tail_ts, tail_seq, tail_type))
            pend = [pend_blk, list(pend_ts)]
            buf = list(zip(buf_ts, buf_seq, buf_type))
        else:
            mins, bi, tail, pend, buf, wm_us, done = \
                [_NONE] * k, 0, [], [_NONE, []], [], _NONE, False

        if not state.hasTimedOut:
            for pdf in pdfs:
                if done:
                    break
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, s, typ in zip(ts_us, pdf["event_id"],
                                     pdf["event_type"]):
                    if int(t) >= wm_us:  # boundary rule: see funnel fn
                        buf.append((int(t), int(s), str(typ)))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        if new_wm_us > wm_us and buf and not done:
            buf.sort()
            keep = []
            for ev in buf:
                # STRICTLY below the watermark — stricter than the
                # relaxed funnel's <= rule, deliberately: its "equal-ts
                # events never interact" safety argument fails for
                # POSITIONAL adjacency (a boundary-equal (ts, seq-4)
                # sibling of an already-finalized (ts, seq-5) event
                # would fold out of order and fabricate an adjacency);
                # holding everything at ts == wm keeps equal-ts
                # siblings together until a later advance
                if ev[0] >= new_wm_us:
                    keep.append(ev)
                elif bi < len(blocks) or pend[0] != _NONE:
                    bi = _feed(ev, mins, bi, tail, pend)
            buf = keep
        wm_us = max(wm_us, new_wm_us)

        if (state.hasTimedOut and not buf and pend[0] != _NONE
                and not done):
            # the watermark passed every buffered event and the pending
            # notNext anchor is still waiting for an immediately-
            # following event: resolve PASS — the bounded-disorder
            # reading of batch's "no next event passes" (an adjacent
            # successor, when one exists, arrives within the watermark
            # horizon of its predecessor)
            b = pend[0]
            a, e = blocks[b]
            for d, t in enumerate(pend[1]):
                mins[a - 1 + d] = t
            bi = b + 1
            pend = [_NONE, []]

        if not done and bi == len(blocks):
            done = True
            tail, buf, pend = [], [], [_NONE, []]
            yield pd.DataFrame({
                "user_id": [key[0]],
                **{f"t{i + 1}": [pd.Timestamp(mins[i], unit="us")]
                   for i in range(k)}})

        state.update((
            mins, bi,
            [e[0] for e in tail], [e[1] for e in tail],
            [e[2] for e in tail],
            pend[0], pend[1],
            [e[0] for e in buf], [e[1] for e in buf],
            [e[2] for e in buf], wm_us, done))
        if not done and (buf or pend[0] != _NONE):
            wake = min(e[0] for e in buf) // 1000 if buf else wm_ms
            state.setTimeoutTimestamp(max(wake, wm_ms + 1))

    return fn


def strict_funnel_monitor(events: DataFrame, steps: list[str],
                          contiguity: list[str] | None = None,
                          not_next: dict[int, str] | None = None,
                          watermark: str = "10 minutes",
                          within_seconds: int | None = None,
                          key_col: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type",
                          seq_col: str = "event_id") -> DataFrame:
    """Streaming strict-contiguity CEP (FlinkCEP ``next``/``notNext``):
    one append-mode row per key — (key, t1..tk) — at its earliest chain
    where each ``'next'`` gap is satisfied by the key's IMMEDIATELY
    following event. Adjacency is positional over the key's full event
    stream, so the stream is NOT type-pre-filtered (the batch twin's
    contract); events buffer until the watermark and finalize in
    (ts, seq) order. Emissions ≡ the batch ``strict_funnel_times`` rows
    with t_k non-NULL under two documented readings: per-key disorder
    within the watermark delay, and a trailing notNext anchor resolves
    PASS once the watermark passes its end with no successor buffered
    (batch's bounded-input "no next event passes")."""
    from flink_rag_spark.operators.sequences import _strict_blocks
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    contiguity = contiguity or ["followedBy"] * (k - 1)
    if len(contiguity) != k - 1:
        raise ValueError(f"contiguity needs {k - 1} gaps, "
                         f"got {len(contiguity)}")
    bad = [g for g in contiguity if g not in ("next", "followedBy")]
    if bad:
        raise ValueError(f"unknown contiguity values: {bad!r}")
    not_next = not_next or {}
    for i in not_next:
        if not (1 <= i <= k):
            raise ValueError(f"not_next step {i} out of range (1..{k})")
        if i < k and contiguity[i - 1] == "next":
            raise ValueError(
                f"not_next at step {i} conflicts with its 'next' gap")
    blocks = _strict_blocks(k, contiguity)
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    sel = events.select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(seq_col).alias("event_id"),
                        F.col(type_col).alias("event_type"))
    return (sel.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_strict_funnel_fn(steps, blocks, not_next,
                                       within_us),
                outputStructType=_funnel_out_schema(len(steps), key_type),
                stateStructType=_strict_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


# ------------------------- all-matches (noSkip) / consumed matches


def _all_matches_state_schema() -> str:
    return ("anch array<bigint>, buf_ts array<bigint>, "
            "buf_type array<string>, wm_us bigint")


def _consumed_state_schema() -> str:
    return ("anch array<bigint>, frontier bigint, n_matches int, "
            "buf_ts array<bigint>, buf_type array<string>, "
            "wm_us bigint, done boolean")


def _prog(ch: list[int]) -> int:
    """Progress of an open anchor chain = index of its first unfilled
    slot (open anchors always have one)."""
    return ch.index(_NONE)


def _advance_anchors(anch: list[list[int]], t: int, typ: str,
                     steps: list[str], within_us: int | None,
                     k: int) -> list[list[int]]:
    """Fold ONE finalized event into the open-anchor set in place:
    every anchor whose NEXT step matches ``typ`` strictly after its
    last matched instant advances greedily (the event-time-ordered fold
    makes this the batch backward-chain's greedy earliest
    continuation); an anchor whose greedy instant exceeds its within
    bound dies — by the t_k-minimality exchange argument its minimal
    completion would exceed the bound too, exactly batch's final t_k
    filter. Returns the chains this event COMPLETED (removed from
    ``anch``); anchor CREATION is the caller's job (a new anchor can
    never use its own event — strictly-after)."""
    completed: list[list[int]] = []
    keep: list[list[int]] = []
    for ch in anch:
        p = _prog(ch)
        if steps[p] == typ and t > ch[p - 1]:
            if within_us is not None and t > ch[0] + within_us:
                continue                      # dead: bound exceeded
            ch[p] = t
            if p + 1 == k:
                completed.append(ch)
                continue
        keep.append(ch)
    anch[:] = keep
    return completed


def _make_all_matches_fn(steps: list[str], within_us: int | None):
    """The noSkip fold — the streaming twin of
    ``sequences.all_funnel_matches``. State per key is the OPEN
    anchors' partial chains (k slots each) plus the event buffer; a
    step-1 event opens an anchor, each later finalized event advances
    every waiting anchor greedily, and an anchor emits (one row per
    completing anchor EVENT — FlinkCEP's per-event match identity) the
    moment its chain completes. With ``within`` the anchor set is
    watermark-bounded (an anchor dies once wm passes t1 + within);
    without it, open anchors persist exactly as FlinkCEP partial
    matches do without ``within()``."""
    k = len(steps)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            flat, buf_ts, buf_type, wm_us = state.get
            anch = [list(flat[i:i + k]) for i in range(0, len(flat), k)]
            buf_ts, buf_type = list(buf_ts), list(buf_type)
        else:
            anch, buf_ts, buf_type, wm_us = [], [], [], _NONE

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, typ in zip(ts_us, pdf["event_type"]):
                    if int(t) >= wm_us:  # boundary rule: see funnel fn
                        buf_ts.append(int(t))
                        buf_type.append(str(typ))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        done_rows: list[list[int]] = []
        if new_wm_us > wm_us and buf_ts:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_type = [], []
            for i in order:
                t, typ = buf_ts[i], buf_type[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_type.append(typ)
                    continue
                done_rows.extend(
                    _advance_anchors(anch, t, typ, steps, within_us, k))
                if typ == steps[0]:
                    if k == 1:
                        done_rows.append([t])
                    else:
                        anch.append([t] + [_NONE] * (k - 1))
            buf_ts, buf_type = keep_ts, keep_type
        wm_us = max(wm_us, new_wm_us)
        if within_us is not None:
            # reclaim dead anchors: every future qualifying instant is
            # >= wm, so an anchor whose bound fell below wm cannot
            # advance again
            anch = [ch for ch in anch if ch[0] + within_us >= wm_us]

        if done_rows:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(done_rows),
                **{f"t{i + 1}": [pd.Timestamp(ch[i], unit="us")
                                 for ch in done_rows]
                   for i in range(k)}})

        state.update(([v for ch in anch for v in ch],
                      buf_ts, buf_type, wm_us))
        if buf_ts:
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))
        elif within_us is not None and anch:
            # wake when the earliest anchor's bound expires so its
            # state reclaims even if the key never sees another event
            wake = (min(ch[0] for ch in anch) + within_us) // 1000
            state.setTimeoutTimestamp(max(wake, wm_ms + 1))

    return fn


def _make_consumed_fn(steps: list[str], within_us: int | None,
                      max_matches: int):
    """The skipPastLastEvent fold — the streaming twin of
    ``sequences.consumed_funnel_matches``: the all-matches anchor
    machinery plus a consumed-frontier timestamp per key. Anchors open
    only strictly after the frontier; at the first completion (anchors
    complete in t_k order, and among same-instant completions the
    lexicographically smallest chain is the earliest anchor's — chain
    monotonicity — exactly batch's min-(u1..uk) round pick) the match
    emits, the frontier jumps to its t_k, and EVERY open anchor dies
    (all have t1 < t_k ≤ frontier — batch's u1 > T round filter).
    ``max_matches`` caps emissions (the bounded-rounds contract); the
    key then collapses to a done marker."""
    k = len(steps)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (flat, frontier, n_matches, buf_ts, buf_type, wm_us,
             done) = state.get
            anch = [list(flat[i:i + k]) for i in range(0, len(flat), k)]
            buf_ts, buf_type = list(buf_ts), list(buf_type)
        else:
            anch, frontier, n_matches, buf_ts, buf_type, wm_us, done = \
                [], _NONE, 0, [], [], _NONE, False

        if not state.hasTimedOut:
            for pdf in pdfs:
                if done:
                    break
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, typ in zip(ts_us, pdf["event_type"]):
                    if int(t) >= wm_us:  # boundary rule: see funnel fn
                        buf_ts.append(int(t))
                        buf_type.append(str(typ))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        rows: list[tuple[list[int], int]] = []
        if new_wm_us > wm_us and buf_ts and not done:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_type = [], []
            for i in order:
                t, typ = buf_ts[i], buf_type[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_type.append(typ)
                    continue
                completed = _advance_anchors(anch, t, typ, steps,
                                             within_us, k)
                if typ == steps[0] and (frontier == _NONE
                                        or t > frontier):
                    if k == 1:
                        completed.append([t])
                    else:
                        anch.append([t] + [_NONE] * (k - 1))
                if completed:
                    best = min(completed)
                    n_matches += 1
                    rows.append((best, n_matches))
                    frontier = best[k - 1]
                    anch = []        # consumed: every open anchor dies
                    if n_matches >= max_matches:
                        done = True
                        keep_ts, keep_type = [], []
                        break
            buf_ts, buf_type = keep_ts, keep_type
        wm_us = max(wm_us, new_wm_us)
        if within_us is not None:
            anch = [ch for ch in anch if ch[0] + within_us >= wm_us]

        if rows:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(rows),
                **{f"t{i + 1}": [pd.Timestamp(ch[i], unit="us")
                                 for ch, _ in rows]
                   for i in range(k)},
                "match_idx": [m for _, m in rows]})

        state.update(([v for ch in anch for v in ch], frontier,
                      n_matches, buf_ts, buf_type, wm_us, done))
        if not done:
            if buf_ts:
                state.setTimeoutTimestamp(
                    max(min(buf_ts) // 1000, wm_ms + 1))
            elif within_us is not None and anch:
                wake = (min(ch[0] for ch in anch) + within_us) // 1000
                state.setTimeoutTimestamp(max(wake, wm_ms + 1))

    return fn


def _skip_to_state_schema() -> str:
    return ("anch array<bigint>, cand array<bigint>, frontier bigint, "
            "n_matches int, buf_ts array<bigint>, buf_type array<string>, "
            "wm_us bigint, done boolean")


def _make_skip_to_fn(steps: list[str], skip_idx: int,
                     within_us: int | None, max_matches: int):
    """The skipToFirst/skipToLast fold — the streaming twin of
    ``sequences.skip_to_funnel_matches`` over the flat (quantifier-
    expanded) steps. Beyond the consumed fold's frontier it keeps a
    RETAINED-CANDIDATE set: a match that completes but is not selected
    stays eligible while its anchor is at-or-after the frontier (the
    batch rounds may pick it later — non-strict re-anchor is the
    FlinkCEP survivor rule), where skipPastLastEvent's strict rule
    kills every same-instant sibling. Selection still happens at each
    completion event: chain monotonicity (earlier anchor ⇒ componentwise
    ≤ chain) means no FUTURE completion can beat the present candidates
    on (u1..uK) order, so picking min(retained ∪ new) replays the batch
    round exactly. Candidate/anchor state is watermark-bounded under
    ``within`` (the all-matches contract); max_matches collapses the
    key to a done marker."""
    k = len(steps)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (aflat, cflat, frontier, n_matches, buf_ts, buf_type,
             wm_us, done) = state.get
            anch = [list(aflat[i:i + k]) for i in range(0, len(aflat), k)]
            cand = [list(cflat[i:i + k]) for i in range(0, len(cflat), k)]
            buf_ts, buf_type = list(buf_ts), list(buf_type)
        else:
            anch, cand, frontier, n_matches = [], [], _NONE, 0
            buf_ts, buf_type, wm_us, done = [], [], _NONE, False

        if not state.hasTimedOut:
            for pdf in pdfs:
                if done:
                    break
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, typ in zip(ts_us, pdf["event_type"]):
                    if int(t) >= wm_us:  # boundary rule: see funnel fn
                        buf_ts.append(int(t))
                        buf_type.append(str(typ))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        rows: list[tuple[list[int], int]] = []

        def _drain():
            """Select every currently-selectable candidate, batch-round
            order. Safe at ANY point: chain monotonicity guarantees no
            still-open anchor (nor future completion) can beat a
            present candidate on (u1..uK) order — an earlier-anchored
            chain would already have completed."""
            nonlocal cand, anch, frontier, n_matches, done
            while cand and not done:
                best = min(cand)
                n_matches += 1
                rows.append((best, n_matches))
                frontier = best[skip_idx - 1]
                # non-strict survivor rule: candidates and partial runs
                # anchored AT the skip instant or later live on
                cand = [c for c in cand
                        if c != best and c[0] >= frontier]
                anch = [ch for ch in anch if ch[0] >= frontier]
                if n_matches >= max_matches:
                    done = True
                    cand = []

        if new_wm_us > wm_us and buf_ts and not done:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_type = [], []
            for i in order:
                t, typ = buf_ts[i], buf_type[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_type.append(typ)
                    continue
                cand.extend(_advance_anchors(anch, t, typ, steps,
                                             within_us, k))
                if typ == steps[0] and (frontier == _NONE
                                        or t >= frontier):
                    if k == 1:
                        cand.append([t])
                    else:
                        anch.append([t] + [_NONE] * (k - 1))
                # drain per event so frontier is current for the NEXT
                # event's anchor-creation decision
                _drain()
                if done:
                    keep_ts, keep_type = [], []
                    break
            buf_ts, buf_type = keep_ts, keep_type
        # timeout / empty-batch path: retained candidates stay
        # selectable without any new event (batch rounds don't wait)
        if not done:
            _drain()
            if done:
                buf_ts, buf_type = [], []
        wm_us = max(wm_us, new_wm_us)
        if within_us is not None:
            anch = [ch for ch in anch if ch[0] + within_us >= wm_us]

        if rows:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(rows),
                **{f"t{i + 1}": [pd.Timestamp(ch[i], unit="us")
                                 for ch, _ in rows]
                   for i in range(k)},
                "match_idx": [m for _, m in rows]})

        state.update(([v for ch in anch for v in ch],
                      [v for ch in cand for v in ch], frontier,
                      n_matches, buf_ts, buf_type, wm_us, done))
        if not done:
            if buf_ts:
                state.setTimeoutTimestamp(
                    max(min(buf_ts) // 1000, wm_ms + 1))
            elif within_us is not None and anch:
                wake = (min(ch[0] for ch in anch) + within_us) // 1000
                state.setTimeoutTimestamp(max(wake, wm_ms + 1))

    return fn


def skip_to_matches_monitor(events: DataFrame, steps: list,
                            skip_step: int, max_matches: int,
                            position: str = "first",
                            watermark: str = "10 minutes",
                            within_seconds: int | None = None,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type") -> DataFrame:
    """Streaming ``skipToFirst(p)`` / ``skipToLast(p)`` — completes the
    AfterMatchSkipStrategy enum ON STREAMS beside
    :func:`all_matches_monitor` (noSkip) and
    :func:`consumed_matches_monitor` (skipPastLastEvent): append-mode
    rows (key, t1..tk, match_idx) where after each selected match the
    next may re-anchor AT the named step's matched event or later.
    ``steps`` accepts the batch twin's quantified ``(step, n)``
    entries; output collapses to one t per ORIGINAL step (the
    quantified family's convention). Emissions ≡ the batch
    ``skip_to_funnel_matches`` rows under the family's
    watermark-bounded-disorder contract (pinned by test); the
    never-advancing configuration raises exactly like the batch
    twin."""
    from flink_rag_spark.operators.sequences import _skip_phys_index
    if not steps:
        raise ValueError("steps must be non-empty")
    if max_matches < 1:
        raise ValueError(f"max_matches must be >= 1, got {max_matches}")
    flat, last, skip_idx = _skip_phys_index(steps, skip_step, position)
    bad = [s for s in flat if not isinstance(s, str)]
    if bad:
        raise TypeError("skip_to_matches_monitor needs string steps; "
                        f"got: {bad!r}")
    K = len(flat)
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    out_schema = (_funnel_out_schema(K, key_type) + ", match_idx int")
    filtered = (events.filter(F.col(type_col).isin(flat))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    inner = (filtered.withWatermark("ts", watermark)
             .groupBy("user_id")
             .applyInPandasWithState(
                 _make_skip_to_fn(flat, skip_idx, within_us, max_matches),
                 outputStructType=out_schema,
                 stateStructType=_skip_to_state_schema(),
                 outputMode="append",
                 timeoutConf=GroupStateTimeout.EventTimeTimeout))
    return inner.select(
        "user_id", *[F.col(f"t{li}").alias(f"t{j}")
                     for j, li in enumerate(last, start=1)],
        "match_idx")


def all_matches_monitor(events: DataFrame, steps: list[str],
                        watermark: str = "10 minutes",
                        within_seconds: int | None = None,
                        key_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type") -> DataFrame:
    """Streaming all-matches CEP (FlinkCEP
    ``AfterMatchSkipStrategy.noSkip()``, the engine default): one
    append-mode row per COMPLETING STEP-1 ANCHOR EVENT — (key,
    t1..tk), each anchor with its greedy earliest continuation — where
    :func:`funnel_monitor` emits only each key's earliest completion.
    Emissions ≡ the batch ``all_funnel_matches`` rows under the
    family's watermark-bounded-disorder contract (pinned by test).

    State per key: the OPEN anchors' partial chains (k BIGINTs each)
    plus the watermark-bounded event buffer. ``within_seconds`` bounds
    the anchor set too (an anchor is reclaimed once the watermark
    passes t1 + within); without it open anchors persist — FlinkCEP
    partial matches without ``within()`` behave identically, which is
    why production noSkip jobs run with a ``within`` horizon."""
    if not steps:
        raise ValueError("steps must be non-empty")
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    filtered = (events.filter(F.col(type_col).isin(steps))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_all_matches_fn(steps, within_us),
                outputStructType=_funnel_out_schema(len(steps), key_type),
                stateStructType=_all_matches_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def consumed_matches_monitor(events: DataFrame, steps: list[str],
                             max_matches: int,
                             watermark: str = "10 minutes",
                             within_seconds: int | None = None,
                             key_col: str = "user_id", ts_col: str = "ts",
                             type_col: str = "event_type") -> DataFrame:
    """Streaming non-overlapping CEP (FlinkCEP
    ``AfterMatchSkipStrategy.skipPastLastEvent()``): append-mode rows
    (key, t1..tk, match_idx) — greedy leftmost matches where each
    match CONSUMES its events and the next must anchor strictly after
    the previous match's t_k; at most ``max_matches`` per key (the
    batch twin's bounded-rounds contract — the key then collapses to a
    done marker). Emissions ≡ the batch ``consumed_funnel_matches``
    rows under the family's watermark-bounded-disorder contract
    (pinned by test). State adds one consumed-frontier timestamp and a
    match counter to the all-matches anchor machinery; consumption
    CLEARS the anchor set, so state stays small even without
    ``within``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if max_matches < 1:
        raise ValueError(f"max_matches must be >= 1, got {max_matches}")
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    out_schema = (_funnel_out_schema(len(steps), key_type)
                  + ", match_idx int")
    filtered = (events.filter(F.col(type_col).isin(steps))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_consumed_fn(steps, within_us, max_matches),
                outputStructType=out_schema,
                stateStructType=_consumed_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def until_funnel_monitor(events: DataFrame, steps: list,
                         until: dict[int, str],
                         watermark: str = "10 minutes",
                         within_seconds: int | None = None,
                         key_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type") -> DataFrame:
    """Streaming FlinkCEP ``until`` — the same composition as the batch
    twin (``sequences.until_funnel_times``): the quantifier expansion
    feeds the negated-funnel monitor with one absence gap per internal
    loop repetition, then the emitted flat completions collapse to one
    t per ORIGINAL step. Voided loops emit nothing (the negation
    monitor's dead-key discipline); emissions ≡ the batch rows with
    t_k non-NULL under the family's watermark-bounded-disorder
    contract (pinned by test).

    Schema note: the batch twin additionally emits ``c{j}`` stop-instant
    AUDIT columns (earliest stop seen inside step j's loop window);
    the streaming monitor deliberately OMITS them — the underlying
    negated monitor tracks absence as a boolean void decision, never
    materializing the stop instants, and a voided key emits nothing at
    all (there is no row to carry a rejection audit on). Callers
    porting batch code that reads ``c{j}`` must recompute it batch-side
    over the matched keys."""
    from flink_rag_spark.operators.sequences import _until_desugar
    if not until:
        raise ValueError("until must be non-empty — use funnel_monitor "
                         "without a stop condition")
    flat, negations, last = _until_desugar(steps, until)
    inner = negated_funnel_monitor(events, flat, negations, watermark,
                                   within_seconds, key_col, ts_col,
                                   type_col)
    return inner.select(
        "user_id", *[F.col(f"t{li}").alias(f"t{j}")
                     for j, li in enumerate(last, start=1)])


# ------------------------------------------------ optional() steps


def _optional_state_schema() -> str:
    return ("mins array<bigint>, buf_ts array<bigint>, "
            "buf_type array<string>, wm_us bigint, done boolean")


def _make_optional_fn(steps: list[str],
                      layers: list[tuple[tuple[int, ...], list[int]]],
                      within_us: int | None,
                      out_map: list[int] | None = None):
    """applyInPandasWithState body for the optional() monitor: one flat
    ``mins`` array holding every layer's running chain back-to-back
    (offsets captured in the closure), folded exactly like the plain
    funnel per layer. Emission: the first fold after which ANY layer's
    final min is set — every event at or before that instant is already
    watermark-final (mins only fold finalized events), so no layer can
    later complete earlier, and the batch twin's earliest-final /
    most-inclusive pick is decidable immediately.

    ``out_map`` lists the flat step indices to EMIT as t1..tE (default
    every step) — the group monitor passes each original entry's final
    flat index, the batch ``group_funnel_times`` collapse."""
    k = len(steps)
    emit = out_map or list(range(1, k + 1))
    sizes = [len(inc) for _b, inc in layers]
    offs = [sum(sizes[:i]) for i in range(len(sizes))]
    total = sum(sizes)
    # per layer, per position: the ORIGINAL step index it matches
    layer_steps = [[j - 1 for j in inc] for _b, inc in layers]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            mins, buf_ts, buf_type, wm_us, done = state.get
            mins, buf_ts, buf_type = list(mins), list(buf_ts), list(buf_type)
        else:
            mins, buf_ts, buf_type, wm_us, done = \
                [_NONE] * total, [], [], _NONE, False

        if not state.hasTimedOut:
            for pdf in pdfs:
                if done:
                    break
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, typ in zip(ts_us, pdf["event_type"]):
                    if int(t) >= wm_us:
                        buf_ts.append(int(t))
                        buf_type.append(str(typ))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        if new_wm_us > wm_us and buf_ts and not done:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_type = [], []
            for i in order:
                t, typ = buf_ts[i], buf_type[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_type.append(typ)
                    continue
                for li in range(len(layers)):
                    o = offs[li]
                    for pos, sj in enumerate(layer_steps[li]):
                        if typ != steps[sj]:
                            continue
                        if pos == 0:
                            if mins[o] == _NONE or t < mins[o]:
                                mins[o] = t
                        elif (mins[o + pos - 1] != _NONE
                              and t > mins[o + pos - 1]):
                            if (within_us is not None
                                    and t > mins[o] + within_us):
                                continue
                            if mins[o + pos] == _NONE \
                                    or t < mins[o + pos]:
                                mins[o + pos] = t
            buf_ts, buf_type = keep_ts, keep_type
        wm_us = max(wm_us, new_wm_us)

        finals = [mins[offs[li] + sizes[li] - 1]
                  for li in range(len(layers))]
        if not done and any(f != _NONE for f in finals):
            done = True
            buf_ts, buf_type = [], []
            best = min(f for f in finals if f != _NONE)
            # layers arrive in the batch twin's preference order, so
            # the first layer hitting `best` IS the pick
            pick = next(li for li, f in enumerate(finals) if f == best)
            _b, inc = layers[pick]
            o = offs[pick]
            row = {"user_id": [key[0]]}
            for e, j in enumerate(emit, start=1):
                if j in inc:
                    v = mins[o + inc.index(j)]
                    row[f"t{e}"] = [pd.Timestamp(v, unit="us")]
                else:
                    row[f"t{e}"] = [pd.NaT]
            yield pd.DataFrame(row)

        state.update((mins, buf_ts, buf_type, wm_us, done))
        if buf_ts and not done:
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))

    return fn


def optional_funnel_monitor(events: DataFrame, steps: list[str],
                            optional: list[int],
                            watermark: str = "10 minutes",
                            within_seconds: int | None = None,
                            key_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type") -> DataFrame:
    """Streaming FlinkCEP ``optional()`` — the batch
    ``sequences.optional_funnel_times`` twin: every include/exclude
    variant of the optional set folds as its own running chain inside
    ONE stateful operator, and a key emits once, at the earliest
    instant ANY variant completes, reporting the earliest-final /
    most-inclusive variant's per-step instants (skipped steps NULL).
    Emissions ≡ the batch rows with t_final non-NULL under the family's
    watermark-bounded-disorder contract (pinned by test)."""
    from flink_rag_spark.operators.sequences import _optional_layers
    if not steps:
        raise ValueError("steps must be non-empty")
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError("optional_funnel_monitor takes string steps; "
                        f"got: {bad!r}")
    layers = _optional_layers(len(steps), optional)
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    filtered = (events.filter(F.col(type_col).isin(list(steps)))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_optional_fn(steps, layers, within_us),
                outputStructType=_funnel_out_schema(len(steps), key_type),
                stateStructType=_optional_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def group_funnel_monitor(events: DataFrame, entries: list,
                         watermark: str = "10 minutes",
                         within_seconds: int | None = None,
                         key_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type") -> DataFrame:
    """Streaming FlinkCEP pattern GROUPS — the batch
    ``sequences.group_funnel_times`` twin: the group desugaring
    (``times(n)`` unrolled flat, optional groups as unit-toggled
    layers) feeds the optional monitor's layered fold, emitting one t
    per ORIGINAL entry (the quantified collapse) at the earliest
    instant any variant completes. Emissions ≡ the batch rows with the
    picked variant complete, under the family's watermark-bounded
    disorder contract (pinned by test)."""
    from flink_rag_spark.operators.sequences import (_optional_layers,
                                                     expand_group_entries)
    flat, last, units = expand_group_entries(entries)
    bad = [s for s in flat if not isinstance(s, str)]
    if bad:
        raise TypeError("group_funnel_monitor takes string steps; "
                        f"got: {bad!r}")
    if units:
        layers = _optional_layers(len(flat), units)
    else:
        layers = [((), list(range(1, len(flat) + 1)))]
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    filtered = (events.filter(F.col(type_col).isin(list(set(flat))))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_optional_fn(flat, layers, within_us,
                                  out_map=list(last)),
                outputStructType=_funnel_out_schema(len(last), key_type),
                stateStructType=_optional_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


# ------------------------------------------------ greedy() loops


def _greedy_state_schema() -> str:
    return ("mins array<bigint>, loop_ts array<bigint>, "
            "bend bigint, cnt bigint, buf_ts array<bigint>, "
            "buf_type array<string>, wm_us bigint, done boolean")


def _make_greedy_fn(steps: list[str], greedy: int, n: int,
                    within_us: int | None):
    """applyInPandasWithState body for the greedy-loop monitor: the
    flat reluctant chain folds like the plain funnel (mins set once —
    events arrive in finalized event-time order), while loop-step
    events strictly after the prefix completion accumulate as
    absorption candidates until the first suffix instant settles; at
    that point the run freezes (candidates at or past the suffix
    instant are the follower's, matching the batch ``ts < s1`` strict
    bound) and the candidate list drops from state. State is the
    chain mins + the open run — bounded by the absorbed run length,
    the same events FlinkCEP's greedy NFA state holds."""
    k, g = len(steps), greedy
    flat = list(steps[:g - 1]) + [steps[g - 1]] * n + list(steps[g:])
    m = len(flat)
    loop_step = steps[g - 1]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (mins, loop_ts, bend, cnt, buf_ts, buf_type,
             wm_us, done) = state.get
            mins, loop_ts = list(mins), list(loop_ts)
            buf_ts, buf_type = list(buf_ts), list(buf_type)
        else:
            mins, loop_ts, bend, cnt = [_NONE] * m, [], _NONE, _NONE
            buf_ts, buf_type, wm_us, done = [], [], _NONE, False

        if not state.hasTimedOut:
            for pdf in pdfs:
                if done:
                    break
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, typ in zip(ts_us, pdf["event_type"]):
                    if int(t) >= wm_us:
                        buf_ts.append(int(t))
                        buf_type.append(str(typ))

        wm_ms = state.getCurrentWatermarkMs()
        new_wm_us = wm_ms * 1000
        if new_wm_us > wm_us and buf_ts and not done:
            order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
            keep_ts, keep_type = [], []
            for i in order:
                t, typ = buf_ts[i], buf_type[i]
                if t > new_wm_us:
                    keep_ts.append(t)
                    keep_type.append(typ)
                    continue
                # absorption candidates: loop events strictly after the
                # prefix completion, while the first suffix instant is
                # still open (in-order fold: anything folded before the
                # suffix instant settles is strictly before it or ties)
                if (typ == loop_step and mins[g + n - 1] == _NONE
                        and (g == 1 or (mins[g - 2] != _NONE
                                        and t > mins[g - 2]))):
                    loop_ts.append(t)
                # the reluctant chain fold (mins set once, in order)
                for i2 in range(m):
                    if typ != flat[i2]:
                        continue
                    if i2 == 0:
                        if mins[0] == _NONE or t < mins[0]:
                            mins[0] = t
                    elif mins[i2 - 1] != _NONE and t > mins[i2 - 1]:
                        if (within_us is not None
                                and t > mins[0] + within_us):
                            continue
                        if mins[i2] == _NONE or t < mins[i2]:
                            mins[i2] = t
                # first suffix instant just settled -> freeze the run
                if mins[g + n - 1] != _NONE and bend == _NONE:
                    s1 = mins[g + n - 1]
                    run = [x for x in loop_ts if x < s1]
                    if run:
                        bend, cnt = max(run), len(run)
                    loop_ts = []
            buf_ts, buf_type = keep_ts, keep_type
        wm_us = max(wm_us, new_wm_us)

        if not done and mins[m - 1] != _NONE:
            done = True
            buf_ts, buf_type, loop_ts = [], [], []
            row = {"user_id": [key[0]]}
            for j in range(1, k + 1):
                if j < g:
                    v = mins[j - 1]
                elif j == g:
                    v = bend
                else:
                    v = mins[j + n - 2]
                row[f"t{j}"] = [pd.Timestamp(v, unit="us")
                                if v != _NONE else pd.NaT]
            row["absorbed"] = [cnt if bend != _NONE else None]
            yield pd.DataFrame(row)

        state.update((mins, loop_ts, bend, cnt, buf_ts, buf_type,
                      wm_us, done))
        if buf_ts and not done:
            state.setTimeoutTimestamp(max(min(buf_ts) // 1000, wm_ms + 1))

    return fn


def greedy_funnel_monitor(events: DataFrame, steps: list[str],
                          greedy: int, n: int = 1,
                          watermark: str = "10 minutes",
                          within_seconds: int | None = None,
                          key_col: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type") -> DataFrame:
    """Streaming FlinkCEP ``greedy()`` loops — the batch
    ``sequences.greedy_funnel_times`` twin: the reluctant chain folds
    per key inside one stateful operator, loop events accumulate as
    absorption candidates until the first suffix instant settles, and
    a key emits once at full completion, reporting (key, t1..tk,
    absorbed) with t_greedy the run's LAST absorbed repetition.
    Emissions ≡ the batch rows with t_k non-NULL under the family's
    watermark-bounded-disorder contract (pinned by test)."""
    from flink_rag_spark.operators.sequences import _greedy_validate
    bad = [s for s in steps if not isinstance(s, str)]
    if bad:
        raise TypeError("greedy_funnel_monitor takes string steps; "
                        f"got: {bad!r}")
    _greedy_validate(steps, greedy, n)
    within_us = None if within_seconds is None \
        else within_seconds * 1_000_000
    key_type = dict(events.dtypes)[key_col]
    filtered = (events.filter(F.col(type_col).isin(list(steps)))
                .select(F.col(key_col).alias("user_id"),
                        F.col(ts_col).alias("ts"),
                        F.col(type_col).alias("event_type")))
    out_schema = (_funnel_out_schema(len(steps), key_type)
                  + ", absorbed bigint")
    return (filtered.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_greedy_fn(steps, greedy, n, within_us),
                outputStructType=out_schema,
                stateStructType=_greedy_state_schema(),
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
