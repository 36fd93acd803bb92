"""windowFunnel ``strict_order`` mode (VERDICT r10 item 5).

The SQL fold in ``queries/ch_compat.py::_funnel_expr`` now covers
CH's strict_order scan: non-matching events are materialized (they
interrupt a started chain) and a termination slot mirrors the scan
loop's ``break`` / early return.  Reference semantics are the public
ClickHouse scan (AggregateFunctionWindowFunnel.h::getEventLevel,
documented in the windowFunnel docs: "Don't allow interleaving
events — A→B→D→C stops finding A→B→C at the D, max level 2").

``_ch_reference_level`` below transcribes that documented loop in
Python and serves as the oracle for a randomized comparison — every
(events, window, modes) draw must agree exactly.
"""

from __future__ import annotations

import random

import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)


def _ch_reference_level(
    entries: list[tuple[int, int]],  # (timestamp, cond_idx 1-based; 0 = no match)
    n_conds: int,
    window: int,
    strict_order: bool = False,
    strict_increase: bool = False,
) -> int:
    """The public CH scan loop (getEventLevel), transcribed.

    ``entries`` must already be expanded one-per-matched-condition
    and sorted by (timestamp, cond_idx) — the fold's deterministic
    tie order, inside CH's insertion-order tie envelope.
    """
    slots: list[tuple[int, int] | None] = [None] * n_conds
    first_event = False
    for ts, idx in entries:
        event_idx = idx - 1
        if strict_order and event_idx == -1:
            if first_event:
                break
            continue
        if event_idx == 0:
            slots[0] = (ts, ts)
            first_event = True
        elif slots[event_idx - 1] is not None:
            anchor, prev_own = slots[event_idx - 1]
            time_matched = ts <= anchor + window
            if time_matched and strict_increase:
                time_matched = prev_own < ts
            if time_matched:
                slots[event_idx] = (anchor, ts)
                if event_idx + 1 == n_conds:
                    return n_conds
        elif strict_order and first_event:
            break
    for lvl, s in enumerate(slots):
        if s is None:
            return lvl
    return n_conds


def _run_fold(spark, rows, window, modes):
    spark.createDataFrame(rows, "user_id int, ts int, ev string"
                          ).createOrReplaceTempView("fo_ev")
    mode_sql = "".join(f", '{m}'" for m in modes)
    out = run_ch_sql(
        spark,
        f"SELECT user_id, windowFunnel({window}{mode_sql})("
        "toDateTime(ts), ev = 'A', ev = 'B', ev = 'C') AS lvl"
        " FROM fo_ev GROUP BY user_id ORDER BY user_id",
    )
    return {r.user_id: r.lvl for r in out.collect()}


def _expand(rows_one_user, window, modes):
    entries = []
    for ts, ev in rows_one_user:
        matched = False
        for i, name in enumerate(("A", "B", "C")):
            if ev == name:
                entries.append((ts, i + 1))
                matched = True
        if not matched and "strict_order" in modes:
            entries.append((ts, 0))
    entries.sort()
    return _ch_reference_level(
        entries, 3, window,
        strict_order="strict_order" in modes,
        strict_increase="strict_increase" in modes)


def test_strict_order_docs_example(spark):
    # the CH docs example: A -> B -> D -> C stops at D, level 2
    rows = [(1, 10, "A"), (1, 20, "B"), (1, 30, "D"), (1, 40, "C"),
            # control user without the interloper reaches 3
            (2, 10, "A"), (2, 20, "B"), (2, 40, "C")]
    got = _run_fold(spark, rows, 100, ["strict_order"])
    assert got == {1: 2, 2: 3}
    # default mode ignores D entirely
    got = _run_fold(spark, rows, 100, [])
    assert got == {1: 3, 2: 3}


def test_strict_order_edge_rules(spark):
    # a non-match BEFORE the chain starts does not interrupt
    got = _run_fold(spark, [(1, 5, "X"), (1, 10, "A"), (1, 20, "B")],
                    100, ["strict_order"])
    assert got == {1: 2}
    # an out-of-order chain event (C while B's slot is empty) breaks
    got = _run_fold(spark, [(1, 10, "A"), (1, 20, "C"), (1, 30, "B"),
                            (1, 40, "C")], 100, ["strict_order"])
    assert got == {1: 1}
    # a second A resets slot 1's anchor but does NOT interrupt
    got = _run_fold(spark, [(1, 10, "A"), (1, 15, "A"), (1, 20, "B"),
                            (1, 30, "C")], 100, ["strict_order"])
    assert got == {1: 3}
    # zero-level user: events but no A
    got = _run_fold(spark, [(1, 10, "B"), (1, 20, "C")],
                    100, ["strict_order"])
    assert got == {1: 0}
    # combined with strict_increase: equal timestamps break the climb
    got = _run_fold(spark, [(1, 10, "A"), (1, 10, "B"), (1, 20, "C")],
                    100, ["strict_order", "strict_increase"])
    assert got == {1: 1}


def test_strict_order_randomized_vs_reference(spark):
    rng = random.Random(0xC11)
    rows, want = [], {}
    for user in range(60):
        n = rng.randint(1, 12)
        evs = [(rng.randint(1, 40),
                rng.choice("AABBCCXY"))  # X/Y: non-matching events
               for _ in range(n)]
        # unique timestamps per user keep the comparison outside the
        # equal-timestamp tie envelope (CH's own order is insertion-
        # dependent there; the fold's (t, i) order is one valid pick)
        seen, uniq = set(), []
        for ts, e in evs:
            while ts in seen:
                ts += 1
            seen.add(ts)
            uniq.append((ts, e))
        window = rng.choice([5, 10, 100])
        modes = rng.choice([["strict_order"],
                            ["strict_order", "strict_increase"]])
        rows += [(user, ts, e) for ts, e in uniq]
        want[user] = (_expand(uniq, window, modes), window,
                      tuple(modes))
    # group the users by (window, modes) draw so each batch is one
    # aggregate call
    from collections import defaultdict

    batches = defaultdict(list)
    for user, (lvl, window, modes) in want.items():
        batches[(window, modes)].append(user)
    by_user = defaultdict(list)
    for u, ts, e in rows:
        by_user[u].append((u, ts, e))
    for (window, modes), users in batches.items():
        batch_rows = [r for u in users for r in by_user[u]]
        got = _run_fold(spark, batch_rows, window, list(modes))
        exp = {u: want[u][0] for u in users}
        assert got == exp, (window, modes)


def test_strict_dedup_supported_since_r14_unknown_mode_raises():
    # strict_deduplication is EXACT since r14 (tests/
    # test_r14_funnel_dedup.py); an unknown mode keeps the named raise
    translate_ch_sql(
        "SELECT windowFunnel(10, 'strict_deduplication')("
        "toDateTime(ts), a = 1, a = 2) FROM t")
    with pytest.raises(UnsupportedChSql, match="no_such_mode"):
        translate_ch_sql(
            "SELECT windowFunnel(10, 'no_such_mode')("
            "toDateTime(ts), a = 1, a = 2) FROM t")
    # the combined strict_order + strict_deduplication raise
    with pytest.raises(UnsupportedChSql, match="combined"):
        translate_ch_sql(
            "SELECT windowFunnel(10, 'strict_order', "
            "'strict_deduplication')(toDateTime(ts), a = 1, a = 2) FROM t")
