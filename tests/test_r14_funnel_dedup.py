"""windowFunnel 'strict_deduplication' mode (r14 — completes the
funnel-mode family; AggregateFunctionWindowFunnel.h).

CH semantics: scanning sorted (t, cond-idx) entries, the moment a
condition whose slot is ALREADY filled matches again, the function
early-returns the REPEAT's 1-based index (which can be LOWER than the
level reached so far).  c₁ repeats never trigger (its branch precedes
the check); completing the top level first ends the scan first, so a
later repeat cannot rewrite the answer.  strict_order +
strict_deduplication combined raises by name.
"""

from __future__ import annotations

import random

import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)


def _lvl(spark, rows, n, w, modes=", 'strict_deduplication'"):
    vals = ", ".join(f"({t}, {c})" for t, c in rows)
    spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(t, c)"
    ).createOrReplaceTempView("wfd")
    conds = ", ".join(f"c = {j}" for j in range(1, n + 1))
    return run_ch_sql(
        spark,
        f"SELECT windowFunnel({w}{modes})(t, {conds}) AS lvl FROM wfd",
    ).collect()[0].lvl


def test_repeat_returns_repeated_index(spark):
    # n=4: chain reaches 3, then c2 repeats BEFORE c4 could fill ->
    # answer is the repeat's index 2, LOWER than the level reached
    assert _lvl(spark, [(1, 1), (2, 2), (3, 3), (4, 2)], 4, 10) == 2
    # without the mode, the repeat is harmless -> 3
    assert _lvl(spark, [(1, 1), (2, 2), (3, 3), (4, 2)], 4, 10, "") == 3
    # repeat before any completion (n=3): c2 repeats at t=3 -> 2
    assert _lvl(spark, [(1, 1), (2, 2), (3, 2), (4, 3)], 3, 10) == 2


def test_c1_repeats_never_trigger(spark):
    assert _lvl(spark, [(1, 1), (2, 1), (3, 2)], 3, 10) == 2


def test_completion_freezes_before_later_repeat(spark):
    # the top level (n=3) fills at t=3, ENDING the scan — the c2
    # repeat at t=4 never processes (CH returns n at completion)
    assert _lvl(spark, [(1, 1), (2, 2), (3, 3), (4, 2)], 3, 10) == 3
    # repeat at t=3 fires before level 3 could fill -> 2
    assert _lvl(spark, [(1, 1), (2, 2), (3, 2)], 3, 10) == 2
    # n=2: completion at t=2 ends the scan before the t=5 repeat
    assert _lvl(spark, [(1, 1), (2, 2), (5, 2)], 2, 10) == 2


def test_repeat_without_chain_progress(spark):
    # two c2 events but slot 2 never fills (no c1 anchor) -> no
    # trigger, level 0
    assert _lvl(spark, [(1, 2), (2, 2)], 3, 10) == 0


def test_combined_with_strict_increase(spark):
    # equal timestamps: strict_increase blocks the c2 at t=1, the
    # later c2 at t=2 fills slot 2, the c2 at t=3 repeats -> 2
    assert _lvl(
        spark, [(1, 1), (1, 2), (2, 2), (3, 2)], 3, 10,
        ", 'strict_deduplication', 'strict_increase'") == 2


def test_strict_order_combo_raises():
    with pytest.raises(UnsupportedChSql, match="strict_order"):
        translate_ch_sql(
            "SELECT windowFunnel(5, 'strict_order',"
            " 'strict_deduplication')(t, c = 1, c = 2) FROM x GROUP BY g")


def _ch_ref(events, n, w, strict_increase=False):
    """Python transcription of the CH scan (default branch order,
    strict_deduplication on), over (t, idx) entries sorted by (t, idx)."""
    if not events:
        return 0
    if n == 1:
        return 1
    slots = [None] * n
    for t, j in events:
        idx = j - 1
        if idx == 0:
            slots[0] = (t, t)
        elif slots[idx] is not None:
            return j
        elif slots[idx - 1] is not None:
            first, own = slots[idx - 1]
            ok = t <= first + w
            if ok and strict_increase:
                ok = own < t
            if ok:
                slots[idx] = (first, t)
                if idx + 1 == n:
                    return n
    for k in range(n, 0, -1):
        if slots[k - 1] is not None:
            return k
    return 0


def test_randomized_vs_reference_simulation(spark):
    rng = random.Random(1443)
    for trial in range(8):
        n = rng.randint(2, 4)
        w = rng.randint(2, 8)
        si = rng.random() < 0.4
        rows = []
        for g in range(4):
            for _ in range(rng.randint(0, 14)):
                rows.append((g, rng.randint(0, 20), rng.randint(1, n)))
        if not rows:
            continue
        vals = ", ".join(f"({g}, {t}, {c})" for g, t, c in rows)
        spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(g, t, c)"
        ).createOrReplaceTempView("wfd_rand")
        conds = ", ".join(f"c = {j}" for j in range(1, n + 1))
        mode = ", 'strict_deduplication'" + (
            ", 'strict_increase'" if si else "")
        got = dict(
            (r.g, r.lvl)
            for r in run_ch_sql(spark, (
                f"SELECT g, windowFunnel({w}{mode})(t, {conds}) AS lvl"
                " FROM wfd_rand GROUP BY g")).collect())
        for g in range(4):
            evs = sorted((float(t), c) for (gg, t, c) in rows if gg == g)
            want = _ch_ref(evs, n, w, si)
            assert got.get(g, 0) == want, (
                f"trial {trial} g={g} n={n} w={w} si={si}:"
                f" got {got.get(g)} want {want}; events {evs}")
