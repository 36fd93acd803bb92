"""asof_join_multi (r15): k shared-key ASOF links in ONE keyed window
— one shuffle total where a chain of asof_join calls pays one per link
(Spark's Union never preserves child partitioning, so every link
re-exchanges).

Reference semantics: ClickHouse chained ASOF JOIN (each link an
independent closest-at-or-before pick against the LEFT's own
timestamp when the chain keys and time axis coincide) —
kmlebedev/transaq-clickhouse-exporter delegates all such query
execution to ClickHouse; here the operator is first-class.
"""

from __future__ import annotations

import random

import pytest

from transaq_clickhouse_exporter_spark.operators.asof import (
    asof_join,
    asof_join_multi,
)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _multi_vs_sequential(spark, seed, direction, strict):
    rng = random.Random(seed)
    left = [(g, rng.randint(0, 50), rng.randint(100, 999))
            for g in range(4) for _ in range(rng.randint(2, 10))]
    # per-side right rows: ts deduped per key (the bridge contract —
    # CH node order at duplicate right timestamps is undefined)
    def right(v0):
        seen, out = set(), []
        for g in range(4):
            for _ in range(rng.randint(1, 8)):
                ts = rng.randint(0, 50)
                if (g, ts) in seen:
                    continue
                seen.add((g, ts))
                out.append((g, ts, v0 + ts))
        return out

    ldf = _mk(spark, left, ["g", "t", "lv"])
    r1 = _mk(spark, right(1000), ["g", "ts1", "q1"])
    r2 = _mk(spark, right(2000), ["g", "ts2", "q2"])

    got = asof_join_multi(
        ldf, [(r1, "ts1", "m1"), (r2, "ts2", "m2")], by=["g"],
        left_ts="t", direction=direction, strict=strict,
    ).collect()

    s1 = asof_join(ldf, r1, by=["g"], left_ts="t", right_ts="ts1",
                   right_ts_out="m1", direction=direction, strict=strict)
    want = asof_join(s1, r2, by=["g"], left_ts="t", right_ts="ts2",
                     right_ts_out="m2", direction=direction,
                     strict=strict).collect()

    key = lambda r: sorted(r.asDict().items())
    assert sorted(map(key, got)) == sorted(map(key, want))


@pytest.mark.parametrize("direction,strict", [
    ("backward", False), ("backward", True),
    ("forward", False), ("forward", True),
])
def test_multi_equals_sequential_links(spark, direction, strict):
    for seed in (1, 2, 3):
        _multi_vs_sequential(spark, 1500 + seed, direction, strict)


def test_single_exchange_plan(spark):
    ldf = _mk(spark, [(1, 10, 5)], ["g", "t", "lv"])
    r1 = _mk(spark, [(1, 8, 80)], ["g", "ts1", "q1"])
    r2 = _mk(spark, [(1, 9, 90)], ["g", "ts2", "q2"])
    out = asof_join_multi(ldf, [(r1, "ts1", "m1"), (r2, "ts2", "m2")],
                          by=["g"], left_ts="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the k-link join itself: ONE keyed exchange, ONE window
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    # the sequential chain pays one exchange PER link
    s1 = asof_join(ldf, r1, by=["g"], left_ts="t", right_ts="ts1",
                   right_ts_out="m1")
    s2 = asof_join(s1, r2, by=["g"], left_ts="t", right_ts="ts2",
                   right_ts_out="m2")
    seq = s2._jdf.queryExecution().executedPlan().toString()
    assert seq.count("Exchange hashpartitioning") == 2


def test_inner_gating_and_values(spark):
    ldf = _mk(spark, [(1, 10, 5), (1, 3, 6), (2, 10, 7)], ["g", "t", "lv"])
    r1 = _mk(spark, [(1, 8, 80), (1, 10, 81)], ["g", "ts1", "q1"])
    r2 = _mk(spark, [(1, 4, 90), (2, 99, 91)], ["g", "ts2", "q2"])
    out = asof_join_multi(ldf, [(r1, "ts1", "m1"), (r2, "ts2", "m2")],
                          by=["g"], left_ts="t")
    rows = {(r.g, r.t): (r.q1, r.m1, r.q2, r.m2) for r in out.collect()}
    # (1,10): r1 inclusive pick at 10; r2 pick at 4
    assert rows[(1, 10)] == (81, 10, 90, 4)
    # (1,3): no r1 <= 3, no r2 <= 3 → NULLs (LEFT semantics)
    assert rows[(1, 3)] == (None, None, None, None)
    # (2,10): no r1 rows for g=2; r2's only row is later → NULLs
    assert rows[(2, 10)] == (None, None, None, None)
    # CH INNER gating = filter on the matched timestamps
    inner = out.filter("m1 IS NOT NULL AND m2 IS NOT NULL").collect()
    assert [(r.g, r.t) for r in inner] == [(1, 10)]


def test_per_right_comparators_equal_sequential(spark):
    # r15 second phase: 5-tuple rights override the comparator PER
    # SIDE — one backward-inclusive, one forward-strict — and still
    # share the single keyed exchange (two Sorts, two Windows)
    rng = random.Random(15152)
    left = [(g, rng.randint(0, 40), g * 100 + i)
            for g in range(3) for i in range(6)]
    def right(col, v0):
        seen, out = set(), []
        for g in range(3):
            for _ in range(6):
                ts = rng.randint(0, 40)
                if (g, ts) not in seen:
                    seen.add((g, ts))
                    out.append((g, ts, v0 + ts))
        return out
    ldf = _mk(spark, left, ["g", "t", "lv"])
    r1 = _mk(spark, right("ts1", 100), ["g", "ts1", "q1"])
    r2 = _mk(spark, right("ts2", 200), ["g", "ts2", "q2"])
    got = asof_join_multi(
        ldf,
        [(r1, "ts1", "m1", "backward", False),
         (r2, "ts2", "m2", "forward", True)],
        by=["g"], left_ts="t",
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2
    s1 = asof_join(ldf, r1, by=["g"], left_ts="t", right_ts="ts1",
                   right_ts_out="m1", direction="backward")
    want = asof_join(s1, r2, by=["g"], left_ts="t", right_ts="ts2",
                     right_ts_out="m2", direction="forward", strict=True)
    key = lambda r: sorted(r.asDict().items())
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, want.collect()))


def test_collision_raises(spark):
    ldf = _mk(spark, [(1, 10, 5)], ["g", "t", "lv"])
    r1 = _mk(spark, [(1, 8, 80)], ["g", "ts1", "q"])
    r2 = _mk(spark, [(1, 9, 90)], ["g", "ts2", "q"])
    with pytest.raises(ValueError, match="collide"):
        asof_join_multi(ldf, [(r1, "ts1", "m1"), (r2, "ts2", "m2")],
                        by=["g"], left_ts="t")
    with pytest.raises(ValueError, match="at least one right"):
        asof_join_multi(ldf, [], by=["g"], left_ts="t")
