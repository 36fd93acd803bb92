"""Round-15 ADVICE regressions.

1. (high) maxIntersections sibling-aggregate guard vs CH's OPEN
   combinator set: ``countIf``/``sumIf``/… in HAVING/ORDER BY slipped
   past the name blacklist, so the window rewrite evaluated them over
   the LATERAL-VIEW-exploded rows (2x per interval) — silently wrong
   group filtering.  The guard is now INVERTED for those clauses: any
   call not known to be scalar declines the rewrite (the fold is
   always value-correct).
2. (low) exponentialMovingAverage(0) divided by zero in the fold's
   exponent — silent NaN/Inf; the half-decay parameter must be a
   positive finite.
"""

from __future__ import annotations

import warnings

import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    MaxIntersectionsFoldWarning,
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)

_MI_DATA = (
    "(SELECT * FROM VALUES"
    " (1, 1, 5), (1, 2, 6), (1, 4, 7),"            # g=1: mi=3, 3 rows
    " (2, 1, 2), (2, 2, 3), (2, 3, 4), (2, 4, 5)"  # g=2: mi=1, 4 rows
    " AS t(g, s, e))"
)


def test_combinator_in_having_declines_and_is_value_correct(spark):
    # countIf(s>0)=3 keeps g=1 and drops g=2 (4 rows).  The broken
    # rewrite counted the EXPLODED rows (6 and 8) and dropped BOTH.
    q = (f"SELECT g, maxIntersections(s, e) AS mi FROM {_MI_DATA} t"
         " GROUP BY g HAVING countIf(s > 0) <= 3")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert "__mi_c0" not in translate_ch_sql(q)  # fold, not sweep
        got = [tuple(r) for r in run_ch_sql(spark, q).collect()]
    assert any(issubclass(x.category, MaxIntersectionsFoldWarning)
               for x in w)
    assert got == [(1, 3)]


def test_combinator_in_order_by_declines():
    q = (f"SELECT g, maxIntersections(s, e) AS mi FROM {_MI_DATA} t"
         " GROUP BY g ORDER BY sumIf(s, s > 0)")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = translate_ch_sql(q)
    assert "__mi_c0" not in out
    assert any(issubclass(x.category, MaxIntersectionsFoldWarning)
               for x in w)


@pytest.mark.parametrize("tail", [
    " GROUP BY g HAVING g > 0",                    # scalar HAVING
    " GROUP BY g ORDER BY mi DESC LIMIT 5",        # alias ORDER BY
    " GROUP BY g ORDER BY abs(g)",                 # known-scalar call
])
def test_scalar_having_order_by_still_sweeps(tail):
    q = f"SELECT g, maxIntersections(s, e) AS mi FROM {_MI_DATA} t{tail}"
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("error", MaxIntersectionsFoldWarning)
        out = translate_ch_sql(q)
    assert "__mi_c0" in out  # the window sweep planned


def test_group_key_function_in_order_by_sweeps(spark):
    # a function used inside a GROUP BY key is vetted scalar — its
    # reuse in ORDER BY must not decline the rewrite.  (The VALUE run
    # orders by the alias: Spark inlines SQL-UDF shims as projections,
    # so re-stating a shimmed key expression in ORDER BY fails LOUDLY
    # for ANY aggregate, sweep or not — a pre-existing, non-silent
    # Spark SQL-UDF interaction, not a rewrite defect.)
    q = ("SELECT toStartOfDay(d) AS g, maxIntersections(s, e) AS mi"
         " FROM (SELECT timestamp'2024-01-01 10:00:00' AS d, 1 AS s,"
         " 5 AS e UNION ALL SELECT timestamp'2024-01-01 11:00:00', 2, 6)"
         " t GROUP BY toStartOfDay(d) ORDER BY toStartOfDay(d)")
    assert "__mi_c0" in translate_ch_sql(q)
    ran = run_ch_sql(spark, q.replace("ORDER BY toStartOfDay(d)",
                                      "ORDER BY g"))
    assert [tuple(r)[1] for r in ran.collect()] == [2]


@pytest.mark.parametrize("h", ["0", "0.0", "-1", "-0.5"])
def test_ema_nonpositive_half_decay_raises(h):
    with pytest.raises(UnsupportedChSql, match="positive finite"):
        translate_ch_sql(
            f"SELECT exponentialMovingAverage({h})(v, t) FROM x")


def test_ema_positive_half_decay_still_translates():
    out = translate_ch_sql(
        "SELECT exponentialMovingAverage(1)(v, t) FROM x")
    assert "exponentialMovingAverage" not in out
