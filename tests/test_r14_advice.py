"""Round-14 ADVICE regressions (all three r13 advice items).

1. ``_cast_colons`` / ``_tuple_index_access`` backscans cross
   dot-qualified callees (``db.fn(1,2).1::String``) instead of
   wrapping only the tail name segment.
2. ``_spark_inline_cte_bug`` retries once on a probe CRASH before
   caching the session-wide 'buggy' verdict (a transient hiccup on a
   clean build no longer forfeits lineage silently), and the repeated
   crash path warns loudly.
3. Multi-array ARRAY JOIN synthetic columns are uuid-suffixed — a
   source table already carrying ``__ajm0``/``__zr``/``__ajw`` no
   longer collides.
"""

from __future__ import annotations

import warnings

import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    _ICTE_MARKER,
    _spark_inline_cte_bug,
    run_ch_sql,
    translate_ch_sql,
)


def test_dotted_callee_postfix_cast_translation():
    # tuple-element access + postfix cast on a dotted callee: the
    # whole qualified name stays inside the rewritten primary
    t = translate_ch_sql("SELECT db.fn(1,2).1::String FROM t")
    assert "toString((db.fn(1,2)).col1)" in t
    assert "db.toString" not in t and "db.CAST" not in t
    # plain postfix cast on a dotted callee
    t2 = translate_ch_sql("SELECT db.fn(1,2)::String FROM t")
    assert "toString(db.fn(1,2))" in t2
    # qualified array base before a bracket group
    t3 = translate_ch_sql("SELECT t.arr[1]::Int64 FROM t")
    assert "toInt64(try_element_at(t.arr, 1))" in t3


def test_dotted_callee_cast_value(spark):
    # runnable dotted form: a qualified tuple-typed column
    spark.sql(
        "SELECT named_struct('col1', 7, 'col2', 'x') AS tup"
    ).createOrReplaceTempView("r14_dot_t")
    df = run_ch_sql(spark, "SELECT (r14_dot_t.tup).1::String AS s FROM r14_dot_t")
    assert [tuple(r) for r in df.collect()] == [("7",)]


def test_icte_probe_retries_transient_crash(spark):
    """One probe crash on an otherwise functional session must NOT
    cache 'buggy' — the retry runs the real probe, which on this
    build (Spark 4.1.2, genuinely buggy) still reports buggy; on a
    clean build it would report clean.  We verify the retry happens
    by counting attempts through a flaky sql shim."""
    spark.conf.unset(_ICTE_MARKER)
    real_sql = spark.sql
    calls = {"n": 0, "failed": False}

    def flaky_sql(q, *a, **k):
        calls["n"] += 1
        if not calls["failed"]:
            calls["failed"] = True
            raise RuntimeError("transient executor hiccup (simulated)")
        return real_sql(q, *a, **k)

    spark.sql = flaky_sql
    try:
        verdict = _spark_inline_cte_bug(spark)
    finally:
        del spark.sql  # restore the class method
    # the retry ran real probe attempts after the simulated crash
    assert calls["n"] > 1
    # this build IS buggy, so the retried probe still says so — via
    # the probe's RESULT, not the crash short-circuit
    assert verdict is True
    assert spark.conf.get(_ICTE_MARKER) == "buggy"


def test_icte_probe_double_crash_warns_and_caches_buggy(spark):
    spark.conf.unset(_ICTE_MARKER)
    real_sql = spark.sql

    def dead_sql(q, *a, **k):
        raise RuntimeError("persistent failure (simulated)")

    spark.sql = dead_sql
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert _spark_inline_cte_bug(spark) is True
    finally:
        del spark.sql
    assert any("crashed twice" in str(x.message) for x in w)
    assert spark.conf.get(_ICTE_MARKER) == "buggy"
    # leave the true verdict for this build behind for other tests
    spark.conf.unset(_ICTE_MARKER)
    assert _spark_inline_cte_bug(spark) is True


def test_array_join_synthetics_survive_colliding_source_columns(spark):
    """A source table that already carries ``__ajm0``/``__zr``
    columns used to collide with the fixed synthetic names in the
    multi-array expression-member wrap (AMBIGUOUS_REFERENCE)."""
    spark.sql(
        "SELECT 1 AS k, array(10, 20) AS vs, 99 AS __ajm0,"
        " named_struct('f', 0) AS __zr, 5 AS __ajw"
    ).createOrReplaceTempView("r14_aj_collide")
    df = run_ch_sql(
        spark,
        "SELECT k, i, v FROM r14_aj_collide"
        " ARRAY JOIN arrayEnumerate(vs) AS i, vs AS v ORDER BY i",
    )
    assert [tuple(r) for r in df.collect()] == [(1, 1, 10), (1, 2, 20)]


def test_array_join_two_statements_distinct_synthetics():
    a = translate_ch_sql("SELECT 1 FROM t ARRAY JOIN f(x) AS a, ys AS b")
    b = translate_ch_sql("SELECT 1 FROM t ARRAY JOIN f(x) AS a, ys AS b")
    # uuid suffix differs between translations
    import re

    ua = re.search(r"__ajm0_([0-9a-f]{8})", a)
    ub = re.search(r"__ajm0_([0-9a-f]{8})", b)
    assert ua and ub and ua.group(1) != ub.group(1)
