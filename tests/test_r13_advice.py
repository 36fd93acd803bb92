"""Round-13 advice pins: five dialect edge cases found by the r12
review (ADVICE.md) — each was a supported CH spelling dying with a
confusing Spark parse error (or, for the view leak, polluting the
session catalog) before the fix.
"""
from __future__ import annotations

import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)


def test_ternary_condition_with_comma_literal(spark):
    """ADVICE r13 (medium): the ternary's left-boundary scan must use
    the literal-masked shadow — a comma INSIDE a string literal in the
    condition previously split the condition mid-literal
    (``s = 'x,y' ? 1 : 0`` became ``s = 'x, if(y', 1, 0)``)."""
    r = run_ch_sql(
        spark,
        "SELECT s = 'x,y' ? 1 : 0 AS r FROM (SELECT 'x,y' AS s)",
    ).collect()[0]
    assert r.r == 1
    # comma-literal in the THEN / ELSE branches too, and a genuine
    # select-list comma still bounds the condition
    r = run_ch_sql(
        spark,
        "SELECT 7 AS a, 1 = 1 ? 'p,q' : 'r,s' AS b,"
        " 1 = 2 ? 'p,q' : 'r,s' AS c",
    ).collect()[0]
    assert (r.a, r.b, r.c) == (7, "p,q", "r,s")


def test_ternary_inside_qualify(spark):
    """ADVICE r13: QUALIFY joined both ternary boundary keyword lists
    (the ternary rewrite runs before the QUALIFY bridge) — previously
    the condition scan ran back through QUALIFY and FROM, yielding
    garbage SQL."""
    rows = run_ch_sql(
        spark,
        "SELECT number AS v FROM numbers(3)"
        " QUALIFY row_number() OVER (ORDER BY number) = 1"
        " ? true : false",
    ).collect()
    assert [r.v for r in rows] == [0]
    # ternary as a QUALIFY comparand, bounded on the right by ORDER BY
    rows = run_ch_sql(
        spark,
        "SELECT number AS v FROM numbers(4)"
        " QUALIFY row_number() OVER (ORDER BY number)"
        " <= (number < 9 ? 2 : 0) ORDER BY v DESC",
    ).collect()
    assert [r.v for r in rows] == [1, 0]


def test_select_top_with_star_except(spark):
    """ADVICE r13: ``SELECT TOP n * EXCEPT (col)`` — the EXCEPT of a
    star-EXCEPT modifier is not a set operator and must not trip the
    TOP+set-operator guard."""
    rows = run_ch_sql(
        spark,
        "SELECT TOP 2 * EXCEPT (v) FROM (SELECT number % 2 AS g,"
        " number AS v FROM numbers(6)) ORDER BY g",
    ).collect()
    assert [r.asDict() for r in rows] == [{"g": 0}, {"g": 0}]
    # parenless single-column form composes the same way
    rows = run_ch_sql(
        spark,
        "SELECT TOP 1 * EXCEPT v FROM (SELECT 1 AS g, 2 AS v)",
    ).collect()
    assert rows[0].asDict() == {"g": 1}
    # genuine set operators still raise by name
    for bad in (
        "SELECT TOP 2 number FROM numbers(3) UNION ALL SELECT 9",
        "SELECT TOP 2 number FROM numbers(3) EXCEPT DISTINCT"
        " SELECT 1",
        "SELECT TOP 2 number FROM numbers(3) EXCEPT ALL SELECT 1",
        "SELECT TOP 2 number FROM numbers(3) INTERSECT DISTINCT"
        " SELECT 1",
    ):
        with pytest.raises(UnsupportedChSql, match="TOP combined"):
            run_ch_sql(spark, bad)


def test_cast_on_tuple_element_access(spark):
    """ADVICE r13: ``(tuple_expr).N::Type`` — the ``::`` operand scan
    extends back over the paren group (plus callee name) when it lands
    on a bare ``.N``, so the cast wraps the whole element access."""
    r = run_ch_sql(
        spark,
        "SELECT tuple(1, 2).1::String AS a,"
        " tuple(7, 'x').2::Nullable(String) AS b,"
        " (tuple(300, 0)).1::UInt8 AS c",
    ).collect()[0]
    assert (r.a, r.b, r.c) == ("1", "x", 44)
    # the cast wraps the WHOLE element access (not a bare `.1`): the
    # translated text shows toString over the struct-field read
    t = translate_ch_sql("SELECT tuple(1, 2).1::String AS a")
    assert "toString((named_struct" in t and ".col1)" in t


def test_asof_bridge_drops_views_on_later_pass_raise(spark):
    """ADVICE r13: a raise from a LATER ASOF bridge pass (here the
    second link's unsupported non-conjunctive ON term) must still
    drop the temp views earlier passes registered.  (The original
    trigger — chained ASOF — joined the subset later in r13, so the
    raise now comes from the bad ON term instead.)"""
    spark.createDataFrame(
        [("S", 100, 1.0)], "sec string, t long, p double"
    ).createOrReplaceTempView("r13_tr")
    spark.createDataFrame(
        [("S", 90, 2.0)], "qsec string, tq long, b double"
    ).createOrReplaceTempView("r13_q")
    spark.createDataFrame(
        [("S", 80, 3.0)], "xsec string, tx long, c double"
    ).createOrReplaceTempView("r13_x")

    before = {t.name for t in spark.catalog.listTables()
              if t.name.startswith("__ch_asof_")}
    with pytest.raises(UnsupportedChSql, match="ASOF ON"):
        run_ch_sql(
            spark,
            "SELECT a.sec FROM r13_tr a"
            " ASOF JOIN r13_q b ON a.sec = b.qsec AND a.t >= b.tq"
            " ASOF JOIN r13_x c ON a.sec != c.xsec AND a.t >= c.tx",
        )
    after = {t.name for t in spark.catalog.listTables()
             if t.name.startswith("__ch_asof_")}
    assert after == before, f"leaked ASOF views: {after - before}"

    # the chained spelling itself now bridges (r13): link 2's left
    # side is link 1's view, matched values pinned
    rows = run_ch_sql(
        spark,
        "SELECT a.sec AS sec, b.b AS b, c.c AS c FROM r13_tr a"
        " ASOF JOIN r13_q b ON a.sec = b.qsec AND a.t >= b.tq"
        " ASOF JOIN r13_x c ON a.sec = c.xsec AND a.t >= c.tx",
    ).collect()
    assert [(r.sec, r.b, r.c) for r in rows] == [("S", 2.0, 3.0)]
