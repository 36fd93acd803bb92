"""Round-16 optimization: the ASOF bridges drop a RIGHT-side subquery's
pure per-row dedup (``SELECT cols FROM t [WHERE ...] GROUP BY <same
cols>`` with no aggregates) — the union-window ``last()`` is
insensitive to duplicate IDENTICAL right rows, so results are
bit-equal while the right side sheds its dedup Exchange + aggregate
pair.  Left sides never take the path (left multiplicities feed
downstream aggregates)."""
from __future__ import annotations

import duckdb

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    _asof_right_sans_distinct,
    run_ch_sql,
)


def test_sans_distinct_accepts_pure_dedup():
    assert _asof_right_sans_distinct(
        "SELECT g, rv FROM t GROUP BY g, rv") == "SELECT g, rv FROM t"
    assert _asof_right_sans_distinct(
        "SELECT g, rv FROM t WHERE rv > 3 GROUP BY g, rv"
    ) == "SELECT g, rv FROM t WHERE rv > 3"
    # positional GROUP BY 1, 2 and permuted order both resolve
    assert _asof_right_sans_distinct(
        "SELECT g, rv FROM t GROUP BY 2, 1") == "SELECT g, rv FROM t"
    assert _asof_right_sans_distinct(
        "SELECT g, rv FROM t GROUP BY rv, g") == "SELECT g, rv FROM t"


def test_sans_distinct_declines_unsafe_shapes():
    for body in (
        "SELECT g, max(rv) FROM t GROUP BY g",          # aggregate
        "SELECT g, rv FROM t GROUP BY g",               # cols != group keys
        "SELECT g, rv + 1 FROM t GROUP BY g, rv + 1",   # expression item
        "SELECT t.g, t.rv FROM t GROUP BY t.g, t.rv",   # qualified
        "SELECT g, rv FROM t WHERE g IN (SELECT g FROM u) GROUP BY g, rv",
        "SELECT g, rv FROM (SELECT * FROM t) GROUP BY g, rv",
        "SELECT g, rv FROM t GROUP BY g, rv HAVING count() > 1",
        "SELECT g, rv FROM t JOIN u USING (g) GROUP BY g, rv",
        "SELECT DISTINCT g, rv FROM t",                 # no GROUP BY
        "SELECT g, rv FROM t GROUP BY g, rv ORDER BY g LIMIT 2",
    ):
        assert _asof_right_sans_distinct(body) is None, body


def _mk_dup_tables(spark):
    spark.sql("""
        SELECT * FROM VALUES (1, 10), (1, 20), (2, 15), (2, 35) AS l(g, v)
    """).createOrReplaceTempView("edl")
    # right side holds IDENTICAL duplicate rows the GROUP BY would drop
    spark.sql("""
        SELECT * FROM VALUES (1, 8), (1, 8), (1, 15), (1, 15), (1, 15),
                             (2, 12), (2, 12), (2, 40) AS r(g, rv)
    """).createOrReplaceTempView("edr")


def test_bridged_asof_distinct_right_results_and_plan(spark):
    _mk_dup_tables(spark)
    q = ("SELECT l.g AS g, l.v AS v, r.rv AS rv FROM edl AS l"
         " ASOF LEFT JOIN (SELECT g, rv FROM edr GROUP BY g, rv) AS r"
         " ON l.g = r.g AND l.v >= r.rv ORDER BY g, v")
    df = run_ch_sql(spark, q)
    got = [tuple(t) for t in df.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE edl AS SELECT * FROM (VALUES (1, 10),"
                " (1, 20), (2, 15), (2, 35)) t(g, v)")
    con.execute("CREATE TABLE edr AS SELECT * FROM (VALUES (1, 8), (1, 8),"
                " (1, 15), (1, 15), (1, 15), (2, 12), (2, 12), (2, 40))"
                " t(g, rv)")
    want = [tuple(t) for t in con.execute(q).fetchall()]
    assert got == want == [(1, 10, 8), (1, 20, 15), (2, 15, 12), (2, 35, 12)]
    # the dedup's aggregate pair is gone from the plan
    assert "Aggregate" not in df._jdf.queryExecution().optimizedPlan().toString()


def test_bridged_asof_chain_distinct_right(spark):
    _mk_dup_tables(spark)
    q = ("SELECT l.g AS g, l.v AS v, r.rv AS rv, r2.rv2 AS rv2"
         " FROM edl AS l"
         " ASOF JOIN (SELECT g, rv FROM edr GROUP BY g, rv) AS r"
         " ON l.g = r.g AND l.v >= r.rv"
         " ASOF JOIN (SELECT g, rv AS rv2 FROM edr GROUP BY g, rv) AS r2"
         " ON l.g = r2.g AND l.v >= r2.rv2 ORDER BY g, v")
    df = run_ch_sql(spark, q)
    got = [tuple(t) for t in df.collect()]
    assert got == [(1, 10, 8, 8), (1, 20, 15, 15),
                   (2, 15, 12, 12), (2, 35, 12, 12)]
    # only link 1 (aliased select item declines on link 2) loses its dedup;
    # the surviving plan still has exactly one Aggregate (link 2's dedup)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
