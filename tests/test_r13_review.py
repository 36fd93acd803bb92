"""Round-13 self-review pins: four verified findings from the
end-of-round diff review, fixed before ship.

1. chained ASOF with every side's timestamp named the same (`ts`)
   collided on the shared `__asof_rts` synthetic — the out-col is
   per-pass-unique now;
2. `_asof_block_span` read the `* EXCEPT (cols)` star-modifier as a
   set-operator boundary and truncated the qualifier-strip region;
3. `_select_top`'s set-op guard missed the double-parenthesized
   `EXCEPT ((SELECT …))` operand — TOP silently became a trailing
   LIMIT over the whole set-op result;
4. the alias-inliner subquery skip dropped CH's outer-alias-inside-
   WHERE-subquery resolution (correlated use) — spans that do not
   rebind the name inline again.

All three dual-use-EXCEPT sites now share `_SETOP_EXCEPT_RX`.
"""
from __future__ import annotations

import duckdb
import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
)


def test_chained_asof_same_ts_name_on_all_sides(spark):
    """The canonical chain: every side's timestamp is literally `ts`
    — each pass gets its own matched-ts synthetic, no collision."""
    q = ("SELECT a.v AS v, b.ts AS bts, c.ts AS cts"
         " FROM (SELECT 1 AS g, 10 AS ts, 5 AS v) AS a"
         " ASOF JOIN (SELECT 1 AS g, 8 AS ts) AS b"
         " ON a.g = b.g AND a.ts >= b.ts"
         " ASOF JOIN (SELECT 1 AS g, 9 AS ts) AS c"
         " ON a.g = c.g AND a.ts >= c.ts")
    rows = run_ch_sql(spark, q).collect()
    assert [(r.v, r.bts, r.cts) for r in rows] == [(5, 8, 9)]


def test_asof_block_span_ignores_star_except(spark):
    """`* EXCEPT (col)` in an ASOF statement's SELECT list must not
    truncate the qualifier-strip region."""
    q = ("SELECT b.rv AS m, * EXCEPT (x)"
         " FROM (SELECT 1 AS g, 5 AS v, 7 AS x) AS a"
         " ASOF LEFT JOIN (SELECT 1 AS g, 3 AS rv) AS b"
         " ON a.g = b.g AND a.v >= b.rv")
    rows = run_ch_sql(spark, q).collect()
    assert len(rows) == 1 and rows[0].m == 3
    # and a genuine set-op EXCEPT after an ASOF block still bounds
    # the sibling branch (strip must not leak across it)
    q = ("WITH sh AS (SELECT 1 AS g, 4 AS rv)"
         " SELECT a.v + sh.rv AS v FROM (SELECT 1 AS g, 9 AS v) AS a"
         " ASOF JOIN sh ON a.g = sh.g AND a.v >= sh.rv"
         " EXCEPT DISTINCT SELECT 99 AS v")
    got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
    assert got == [(13,)]


def test_select_top_double_paren_setop_raises(spark):
    for bad in (
        "SELECT TOP 2 number FROM numbers(3) EXCEPT"
        " ((SELECT 1))",
        "SELECT TOP 2 number FROM numbers(3) EXCEPT"
        " ( ( SELECT 1 ) )",
    ):
        with pytest.raises(UnsupportedChSql, match="TOP combined"):
            run_ch_sql(spark, bad)
    # star-modifier still exempt
    rows = run_ch_sql(
        spark,
        "SELECT TOP 1 * EXCEPT (v) FROM (SELECT 1 AS g, 2 AS v)"
    ).collect()
    assert rows[0].asDict() == {"g": 1}


def test_outer_alias_inside_where_subquery_inlines(spark):
    """CH resolves an outer SELECT alias inside a WHERE subquery; a
    span that does not rebind the name inlines the alias (pre-r13
    behavior restored), while a span that spells `AS <alias>` keeps
    its own scope (the r13 corruption fix)."""
    q = ("SELECT number * 2 AS d FROM numbers(5)"
         " WHERE d IN (SELECT x * 2 FROM (SELECT number AS x FROM"
         " numbers(3)) WHERE x * 2 <= d)")
    rows = run_ch_sql(spark, q).collect()
    assert sorted(r.d for r in rows) == [0, 2, 4]
    # rebinding span: the spliced-quantifier shape keeps working
    q = ("SELECT t1.g AS g, t1.v AS v FROM (SELECT number % 4 AS g,"
         " number AS v FROM numbers(9)) AS t1 WHERE t1.v <= ANY"
         " (SELECT u2.v + 1 FROM (SELECT number % 4 AS g, number AS v"
         " FROM numbers(11)) AS u2 WHERE u2.g = t1.g)")
    got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
    dq = q.replace("numbers(9)",
                   "(SELECT range AS number FROM range(9))").replace(
        "numbers(11)", "(SELECT range AS number FROM range(11))")
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(dq).fetchall())
    assert got == want and len(got) == 9


def test_multi_array_join_expression_members(spark):
    """r13: the multi-array ARRAY JOIN zip form accepts EXPRESSION
    members — `arrayEnumerate(arr) AS i` (CH's positional-index
    idiom) computes into a wrapped FROM and zips like a column."""
    spark.createDataFrame(
        [(1, [1, 2], ["a", "b"]), (2, [3], ["c"]), (3, [], [])],
        "id long, xs array<int>, ys array<string>",
    ).createOrReplaceTempView("r13_zt")
    rows = run_ch_sql(
        spark,
        "SELECT id, x, i FROM r13_zt ARRAY JOIN xs AS x,"
        " arrayEnumerate(xs) AS i").collect()
    assert sorted(map(tuple, rows)) == [(1, 1, 1), (1, 2, 2), (2, 3, 1)]
    rows = run_ch_sql(
        spark,
        "SELECT id, x, i FROM r13_zt LEFT ARRAY JOIN xs AS x,"
        " arrayEnumerate(xs) AS i").collect()
    assert sorted(map(tuple, rows), key=repr) == sorted(
        [(1, 1, 1), (1, 2, 2), (2, 3, 1), (3, None, None)], key=repr)
    # simple-column zip unchanged; subquery FROM with an expression
    # member keeps the named raise
    rows = run_ch_sql(
        spark,
        "SELECT id, x, y FROM r13_zt ARRAY JOIN xs AS x, ys AS y"
    ).collect()
    assert sorted(map(tuple, rows)) == [(1, 1, "a"), (1, 2, "b"),
                                        (2, 3, "c")]
    with pytest.raises(UnsupportedChSql, match="EXPRESSION"):
        run_ch_sql(
            spark,
            "SELECT id, x, i FROM (SELECT * FROM r13_zt) t"
            " ARRAY JOIN xs AS x, arrayEnumerate(xs) AS i")
