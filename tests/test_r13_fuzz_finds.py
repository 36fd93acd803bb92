"""Round-13 fuzz finds (VERDICT r12 item 2: grown vocabulary —
quantified under CASE arms / set-ops, correlated quantifiers,
multi-ASOF legs sharing a CTE side, WITH FILL under UNION).  The
first extended run (seed 1301) caught two REAL bridge bugs, pinned
here:

1. the alias-in-WHERE inliner descended into nested subqueries in
   the WHERE segment, corrupting alias-DEFINITION sites of the inner
   scope (``… AS g`` became ``… AS (t1.g)``) — surfaced by a
   correlated quantifier under an outer block that aliases its
   columns;
2. the ASOF bridge's qualifier strip ran statement-wide, so pass 1
   stripped the shared side's qualifiers out of a SIBLING branch's
   own ASOF leg (``l2.g = sh.g`` became ``l2.g = g`` → spurious
   ON-term raise).  The strip is now scoped to the bridged join's
   query block (side aliases are block-scoped in SQL).
"""
from __future__ import annotations

import duckdb

from transaq_clickhouse_exporter_spark.queries.ch_compat import run_ch_sql


def test_alias_inliner_skips_nested_subqueries(spark):
    """Outer block aliases g/v; the WHERE holds a correlated
    quantified comparison whose spliced subqueries define their OWN
    g/v aliases — those inner definition sites must survive."""
    q = ("SELECT t1.g AS g, t1.v AS v FROM (SELECT number % 4 AS g,"
         " number AS v FROM numbers(9)) AS t1 WHERE t1.v <= ANY"
         " (SELECT u2.v + 1 FROM (SELECT number % 4 AS g, number AS v"
         " FROM numbers(11)) AS u2 WHERE u2.g = t1.g)")
    got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
    dq = q.replace("numbers(9)",
                   "(SELECT range AS number FROM range(9))").replace(
        "numbers(11)", "(SELECT range AS number FROM range(11))")
    want = sorted(tuple(r) for r in duckdb.connect().execute(dq).fetchall())
    assert got == want and len(got) == 9
    # plain alias-in-WHERE keeps working (the reference panels' shape)
    r = run_ch_sql(
        spark,
        "SELECT number * 2 AS d FROM numbers(5) WHERE d >= 6",
    ).collect()
    assert sorted(x.d for x in r) == [6, 8]
    # and an alias referenced from WHERE both bare AND inside a plain
    # paren group (not a subquery) still inlines
    r = run_ch_sql(
        spark,
        "SELECT number * 2 AS d FROM numbers(5)"
        " WHERE (d >= 4) AND d <= 6",
    ).collect()
    assert sorted(x.d for x in r) == [4, 6]


def test_parallel_asof_legs_share_cte_side(spark):
    """Two ASOF legs in UNION branches consuming the SAME
    statement-level CTE: pass 1 must leave the sibling leg's
    qualified ON terms (and the shared def) for pass 2."""
    q = ("WITH sh AS (SELECT g, coalesce(v, 0) + 1 AS rv FROM"
         " (SELECT number % 2 AS g, number AS v FROM numbers(4)))"
         " SELECT g, v FROM (SELECT l1.g AS g, l1.v +"
         " coalesce(sh.rv, 0) AS v FROM (SELECT g, coalesce(v, 0) AS v"
         " FROM (SELECT number % 2 AS g, number + 2 AS v FROM"
         " numbers(3))) AS l1 ASOF LEFT JOIN sh ON l1.g = sh.g"
         " AND l1.v >= sh.rv)"
         " UNION ALL"
         " SELECT g, v FROM (SELECT l2.g AS g, l2.v +"
         " coalesce(sh.rv, 0) AS v FROM (SELECT g, coalesce(v, 0) AS v"
         " FROM (SELECT number % 3 AS g, number + 5 AS v FROM"
         " numbers(4))) AS l2 ASOF LEFT JOIN sh ON l2.g = sh.g"
         " AND l2.v >= sh.rv)")
    got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
    dq = q
    for k in (4, 3):
        dq = dq.replace(f"numbers({k})",
                        f"(SELECT range AS number FROM range({k}))")
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(dq).fetchall())
    assert got == want and len(got) == 7


def test_asof_strip_respects_top_level_union_boundary(spark):
    """The parens-free variant: both legs at statement top level,
    bounded only by the UNION keyword."""
    q = ("WITH sh AS (SELECT 1 AS g, 4 AS rv)"
         " SELECT a.g AS g, a.v + coalesce(sh.rv, 0) AS v"
         " FROM (SELECT 1 AS g, 5 AS v) AS a"
         " ASOF LEFT JOIN sh ON a.g = sh.g AND a.v >= sh.rv"
         " UNION ALL"
         " SELECT b.g AS g, b.v + coalesce(sh.rv, 0) AS v"
         " FROM (SELECT 1 AS g, 9 AS v) AS b"
         " ASOF LEFT JOIN sh ON b.g = sh.g AND b.v >= sh.rv")
    got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(q).fetchall())
    assert got == want == [(1, 9), (1, 13)]


def test_limit_with_ties_in_subquery(spark):
    """r13 fuzz lead: CH accepts ``LIMIT n WITH TIES`` (and the ANSI
    ``FETCH FIRST n ROWS WITH TIES``) inside subqueries; the bridge
    now applies the rank() wrapper per SELECT block instead of
    raising top-level-only."""
    q = ("SELECT CAST(sum(v) AS BIGINT) AS s FROM (SELECT v FROM"
         " (SELECT number % 3 AS v FROM numbers(9))"
         " ORDER BY v FETCH FIRST 4 ROWS WITH TIES)")
    # keys 0,0,0,1,1,1,2,2,2 -> first 4 + ties on 1 -> 0,0,0,1,1,1
    assert run_ch_sql(spark, q).collect()[0].s == 3
    q = ("SELECT a.v AS v, b.v AS w FROM"
         " (SELECT number AS v FROM numbers(5) ORDER BY v"
         " LIMIT 2 WITH TIES) AS a"
         " INNER JOIN (SELECT number AS v FROM numbers(3)) AS b"
         " ON a.v = b.v ORDER BY v")
    rows = run_ch_sql(spark, q).collect()
    assert [(r.v, r.w) for r in rows] == [(0, 0), (1, 1)]
    # top-level spelling keeps working
    rows = run_ch_sql(
        spark,
        "SELECT v FROM (SELECT number % 3 AS v FROM numbers(9))"
        " ORDER BY v LIMIT 4 WITH TIES").collect()
    assert [r.v for r in rows] == [0, 0, 0, 1, 1, 1]


def test_spark_push_projection_through_union_limitation(spark):
    """Documented Spark 4.1.2 limitation (r13 fuzz seed 12/58, found
    once the correlated-quantifier vocabulary landed): a correlated
    scalar subquery PROJECTED over a UNION child crashes the
    optimizer's PushProjectionThroughUnion with ``key not found:
    <inner attribute>`` — the rule's attribute rewrite descends into
    the subquery plan's own scope.  Plain Spark SQL, no dialect
    involvement.  Pinned so a Spark upgrade that fixes it surfaces
    here (flip to a value assert); the fuzzer keeps correlated
    sources leaf-shaped meanwhile, and ev28's plain-table source is
    unaffected."""
    import pytest

    q = ("SELECT g, coalesce(v, 0) AS v FROM (SELECT g, v FROM"
         " (SELECT (SELECT max(u.x) FROM (SELECT 1 AS k, 2 AS x) u"
         " WHERE u.k = t1.g) AS v, g"
         " FROM (SELECT 1 AS g UNION ALL SELECT 2 AS g) AS t1) AS w)"
         " UNION ALL SELECT 9 AS g, 9 AS v")
    with pytest.raises(Exception, match="key not found|INTERNAL"):
        spark.sql(q).collect()


def test_alias_inliner_splits_on_intersect_except(spark):
    """r13 probe find: the alias-in-WHERE inliner split blocks on
    UNION only — under INTERSECT/EXCEPT the first branch's aliases
    inlined into the SECOND branch's alias-definition sites
    (``AS v`` became ``AS (number)``).  Now all set operators split;
    the star-modifier ``* EXCEPT (col)`` spelling must NOT split."""
    q = ("SELECT count() AS c FROM (SELECT number AS v FROM numbers(5)"
         " WHERE v > ANY (SELECT 2) INTERSECT DISTINCT"
         " SELECT number AS v FROM numbers(5) WHERE v >= 3)")
    assert run_ch_sql(spark, q).collect()[0].c == 2
    q = ("SELECT count() AS c FROM (SELECT number AS v FROM numbers(6)"
         " WHERE v >= 2 EXCEPT DISTINCT"
         " SELECT number AS v FROM numbers(6) WHERE v >= 4)")
    assert run_ch_sql(spark, q).collect()[0].c == 2
    # star-modifier EXCEPT in a set-op-free statement still inlines
    # the WHERE alias of its own block
    r = run_ch_sql(
        spark,
        "SELECT * EXCEPT (w) FROM (SELECT number AS v, number AS w"
        " FROM numbers(5)) WHERE v >= 3 ORDER BY v").collect()
    assert [x.v for x in r] == [3, 4]
