"""Round-13: CHAINED ASOF JOIN joined the bridged subset — CH parses
join chains left-associatively, so ``a ASOF JOIN b … ASOF JOIN c …``
is ``(a ASOF JOIN b) ASOF JOIN c``; the bridge now rewrites the
consumed sides' qualifiers after the next ASOF keyword to
``<view>.<col>`` so pass 2 bridges the next link against pass 1's
view.  DuckDB's native chained ASOF is the oracle.
"""
from __future__ import annotations

import random

import duckdb
import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
)


def test_chained_asof_left_and_inner(spark):
    q = ("SELECT a.g AS g, a.v AS v, b.rv AS rv, c.ix AS ix"
         " FROM (SELECT 1 AS g, 10 AS v UNION ALL SELECT 1, 20) AS a"
         " ASOF JOIN (SELECT 1 AS g, 8 AS rv UNION ALL SELECT 1, 15)"
         " AS b ON a.g = b.g AND a.v >= b.rv"
         " ASOF JOIN (SELECT 1 AS g, 9 AS ix UNION ALL SELECT 1, 19)"
         " AS c ON a.g = c.g AND a.v >= c.ix ORDER BY v")
    got = [tuple(r) for r in run_ch_sql(spark, q).collect()]
    want = duckdb.connect().execute(q).fetchall()
    assert got == [tuple(r) for r in want] == [
        (1, 10, 8, 9), (1, 20, 15, 19)]

    # LEFT link first: unmatched left rows survive into link 2
    q = ("SELECT a.v AS v, b.rv AS rv, c.ix AS ix"
         " FROM (SELECT 1 AS g, 3 AS v UNION ALL SELECT 1, 20) AS a"
         " ASOF LEFT JOIN (SELECT 1 AS g, 8 AS rv) AS b"
         " ON a.g = b.g AND a.v >= b.rv"
         " ASOF LEFT JOIN (SELECT 1 AS g, 2 AS ix) AS c"
         " ON a.g = c.g AND a.v >= c.ix ORDER BY v")
    got = [tuple(r) for r in run_ch_sql(spark, q).collect()]
    want = duckdb.connect().execute(q).fetchall()
    assert got == [tuple(r) for r in want] == [
        (3, None, 2), (20, 8, 2)]


def test_chained_asof_three_links_and_tail_clauses(spark):
    q = ("SELECT CAST(sum(a.v + b.x + c.y + d.z) AS BIGINT) AS s"
         " FROM (SELECT 1 AS g, 100 AS v) AS a"
         " ASOF JOIN (SELECT 1 AS g, 10 AS x) AS b"
         " ON a.g = b.g AND a.v >= b.x"
         " ASOF JOIN (SELECT 1 AS g, 20 AS y) AS c"
         " ON a.g = c.g AND a.v >= c.y"
         " ASOF JOIN (SELECT 1 AS g, 30 AS z) AS d"
         " ON a.g = d.g AND a.v >= d.z"
         " WHERE a.v > 0 GROUP BY a.g")
    got = run_ch_sql(spark, q).collect()
    want = duckdb.connect().execute(q).fetchone()[0]
    assert got[0].s == want == 160


def test_chained_asof_randomized_vs_duckdb(spark):
    """Randomized 2-link chains over multi-row, multi-key sides."""
    rng = random.Random(1313)
    for trial in range(3):
        mk = lambda n, lo, hi: sorted(
            {(rng.randint(0, 2), rng.randint(lo, hi))
             for _ in range(n)})
        arows = mk(rng.randint(4, 9), 0, 30)
        brows = mk(rng.randint(3, 7), 0, 25)
        crows = mk(rng.randint(3, 7), 0, 28)
        asql = " UNION ALL ".join(
            f"SELECT {g} AS g, {v} AS v" for g, v in arows)
        bsql = " UNION ALL ".join(
            f"SELECT {g} AS g, {v} AS rv" for g, v in brows)
        csql = " UNION ALL ".join(
            f"SELECT {g} AS g, {v} AS ix" for g, v in crows)
        q = (f"SELECT a.g AS g, a.v AS v, b.rv AS rv, c.ix AS ix"
             f" FROM ({asql}) AS a"
             f" ASOF JOIN ({bsql}) AS b ON a.g = b.g AND a.v >= b.rv"
             f" ASOF JOIN ({csql}) AS c ON a.g = c.g AND a.v >= c.ix")
        got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
        want = sorted(
            tuple(r) for r in duckdb.connect().execute(q).fetchall())
        assert got == want, f"trial {trial}: {got} != {want}\n{q}"


def test_chained_asof_bad_second_link_still_raises(spark):
    with pytest.raises(UnsupportedChSql, match="ASOF ON"):
        run_ch_sql(
            spark,
            "SELECT 1 FROM (SELECT 1 AS g, 5 AS v) AS a"
            " ASOF JOIN (SELECT 1 AS g, 3 AS rv) AS b"
            " ON a.g = b.g AND a.v >= b.rv"
            " ASOF JOIN (SELECT 1 AS g, 2 AS r2) AS e"
            " ON a.g != e.g AND a.v >= e.r2")


def test_chained_asof_mixed_forms(spark):
    """USING first link + ON second link, and a CTE-named side inside
    a chain — the chain mechanics compose with every r12 side form."""
    q = ("SELECT a.g AS g, a.v AS v, c.ix AS ix"
         " FROM (SELECT 1 AS g, 10 AS v) AS a"
         " ASOF JOIN (SELECT 1 AS g, 8 AS v) AS b USING (g, v)"
         " ASOF JOIN (SELECT 1 AS g, 4 AS ix) AS c"
         " ON a.g = c.g AND a.v >= c.ix")
    rows = run_ch_sql(spark, q).collect()
    assert [(r.g, r.v, r.ix) for r in rows] == [(1, 10, 4)]

    q = ("WITH rr AS (SELECT 1 AS g, 3 AS rv)"
         " SELECT a.v AS v, rr.rv AS rv, c.ix AS ix"
         " FROM (SELECT 1 AS g, 10 AS v) AS a"
         " ASOF JOIN rr ON a.g = rr.g AND a.v >= rr.rv"
         " ASOF JOIN (SELECT 1 AS g, 6 AS ix) AS c"
         " ON a.g = c.g AND a.v >= c.ix")
    got = [tuple(r) for r in run_ch_sql(spark, q).collect()]
    want = duckdb.connect().execute(q).fetchall()
    assert got == [tuple(r) for r in want] == [(10, 3, 6)]


def test_chained_asof_three_link_randomized_vs_duckdb(spark):
    """Randomized 3-link chains (a→b→c→d), multi-key multi-row sides,
    LEFT and INNER links mixed — vs DuckDB's native chained ASOF."""
    rng = random.Random(1717)
    for trial in range(2):
        mk = lambda n, lo, hi: sorted(
            {(rng.randint(0, 2), rng.randint(lo, hi))
             for _ in range(n)})
        arows = mk(rng.randint(5, 9), 0, 40)
        brows = mk(rng.randint(3, 6), 0, 35)
        crows = mk(rng.randint(3, 6), 0, 30)
        drows = mk(rng.randint(3, 6), 0, 25)
        mksql = lambda rows, col: " UNION ALL ".join(
            f"SELECT {g} AS g, {v} AS {col}" for g, v in rows)
        j2 = "LEFT " if trial % 2 else ""
        q = (f"SELECT a.g AS g, a.v AS v, b.rv AS rv, c.ix AS ix,"
             f" d.wz AS wz"
             f" FROM ({mksql(arows, 'v')}) AS a"
             f" ASOF JOIN ({mksql(brows, 'rv')}) AS b"
             f" ON a.g = b.g AND a.v >= b.rv"
             f" ASOF {j2}JOIN ({mksql(crows, 'ix')}) AS c"
             f" ON a.g = c.g AND a.v >= c.ix"
             f" ASOF LEFT JOIN ({mksql(drows, 'wz')}) AS d"
             f" ON a.g = d.g AND a.v >= d.wz")
        got = sorted((tuple(r) for r in run_ch_sql(spark, q).collect()),
                     key=repr)
        want = sorted(
            (tuple(r) for r in duckdb.connect().execute(q).fetchall()),
            key=repr)
        assert got == want, f"trial {trial}: {got} != {want}\n{q}"
