"""maxIntersections / maxIntersectionsPosition through the dialect
(r14, third drain of the named-raise tail).

Reference semantics: ClickHouse AggregateFunctionMaxIntersections.h —
(start, +1) / (end, -1) events sorted as std::pair (position, weight),
so at an equal position the -1 end processes before the +1 start
("sort by weight to get deterministic result", source comment):
touching intervals do NOT intersect (half-open), and the scan is
fully deterministic.  Position = where the running count FIRST
strictly exceeds the prior maximum.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
    translate_ch_sql,
)


def _one(spark, q):
    return tuple(run_ch_sql(spark, q).collect()[0])


def test_overlap_and_first_position(spark):
    got = _one(spark, (
        "SELECT maxIntersections(s, e) AS mi,"
        " maxIntersectionsPosition(s, e) AS mip FROM"
        " (SELECT 1 AS s, 5 AS e UNION ALL SELECT 2, 6"
        " UNION ALL SELECT 4, 7)"))
    assert got == (3, 4.0)


def test_touching_intervals_do_not_intersect(spark):
    got = _one(spark, (
        "SELECT maxIntersections(s, e) AS mi,"
        " maxIntersectionsPosition(s, e) AS mip FROM"
        " (SELECT 1 AS s, 2 AS e UNION ALL SELECT 2, 3)"))
    assert got == (1, 1.0)


def test_empty_and_null_pairs(spark):
    assert _one(spark, (
        "SELECT maxIntersections(s, e) AS mi FROM"
        " (SELECT 1 AS s, 2 AS e WHERE 1 = 0)")) == (None,)
    # NULL endpoint pairs drop
    got = _one(spark, (
        "SELECT maxIntersections(s, e) AS mi FROM (SELECT 1 AS s,"
        " 5 AS e UNION ALL SELECT NULL, 9 UNION ALL SELECT 2, NULL"
        " UNION ALL SELECT 2, 6)"))
    assert got == (2,)


def test_randomized_vs_duckdb_sweep(spark):
    rng = random.Random(1441)
    con = duckdb.connect()
    for trial in range(5):
        rows = [(g, rng.randint(0, 20), rng.randint(1, 9))
                for g in range(3) for _ in range(rng.randint(1, 15))]
        vals = ", ".join(f"({g}, {s}, {s + d})" for g, s, d in rows)
        spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(g, s, e)"
        ).createOrReplaceTempView("mi_rand")
        con.execute("CREATE OR REPLACE TABLE mi_rand(g INT, s INT, e INT)")
        con.executemany(
            "INSERT INTO mi_rand VALUES (?, ?, ?)",
            [(g, s, s + d) for g, s, d in rows])
        got = sorted(tuple(r) for r in run_ch_sql(spark, (
            "SELECT g, maxIntersections(s, e) AS mi,"
            " maxIntersectionsPosition(s, e) AS mip"
            " FROM mi_rand GROUP BY g")).collect())
        want = sorted(con.execute("""
            WITH pts AS (SELECT g, u.p AS p, u.w AS w FROM mi_rand,
                   UNNEST([struct_pack(p := s::DOUBLE, w := 1),
                           struct_pack(p := e::DOUBLE, w := -1)]) AS t(u)),
            run AS (SELECT g, p, w,
                    sum(w) OVER (PARTITION BY g ORDER BY p, w
                                 ROWS UNBOUNDED PRECEDING) AS c,
                    row_number() OVER (PARTITION BY g ORDER BY p, w) AS rn
                    FROM pts),
            mx AS (SELECT g, max(c) AS m FROM run GROUP BY g)
            SELECT r.g, CAST(x.m AS BIGINT) AS mi, arg_min(r.p, r.rn) AS mip
            FROM run r JOIN mx x ON x.g = r.g AND r.c = x.m
            GROUP BY r.g, x.m""").fetchall())
        assert got == want, f"trial {trial}"


def test_arity_raise():
    with pytest.raises(UnsupportedChSql, match="start, end"):
        translate_ch_sql("SELECT maxIntersections(s) FROM t GROUP BY g")
    with pytest.raises(UnsupportedChSql, match="start, end"):
        translate_ch_sql(
            "SELECT maxIntersectionsPosition(s, e, x) FROM t GROUP BY g")


def test_window_plan_selected_and_fold_fallback_equal(spark):
    """r14 second phase: simple shapes plan the stateless window sweep
    (LATERAL VIEW + running sum — no collect_list); a sibling
    aggregate declines to the fold with MaxIntersectionsFoldWarning.
    Both paths produce identical values."""
    import warnings

    from transaq_clickhouse_exporter_spark.queries.ch_compat import (
        MaxIntersectionsFoldWarning,
    )

    t = translate_ch_sql(
        "SELECT g, maxIntersections(s, e) AS mi FROM t GROUP BY g")
    assert "LATERAL VIEW" in t and "collect_list" not in t
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t2 = translate_ch_sql(
            "SELECT g, count() AS c, maxIntersections(s, e) AS mi"
            " FROM t GROUP BY g")
    assert "collect_list" in t2
    assert any(issubclass(x.category, MaxIntersectionsFoldWarning)
               for x in w)

    spark.sql(
        "SELECT * FROM VALUES (1, 1, 5), (1, 2, 6), (1, 4, 7),"
        " (2, 1, 2), (2, 2, 3) AS t(g, s, e)"
    ).createOrReplaceTempView("mi_paths")
    win = sorted(tuple(r) for r in run_ch_sql(spark, (
        "SELECT g, maxIntersections(s, e) AS mi,"
        " maxIntersectionsPosition(s, e) AS mip"
        " FROM mi_paths GROUP BY g")).collect())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", MaxIntersectionsFoldWarning)
        fold = sorted(
            (r[0], r[2], r[3]) for r in run_ch_sql(spark, (
                "SELECT g, count() AS c, maxIntersections(s, e) AS mi,"
                " maxIntersectionsPosition(s, e) AS mip"
                " FROM mi_paths GROUP BY g")).collect())
    assert win == fold == [(1, 3, 4.0), (2, 1, 1.0)]
