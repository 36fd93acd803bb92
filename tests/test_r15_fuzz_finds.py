"""Round-15 fuzz finds (VERDICT r14 item 5: six new composition
kinds — sequenceNextNode x ASOF/CTE, maxIntersections under set ops
and HAVING, WITH FILL x QUALIFY, WITH-scope shadowing).

The first focused run (seed 151510/144, a fill_qualify composition)
caught a REAL translator bug, pinned here: the multi-array lockstep
``ARRAY JOIN a AS x, b AS y`` zip rewrite replaced alias references
across its WHOLE block span INCLUDING nested subqueries — a nested
block defining the same identifier (its own single-array
``ARRAY JOIN a AS u``) had its alias-definition site clobbered into
invalid ``AS __zr_<uid>.a``.  The rewrite is now scoped to matches
whose enclosing select IS the zip's own block.
"""

from __future__ import annotations

import duckdb

from transaq_clickhouse_exporter_spark.queries.ch_compat import run_ch_sql


def test_zip_array_join_skips_nested_same_alias(spark):
    # inner block: single-array ARRAY JOIN aliased u; outer block:
    # zip form REUSING the name u — the outer rewrite must leave the
    # inner scope's u intact
    q = ("SELECT g, u + w AS v FROM (SELECT g, [v, v + 1] AS a,"
         " [v + 2, v + 3] AS b FROM (SELECT g, u AS v FROM"
         " (SELECT g, [v, v + 1] AS a FROM (SELECT number % 2 AS g,"
         " number AS v FROM numbers(5))) ARRAY JOIN a AS u))"
         " ARRAY JOIN a AS u, b AS w")
    got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
    # DuckDB mirror: UNNEST for the inner, 1-indexed lockstep spine
    # for the outer zip (the fuzzer's pinned array_join mirrors)
    dq = ("SELECT g, a[i] + b[i] AS v FROM (SELECT g, [v, v + 1] AS a,"
          " [v + 2, v + 3] AS b FROM (SELECT g, u AS v FROM"
          " (SELECT g, [v, v + 1] AS a FROM (SELECT number % 2 AS g,"
          " number AS v FROM (SELECT range AS number FROM range(5))))"
          " AS __aj CROSS JOIN UNNEST(a) AS __un(u)) __zz) AS __mj"
          " CROSS JOIN UNNEST(generate_series(1, 2)) AS __sp(i)")
    want = sorted(tuple(r) for r in duckdb.connect().execute(dq).fetchall())
    assert got == want and len(got) == 20


def test_zip_array_join_same_block_refs_still_rewrite(spark):
    # references in the zip's OWN block (select list, WHERE) still
    # rewrite to the zipped struct fields
    q = ("SELECT g, u + w AS v FROM (SELECT g, [v, v + 1] AS a,"
         " [v + 2, v + 3] AS b FROM (SELECT number % 2 AS g,"
         " number AS v FROM numbers(4))) ARRAY JOIN a AS u, b AS w"
         " WHERE u > 1")
    got = sorted(tuple(r) for r in run_ch_sql(spark, q).collect())
    dq = ("SELECT g, a[i] + b[i] AS v FROM (SELECT g, [v, v + 1] AS a,"
          " [v + 2, v + 3] AS b FROM (SELECT number % 2 AS g, number"
          " AS v FROM (SELECT range AS number FROM range(4)))) AS __mj"
          " CROSS JOIN UNNEST(generate_series(1, 2)) AS __sp(i)"
          " WHERE a[i] > 1")
    want = sorted(tuple(r) for r in duckdb.connect().execute(dq).fetchall())
    assert got == want and len(got) > 0
