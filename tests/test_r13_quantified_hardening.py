"""Round-13 (VERDICT r12 item 6): quantified-subquery hardening —
tuple left operands raise by name (the rewrite's single-column
subquery aliasing cannot express them; CH's tuple-quantifier NULL
semantics are unpinned in this sandbox), and CORRELATED subqueries
under every quantifier are value-pinned vs DuckDB, including empty
per-group sets and NULLs in the set.
"""
from __future__ import annotations

import duckdb
import pytest

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    UnsupportedChSql,
    run_ch_sql,
)


def test_tuple_left_operand_raises_by_name(spark):
    for q in (
        "SELECT (a, b) = ANY (SELECT 1, 2) AS r"
        " FROM (SELECT 1 AS a, 2 AS b)",
        "SELECT (a, b) != ALL (SELECT 1, 2) AS r"
        " FROM (SELECT 1 AS a, 2 AS b)",
        "SELECT 1 FROM (SELECT 1 AS a, 2 AS b)"
        " WHERE (a, b) > ANY (SELECT 0, 0)",
    ):
        with pytest.raises(UnsupportedChSql, match="tuple left operand"):
            run_ch_sql(spark, q)
    # a function call whose ARGUMENTS carry commas is NOT a tuple —
    # stays in the subset
    r = run_ch_sql(
        spark,
        "SELECT greatest(a, b) > ANY (SELECT 1) AS r"
        " FROM (SELECT 1 AS a, 2 AS b)",
    ).collect()[0]
    assert r.r is True
    # a parenthesized single expression is not a tuple either
    r = run_ch_sql(
        spark,
        "SELECT (a + b) > ANY (SELECT 2) AS r"
        " FROM (SELECT 1 AS a, 2 AS b)",
    ).collect()[0]
    assert r.r is True


#: fact rows (g, v) — g=3 has no subquery rows (empty set per group),
#: g=2's subquery set carries a NULL (undecided tail)
FACT = ("(SELECT * FROM (VALUES (1, 5), (1, 2), (2, 5), (2, NULL),"
        " (3, 7)) AS t(g, v))")
SUB = ("(VALUES (1, 3), (1, 4), (2, 5), (2, NULL)) AS u(g, rv)")


@pytest.mark.parametrize("quant", [
    "> ANY", ">= ANY", "< ANY", "<= ANY", "= ANY", "!= ANY",
    "> ALL", ">= ALL", "< ALL", "<= ALL", "= ALL", "!= ALL",
])
def test_correlated_quantified_vs_duckdb(spark, quant):
    """Every quantifier over a CORRELATED subquery (u.g = t.g),
    projected as a value so NULL/FALSE/TRUE all surface, matches
    DuckDB's native quantified comparison row for row."""
    q = (f"SELECT g, v, v {quant} (SELECT rv FROM {SUB}"
         f" WHERE u.g = t.g) AS r FROM {FACT} AS t ORDER BY g, v")
    got = [tuple(r) for r in run_ch_sql(spark, q).collect()]
    want = duckdb.connect().execute(q).fetchall()
    assert got == [tuple(r) for r in want], f"{quant}: {got} != {want}"


def test_correlated_quantified_in_where_vs_duckdb(spark):
    """Filter-position correlated quantifiers (the common shape).

    The oracle is DuckDB's PROJECTED evaluation filtered to r IS TRUE
    — not DuckDB's own WHERE-position result: DuckDB 1.0.0 is
    internally inconsistent on a NULL left operand under correlated
    ``= ANY`` (projected says NULL, ANSI-correct; filter position
    KEEPS the row, and its non-correlated filter drops it).  This
    engine answers the ANSI/projected way in both positions."""
    con = duckdb.connect()
    for quant in ("> ANY", "<= ALL", "= ANY", "!= ALL"):
        q = (f"SELECT g, v FROM {FACT} AS t WHERE v {quant}"
             f" (SELECT rv FROM {SUB} WHERE u.g = t.g)"
             " ORDER BY g, v")
        got = [tuple(r) for r in run_ch_sql(spark, q).collect()]
        proj = (f"SELECT g, v, v {quant} (SELECT rv FROM {SUB}"
                f" WHERE u.g = t.g) AS r FROM {FACT} AS t"
                " ORDER BY g, v")
        want = [(g, v) for g, v, r in con.execute(proj).fetchall()
                if r is True]
        assert got == want, f"{quant}: {got} != {want}"
    # the DuckDB filter-position inconsistency itself, pinned so a
    # DuckDB upgrade that fixes it surfaces here
    q = (f"SELECT g, v FROM {FACT} AS t WHERE v = ANY"
         f" (SELECT rv FROM {SUB} WHERE u.g = t.g) ORDER BY g, v")
    assert con.execute(q).fetchall() == [(2, 5), (2, None)]
