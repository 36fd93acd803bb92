"""Round-13 (VERDICT r12 item 4): session-cached probe for the Spark
InlineCTE landmine.  The ASOF bridge's def-bearing sides previously
paid an unconditional lazy localCheckpoint; now the checkpoint fires
only when the running Spark build actually exhibits the bug — a
future Spark upgrade restores the full-lineage path with no code
change.
"""
from __future__ import annotations

import duckdb
import pytest

from transaq_clickhouse_exporter_spark.queries import ch_compat
from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    _ICTE_MARKER,
    _spark_inline_cte_bug,
    run_ch_sql,
)


def test_probe_expected_value_matches_duckdb():
    """The probe's pinned expected result (0, 1) is the CORRECT answer
    for its composition — verified on DuckDB with the view inlined
    (DuckDB has no InlineCTE bug, so the inline form is ground
    truth)."""
    q = (
        "SELECT CAST(sum(v * g) AS BIGINT) AS s, count(*) AS c FROM"
        " (SELECT g, v FROM (WITH al1 AS (SELECT g, coalesce(v, 0)"
        " AS v FROM (SELECT range % 3 AS g, range AS v FROM range(6))),"
        " ar2 AS (SELECT g, coalesce(v, 0) + 1 AS rv"
        " FROM (SELECT range % 3 AS g, range AS v FROM range(9)))"
        " SELECT al1.g AS g, v + coalesce(rv, 0) AS v FROM al1"
        " LEFT JOIN ar2 USING (g))"
        " INTERSECT DISTINCT SELECT g, v FROM (WITH c3 AS (SELECT"
        " range % 4 AS g, CASE WHEN range % 7 = 6"
        " THEN NULL ELSE range END AS v FROM range(5))"
        " SELECT g, v FROM c3))"
    )
    assert duckdb.connect().execute(q).fetchall() == [(0, 1)]


def test_probe_detects_bug_on_this_build_and_caches(spark):
    """Spark 4.1.2 has the bug: the probe must report it, and cache
    the verdict in the session conf (no repeated probe cost)."""
    # clear any cached verdict so the probe actually runs here
    spark.conf.unset(_ICTE_MARKER)
    assert _spark_inline_cte_bug(spark) is True
    assert spark.conf.get(_ICTE_MARKER) == "buggy"
    # cached path returns without re-running (flip the conf to prove
    # the cache is what's read)
    spark.conf.set(_ICTE_MARKER, "clean")
    assert _spark_inline_cte_bug(spark) is False
    spark.conf.set(_ICTE_MARKER, "buggy")
    assert _spark_inline_cte_bug(spark) is True
    # no probe view leaked
    assert not [t.name for t in spark.catalog.listTables()
                if t.name.startswith("__ch_icte_probe_")]


ASOF_CTE_Q = (
    "WITH lhs AS (SELECT 1 AS g, 5 AS v UNION ALL SELECT 1, 9),"
    " rhs AS (SELECT 1 AS g, 4 AS rv UNION ALL SELECT 1, 7)"
    " SELECT g, v, rv FROM lhs ASOF JOIN rhs"
    " ON lhs.g = rhs.g AND lhs.v >= rhs.rv"
)
ASOF_CTE_WANT = [(1, 5, 4), (1, 9, 7)]


def test_buggy_build_keeps_checkpoint_fence(spark):
    """Current behavior unchanged on the broken build: a CTE-defined
    ASOF side truncates to a LogicalRDD (Scan ExistingRDD in the
    plan) and the values stay right."""
    spark.conf.set(_ICTE_MARKER, "buggy")
    df = run_ch_sql(spark, ASOF_CTE_Q)
    assert sorted(tuple(r) for r in df.collect()) == ASOF_CTE_WANT
    assert "ExistingRDD" in df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended")


def test_clean_build_restores_lineage(spark, monkeypatch):
    """On a fixed Spark (probe says clean) the def-bearing side keeps
    full lineage: no ExistingRDD scan in the plan, same values."""
    spark.conf.set(_ICTE_MARKER, "clean")
    try:
        df = run_ch_sql(spark, ASOF_CTE_Q)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "extended")
        assert "ExistingRDD" not in plan
        assert sorted(tuple(r) for r in df.collect()) == ASOF_CTE_WANT
    finally:
        spark.conf.set(_ICTE_MARKER, "buggy")
