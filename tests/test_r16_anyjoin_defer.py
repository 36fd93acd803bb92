"""Round-16 optimization: eager aggregation through a literal-dim ANY
LEFT JOIN (``_defer_any_left_join``) — the fact side aggregates first
(plain HashAggregate; ``any()``→``first()`` no longer rides the big
aggregate forcing SortAggregate over the whole fact), then the ANY
LEFT JOIN attaches the dim to the finished groups.  Sound because the
USING keys are a subset of the GROUP BY keys, so every row of a group
carries the same single attached right row."""
from __future__ import annotations

import duckdb

from transaq_clickhouse_exporter_spark.queries.ch_compat import (
    _defer_any_left_join,
    run_ch_sql,
)

_Q = ("SELECT g, k, CAST(sum(v) AS BIGINT) AS s, any(b.lab) AS lab"
      " FROM facts ANY LEFT JOIN ("
      "  SELECT 1 AS g, 'one' AS lab UNION ALL SELECT 1, 'one'"
      "  UNION ALL SELECT 2, 'two') AS b USING (g)"
      " WHERE v > 0 GROUP BY g, k ORDER BY g, k")


def test_defer_rewrites_supported_shape():
    out = _defer_any_left_join(_Q)
    assert out != _Q
    assert "FROM (SELECT g, k, CAST(sum(v) AS BIGINT) AS s FROM facts" in out
    assert "b.lab AS lab" in out
    assert out.index("GROUP BY g, k)") < out.index("ANY LEFT JOIN")
    assert "ORDER BY g, k" in out


def test_defer_declines_unsafe_shapes():
    for q in (
        # USING key not among the GROUP BY keys
        _Q.replace("GROUP BY g, k", "GROUP BY k"),
        # right side references outside any()
        _Q.replace("any(b.lab) AS lab", "max(b.lab) AS lab"),
        # unaliased any() item (output name would change)
        _Q.replace("any(b.lab) AS lab", "any(b.lab)"),
        # right side reads a table (output columns not enumerable)
        _Q.replace("SELECT 2, 'two'", "SELECT g, lab FROM dim"),
        # WHERE touches the right side
        _Q.replace("WHERE v > 0", "WHERE b.lab <> 'x'"),
        # HAVING present
        _Q.replace(" ORDER BY g, k", " HAVING sum(v) > 1 ORDER BY g, k"),
        # bare right column in the select list
        _Q.replace("any(b.lab) AS lab", "lab AS lab"),
        # tail references a non-output column
        _Q.replace("ORDER BY g, k", "ORDER BY v"),
    ):
        assert _defer_any_left_join(q) == q, q


def test_deferred_results_match_duckdb(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 'a', 5), (1, 'a', 7), (1, 'b', 2),"
        " (2, 'a', 3), (3, 'c', 9), (1, 'a', -4) AS facts(g, k, v)"
    ).createOrReplaceTempView("facts")
    got = [tuple(r) for r in run_ch_sql(spark, _Q).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE facts AS SELECT * FROM (VALUES"
                " (1, 'a', 5), (1, 'a', 7), (1, 'b', 2), (2, 'a', 3),"
                " (3, 'c', 9), (1, 'a', -4)) t(g, k, v)")
    dq = ("SELECT g, k, CAST(sum(v) AS BIGINT) AS s, any_value(b.lab) AS lab"
          " FROM facts LEFT JOIN (SELECT DISTINCT * FROM ("
          "  SELECT 1 AS g, 'one' AS lab UNION ALL SELECT 1, 'one'"
          "  UNION ALL SELECT 2, 'two')) AS b USING (g)"
          " WHERE v > 0 GROUP BY g, k ORDER BY g, k")
    want = [tuple(r) for r in con.execute(dq).fetchall()]
    # g=3 has no dim row -> NULL lab survives the deferral identically
    assert got == want == [
        (1, "a", 12, "one"), (1, "b", 2, "one"),
        (2, "a", 3, "two"), (3, "c", 9, None)]


def test_deferred_plan_hash_aggregates_fact(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 'a', 5), (2, 'a', 3) AS facts(g, k, v)"
    ).createOrReplaceTempView("facts")
    df = run_ch_sql(spark, _Q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fact aggregate is hash-based now (the pre-deferral shape had
    # NO HashAggregate at all: sum+first rode one SortAggregate; the
    # only SortAggregate left is the literal dim's any_value dedup)
    assert "HashAggregate" in plan
