#!/usr/bin/env python3
"""Round-12 rehearsal: the constructs added/changed this round at
10M rows — intervalLengthSum's DEFAULT plan is now the stateless
window spelling (_preaggregate_ils), quantified subquery comparisons
(`> ANY (SELECT …)`) compile to scalar subqueries, and editDistance
runs the byte-fold shim on multi-byte rows.

Structural claims under test (SCALE.md):

* ``intervalLengthSum`` grouped 10M rows / 100k groups AND a
  1M-interval HOT group: the window plan collects NO per-group
  structs (r11 fold: O(group) state; the 9M hot group held ~150 MB
  in one task).  Plan-asserted collect_list-free.
* quantified ``> ANY`` / ``!= ALL`` over a 10M-row fact with a
  bounded subquery: each scalar subquery executes ONCE (Subquery
  nodes in the plan, a literal thereafter) — the fact never joins
  or shuffles for the comparison.
* ``editDistance`` multi-byte fold over 1M short strings vs the
  ASCII codegen path (levenshtein): the fold is the slow path by
  construction — the honest per-row cost at word-ish lengths.

Run: python tools/scale_rehearsal_round12.py   (local[32], ~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.queries.ch_compat import (  # noqa: E402
    run_ch_sql,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000


def timed(label: str, fn) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label:58} {dt:7.2f} s   rows={n}", flush=True)
    return dt


def main() -> None:
    spark = get_spark(app="tce-r12-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # intervals: 10M rows over 100k groups (panel-ish), plus a HOT
    # variant where 1M intervals land in ONE group
    spark.sql(
        f"SELECT id % 100000 AS g, CAST(id % 9973 AS DOUBLE) AS s,"
        f" CAST(id % 9973 AS DOUBLE) + 1 + (id % 13) AS e"
        f" FROM range({N})"
    ).createOrReplaceTempView("r12_iv")
    spark.sql(
        f"SELECT CASE WHEN id < 1000000 THEN 0 ELSE id END AS g,"
        f" CAST(id % 9973 AS DOUBLE) AS s,"
        f" CAST(id % 9973 AS DOUBLE) + 1 + (id % 13) AS e"
        f" FROM range({N})"
    ).createOrReplaceTempView("r12_iv_hot")
    spark.table("r12_iv").count()
    spark.table("r12_iv_hot").count()

    ils = ("SELECT g, intervalLengthSum(s, e) AS c FROM {t} GROUP BY g")
    df = run_ch_sql(spark, ils.format(t="r12_iv"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan, "ILS window plan regressed to the fold"
    print("ILS window plan: collect_list-free OK", flush=True)
    timed("intervalLengthSum window, 10M/100k groups",
          lambda: run_ch_sql(spark, ils.format(t="r12_iv"))
          .selectExpr("count(*) AS n", "sum(c)").collect()[0].n)
    timed("intervalLengthSum window, 1M-interval HOT group",
          lambda: run_ch_sql(spark, ils.format(t="r12_iv_hot"))
          .selectExpr("count(*) AS n", "sum(c)").collect()[0].n)

    # quantified comparisons over a 10M fact, bounded subquery ------
    spark.sql(
        f"SELECT id AS v, CAST(id % 100003 AS DOUBLE) AS price"
        f" FROM range({N})").createOrReplaceTempView("r12_fact")
    spark.sql(
        "SELECT CAST(id * 7 AS DOUBLE) AS p FROM range(1000)"
    ).createOrReplaceTempView("r12_dim")
    spark.table("r12_fact").count()
    q_any = ("SELECT count() AS c FROM r12_fact WHERE price > ANY"
             " (SELECT p FROM r12_dim)")
    df = run_ch_sql(spark, q_any)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" in plan and "SortMergeJoin" not in plan, plan[:500]
    print("quantified plan: scalar subqueries, no fact join OK", flush=True)
    timed("price > ANY (1k-row subquery) over 10M fact",
          lambda: run_ch_sql(spark, q_any).collect()[0].c and 1)
    q_all = ("SELECT count() AS c FROM r12_fact WHERE v != ALL"
             " (SELECT CAST(id * 11 AS BIGINT) FROM range(1000))")
    timed("v != ALL (membership, 1k-row subquery) over 10M",
          lambda: run_ch_sql(spark, q_all).collect()[0].c and 1)

    # editDistance byte fold vs ASCII codegen path ------------------
    spark.sql(
        "SELECT concat('слово', CAST(id % 97 AS STRING)) AS a,"
        "       concat('слива', CAST(id % 89 AS STRING)) AS b,"
        "       concat('word', CAST(id % 97 AS STRING)) AS c,"
        "       concat('ward', CAST(id % 89 AS STRING)) AS d"
        " FROM range(1000000)").createOrReplaceTempView("r12_str")
    spark.table("r12_str").count()
    timed("editDistance multi-byte FOLD, 1M rows",
          lambda: run_ch_sql(
              spark, "SELECT sum(editDistance(a, b)) AS s FROM r12_str"
          ).collect()[0].s and 1000000)
    timed("editDistance ASCII codegen path, 1M rows",
          lambda: run_ch_sql(
              spark, "SELECT sum(editDistance(c, d)) AS s FROM r12_str"
          ).collect()[0].s and 1000000)
    spark.stop()


if __name__ == "__main__":
    main()
