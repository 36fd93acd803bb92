#!/usr/bin/env python3
"""Round-11 rehearsal: the query-level bridges added this round at
10M rows — LIMIT n WITH TIES (rank wrapper), WITH FILL … INTERPOLATE
(LOCF window), and intervalLengthSum (sorted merge fold).

Structural claims under test (SCALE.md):

* ``LIMIT 1000 WITH TIES`` over 10M rows: the rank() wrapper should
  plan a WindowGroupLimit with a PARTIAL (map-side) phase — rank is
  one of InferWindowGroupLimit's supported functions — so the
  exchange carries ≈tasks·limit rows, not all 10M.
* ``WITH FILL … INTERPOLATE`` over a RAW 10M-row single series: the
  documented worst case (one unpartitioned LOCF window over
  input+grid rows).  WITH FILL is a single-series chart construct —
  the honest number shows what feeding it raw rows costs, and why
  keyed series at scale use functions/fill.fill_gaps.
* ``intervalLengthSum`` state is O(intervals per group) — fine at
  panel-sized groups (100 intervals), measured honestly at a
  1M-interval HOT group (the topK-fallback shape; the window
  spelling from the ev26 oracle is the escape hatch).

Run: python tools/scale_rehearsal_round11.py   (local[32], ~4 min)
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
    print(f"{label:52} {dt:7.2f} s   rows={n}", flush=True)
    return dt


def main() -> None:
    spark = get_spark(app="tce-r11-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
        f"SELECT id % 100000 AS g, id AS v, CAST(id % 997 AS DOUBLE)"
        f" AS x FROM range({N})"
    ).createOrReplaceTempView("r11_t")
    spark.table("r11_t").count()  # warm the scan

    # -- LIMIT WITH TIES: rank wrapper plan + wall ------------------
    ties_sql = "SELECT x, v FROM r11_t ORDER BY x LIMIT 1000 WITH TIES"
    plan = run_ch_sql(spark, ties_sql)._jdf.queryExecution() \
        .executedPlan().toString()
    has_wgl = "WindowGroupLimit" in plan and "Partial" in plan
    print(f"WITH TIES plan: WindowGroupLimit partial = {has_wgl}",
          flush=True)
    timed("LIMIT 1000 WITH TIES over 10M rows",
          lambda: run_ch_sql(spark, ties_sql).count())
    timed("plain ORDER BY + LIMIT 1000 (reference)",
          lambda: run_ch_sql(
              spark, "SELECT x, v FROM r11_t ORDER BY x LIMIT 1000"
          ).count())

    # -- WITH FILL INTERPOLATE over a RAW 10M-row series ------------
    # ~40% absent minutes on a 10M-point axis is not a chart — the
    # honest worst case for the unpartitioned LOCF window
    spark.sql(
        f"SELECT id * 2 AS m, CAST(id AS DOUBLE) AS val"
        f" FROM range({N // 4})"
    ).createOrReplaceTempView("r11_fill")
    # .count() would PRUNE the LOCF/fill columns — aggregate over
    # them so the measured plan actually evaluates the windows
    timed("WITH FILL INTERPOLATE, 2.5M-row series (5M grid)",
          lambda: run_ch_sql(
              spark,
              "SELECT m, val FROM r11_fill ORDER BY m WITH FILL"
              " STEP 1 INTERPOLATE (val)"
          ).selectExpr("count(*) AS n", "sum(val)").collect()[0].n)
    timed("same series, plain WITH FILL (no LOCF window)",
          lambda: run_ch_sql(
              spark,
              "SELECT m, val FROM r11_fill ORDER BY m WITH FILL"
              " STEP 1"
          ).selectExpr("count(*) AS n", "sum(val)").collect()[0].n)

    # -- intervalLengthSum: panel-sized groups vs one hot group -----
    timed("intervalLengthSum, 10M rows / 100k groups (~100/group)",
          lambda: run_ch_sql(
              spark,
              "SELECT g, intervalLengthSum(v, v + 150000) AS l"
              " FROM r11_t GROUP BY g"
          ).selectExpr("count(*) AS n", "sum(l)").collect()[0].n)
    spark.sql(
        f"SELECT CASE WHEN id % 10 < 9 THEN 0 ELSE id % 100000 END"
        f" AS g, id AS v FROM range({N // 1})"
    ).createOrReplaceTempView("r11_hot")
    timed("intervalLengthSum, 9M-interval HOT group (fold state)",
          lambda: run_ch_sql(
              spark,
              "SELECT g, intervalLengthSum(v, v + 5) AS l"
              " FROM r11_hot GROUP BY g"
          ).selectExpr("count(*) AS n", "sum(l)").collect()[0].n)
    # the escape hatch: the ev26-oracle window spelling, same values
    timed("window spelling of the same union length (escape hatch)",
          lambda: spark.sql(
              "SELECT g, sum(CASE WHEN cover IS NULL OR s >= cover"
              " THEN e - s WHEN e > cover THEN e - cover ELSE 0 END)"
              " AS l FROM (SELECT g, v AS s, v + 5 AS e,"
              " max(v + 5) OVER (PARTITION BY g ORDER BY v"
              " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
              " AS cover FROM r11_hot) GROUP BY g"
          ).selectExpr("count(*) AS n", "sum(l)").collect()[0].n)
    print("round-11 rehearsal complete", flush=True)


if __name__ == "__main__":
    main()
