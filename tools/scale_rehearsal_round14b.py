#!/usr/bin/env python3
"""Round-14 second rehearsal: the four dialect drains at 10M rows.

Structural claims under test (SCALE.md):

* ``maxIntersections`` WINDOW SWEEP at 10M intervals / 100k keys: the
  running-sum window parallelizes across keys (one sort partition per
  key — no whole-group array in a task), plus a HOT-KEY run (1M
  intervals in ONE key) measuring the inherent per-key prefix scan.
* ``exponentialMovingAverage`` at 10M points / 100k keys (bounded
  per-group fold state) and a 1M-point hot group — the collect_list
  fold's state is O(points per group) BY CONSTRUCTION; the hot run
  quantifies that honestly.
* ``largestTriangleThreeBuckets`` at 10M points / 10k groups,
  100-bucket downsample — collect per group (1k points) + an O(1)-size
  selection fold; output is 10k × 100 points.
* ``sequenceNextNode`` at 10M events / 100k users — the
  windowFunnel-fold shape: one ObjectHashAggregate, state = events per
  user.

Run: python tools/scale_rehearsal_round14b.py   (local[32], ~4 min)
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


def timed(label: str, fn) -> None:
    fn()  # warm
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label:64} {dt:7.2f} s   rows={n}", flush=True)


def main() -> None:
    spark = get_spark(app="tce-r14b-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
        f"SELECT id, id % 100000 AS k, CAST(id % 9973 AS DOUBLE) AS v"
        f" FROM range({N})"
    ).createOrReplaceTempView("r14b")

    # maxIntersections window sweep: intervals [id%m, +1..4), 100k keys
    timed("maxIntersections window sweep, 10M intervals / 100k keys",
          lambda: run_ch_sql(spark, (
              "SELECT k, maxIntersections(id % 1000, id % 1000 + 1 +"
              " id % 4) AS mi, maxIntersectionsPosition(id % 1000,"
              " id % 1000 + 1 + id % 4) AS mip"
              " FROM r14b GROUP BY k")).count())
    # hot key: 1M intervals in ONE key — the inherent per-key scan
    timed("maxIntersections window sweep, 1M-interval HOT key",
          lambda: run_ch_sql(spark, (
              "SELECT maxIntersections(id % 100000, id % 100000 + 1 +"
              " id % 7) AS mi FROM r14b WHERE id < 1000000")).count())

    # EMA: unique per-key times (id DIV 100000 is 0..99 per key)
    timed("exponentialMovingAverage, 10M points / 100k keys",
          lambda: run_ch_sql(spark, (
              "SELECT k, exponentialMovingAverage(1)(v, id DIV 100000)"
              " AS e FROM r14b GROUP BY k")).count())
    timed("exponentialMovingAverage, 1M-point HOT group",
          lambda: run_ch_sql(spark, (
              "SELECT exponentialMovingAverage(1)(v, id) AS e"
              " FROM r14b WHERE id < 1000000")).count())

    # LTTB: 10k groups x 1k points, 100-bucket downsample
    timed("largestTriangleThreeBuckets(100), 10M points / 10k groups",
          lambda: run_ch_sql(spark, (
              "SELECT g, size(largestTriangleThreeBuckets(100)(x, v))"
              " AS n FROM (SELECT id % 10000 AS g, CAST(id DIV 10000"
              " AS DOUBLE) AS x, v FROM r14b) z GROUP BY g")).count())

    # sequenceNextNode: 10M events / 100k users, unique per-user times
    timed("sequenceNextNode head+first_match, 10M events / 100k users",
          lambda: run_ch_sql(spark, (
              "SELECT k, sequenceNextNode('forward', 'head')(id DIV"
              " 100000, CAST(id % 5 AS String), id % 5 = 0, id % 5 = 0,"
              " id % 5 = 1) AS nh,"
              " sequenceNextNode('forward', 'first_match')(id DIV"
              " 100000, CAST(id % 5 AS String), id % 3 = 0, id % 5 = 2)"
              " AS nf FROM r14b GROUP BY k")).count())
    spark.stop()


if __name__ == "__main__":
    main()
