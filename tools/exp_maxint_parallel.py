#!/usr/bin/env python3
"""Experiment: parallel two-level maxIntersections sweep vs the current
per-key window sweep (ev31 shape) at sf0.1.  Validates both the speed
and exact value equality before wiring into ch_compat."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.queries import parity  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402
from transaq_clickhouse_exporter_spark.testdata import register_views  # noqa: E402

CUR = """
SELECT board, CAST(max(__mi_c0) AS BIGINT) AS mi,
       max_by(__mi_p0, IF(__mi_c0 IS NULL, NULL,
              named_struct('c', __mi_c0, 'r', -__mi_r0))) AS mip
FROM (
  SELECT *,
         sum(__mi_ev0.w) OVER (PARTITION BY board ORDER BY __mi_ev0.p,
             __mi_ev0.w ROWS UNBOUNDED PRECEDING) AS __mi_c0,
         row_number() OVER (PARTITION BY board ORDER BY __mi_ev0.p,
             __mi_ev0.w) AS __mi_r0,
         __mi_ev0.p AS __mi_p0
  FROM trades
  LATERAL VIEW OUTER explode(
    CASE WHEN CAST(time_s AS DOUBLE) IS NOT NULL
          AND CAST(time_s + quantity * 60 AS DOUBLE) IS NOT NULL THEN
      array(struct(CAST(time_s AS DOUBLE) AS p, 1 AS w),
            struct(CAST(time_s + quantity * 60 AS DOUBLE) AS p, -1 AS w))
    END) __mi_lv0 AS __mi_ev0
) t GROUP BY board
"""

PAR = """
SELECT board, CAST(max(__mi_c0) AS BIGINT) AS mi,
       max_by(__mi_p0, IF(__mi_c0 IS NULL, NULL,
              named_struct('c', __mi_c0, 'r', -__mi_r0))) AS mip
FROM (
  SELECT board,
         (__mi_off0 + __mi_lpr0.c) AS __mi_c0,
         (__mi_roff0 + __mi_lpr0.r) AS __mi_r0,
         __mi_lpr0.p AS __mi_p0
  FROM (
    SELECT board, __mi_bkt0, __mi_lpr0,
           coalesce(sum(__mi_tot0) OVER (PARTITION BY board
               ORDER BY __mi_bkt0 ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS __mi_off0,
           coalesce(sum(__mi_cnt0) OVER (PARTITION BY board
               ORDER BY __mi_bkt0 ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), CAST(0 AS BIGINT)) AS __mi_roff0
    FROM (
      SELECT board, __mi_bkt0,
             coalesce(sum(__mi_ev0.w), 0) AS __mi_tot0,
             count(*) AS __mi_cnt0,
             max_by(named_struct('p', __mi_ev0.p, 'c', __mi_lc0,
                                 'r', __mi_lr0),
                    IF(__mi_lc0 IS NULL, NULL,
                       named_struct('c', __mi_lc0, 'r', -__mi_lr0)))
               AS __mi_lpr0
      FROM (
        SELECT board, __mi_bkt0, __mi_ev0,
               sum(__mi_ev0.w) OVER (PARTITION BY board, __mi_bkt0
                   ORDER BY __mi_ev0.p, __mi_ev0.w
                   ROWS UNBOUNDED PRECEDING) AS __mi_lc0,
               row_number() OVER (PARTITION BY board, __mi_bkt0
                   ORDER BY __mi_ev0.p, __mi_ev0.w) AS __mi_lr0
        FROM (
          SELECT board, __mi_ev0,
                 CASE WHEN __mi_ev0.p IS NULL THEN CAST(NULL AS INT)
                      WHEN isnan(__mi_ev0.p) THEN 63
                      WHEN __mi_b0.mx <= __mi_b0.mn THEN 0
                      ELSE LEAST(63, GREATEST(0,
                          CAST(floor((__mi_ev0.p - __mi_b0.mn) * 64.0
                                     / (__mi_b0.mx - __mi_b0.mn)) AS INT)))
                 END AS __mi_bkt0
          FROM (
            SELECT *,
               (SELECT named_struct(
                   'mn', CAST(LEAST(min(CAST(time_s AS DOUBLE)),
                              min(CAST(time_s + quantity * 60 AS DOUBLE)))
                              AS DOUBLE),
                   'mx', CAST(GREATEST(max(CAST(time_s AS DOUBLE)),
                              max(CAST(time_s + quantity * 60 AS DOUBLE)))
                              AS DOUBLE))
                FROM trades) AS __mi_b0
            FROM trades
            LATERAL VIEW OUTER explode(
              CASE WHEN CAST(time_s AS DOUBLE) IS NOT NULL
                    AND CAST(time_s + quantity * 60 AS DOUBLE) IS NOT NULL THEN
                array(struct(CAST(time_s AS DOUBLE) AS p, 1 AS w),
                      struct(CAST(time_s + quantity * 60 AS DOUBLE) AS p,
                             -1 AS w))
              END) __mi_lv0 AS __mi_ev0
          ) raw
        ) bucketed
      ) localw
      GROUP BY board, __mi_bkt0
    ) summ
  ) offs
) t GROUP BY board
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="tce-exp-maxint")
    register_views(spark, sf_dir)
    parity.register_derived_views(spark, sf_dir)
    spark.table("trades").count()

    def run(sql, label, reps=4):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            spark.sql(sql).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: first={ts[0]:.3f} median={statistics.median(ts[1:]):.3f}")

    a = spark.sql(CUR).orderBy("board").collect()
    b = spark.sql(PAR).orderBy("board").collect()
    print("CUR:", a)
    print("PAR:", b)
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "MISMATCH"
    print("values identical")
    run(CUR, "current per-key sweep")
    run(PAR, "parallel two-level sweep")
    spark.stop()


if __name__ == "__main__":
    main()
