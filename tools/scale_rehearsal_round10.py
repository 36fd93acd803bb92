#!/usr/bin/env python3
"""Round-10 rehearsal: the query-level bridges added this round at
10M rows — LIMIT n BY (row_number rewrite) and WITH FILL (spine +
anti-join insert).

Structural claims under test (SCALE.md):

* ``LIMIT 3 BY g`` over 10M rows / 100k groups: the row_number
  rewrite plans a WindowGroupLimit with a PARTIAL (map-side) phase,
  so the exchange carries ≈ 3·groups rows, not all 10M — compared
  against the same result spelled as a full sort (no per-group
  limit pushdown).
* ``WITH FILL`` over a sparse 10M-row aggregate producing a ~170k
  bucket axis: the localCheckpoint'd base plan computes ONCE; the
  spine/anti-join/union legs are grid-sized (the chart axis), never
  input-sized.

Run: python tools/scale_rehearsal_round10.py   (local[32], ~2 min)
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
GROUPS = 100_000


def timed(label: str, fn) -> float:
    fn()  # warm: shuffle files, codegen, JIT — kill run-order bias
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label:36} {dt:7.2f} s   rows={n}", flush=True)
    return dt


def main() -> None:
    spark = get_spark(app="tce-r10-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
        f"SELECT id % {GROUPS} AS g, id AS v, CAST(id % 1000000 AS"
        f" BIGINT) AS t FROM range({N})"
    ).createOrReplaceTempView("r10_t")
    spark.table("r10_t").count()  # warm

    # -- LIMIT BY: WindowGroupLimit partial prunes map-side ----------
    lb_sql = ("SELECT g, v FROM r10_t ORDER BY g, v LIMIT 3 BY g")
    plan = run_ch_sql(spark, lb_sql)._jdf.queryExecution().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, (
        "LIMIT BY rewrite lost the map-side WindowGroupLimit")
    t_lb = timed("LIMIT 3 BY g (bridge)",
                 lambda: run_ch_sql(spark, lb_sql).count())
    # baseline: the same rows via a full global sort + per-group rank
    # WITHOUT the group-limit pushdown (disable the optimization)
    spark.conf.set("spark.sql.optimizer.excludedRules",
                   "org.apache.spark.sql.catalyst.optimizer"
                   ".InferWindowGroupLimit")
    t_base = timed("same, WindowGroupLimit disabled",
                   lambda: run_ch_sql(spark, lb_sql).count())
    spark.conf.unset("spark.sql.optimizer.excludedRules")

    # -- WITH FILL: grid-sized legs over a 10M-row base --------------
    # v % 97 keeps ~103k of 10M rows spread over a 166k-bucket axis →
    # ~40% of buckets genuinely absent (real gaps to materialize)
    wf_sql = ("SELECT intDiv(t, 6) * 6 AS b, CAST(sum(v) AS BIGINT)"
              " AS sv FROM r10_t WHERE v % 97 = 0 GROUP BY b"
              " ORDER BY b WITH FILL STEP 6")
    t_wf = timed("WITH FILL over 10M (166k buckets)",
                 lambda: run_ch_sql(spark, wf_sql).count())
    t_nf = timed("same aggregate, no fill",
                 lambda: run_ch_sql(spark, wf_sql.split(" WITH FILL")[0])
                 .count())

    print(f"LIMIT BY pushdown speedup: {t_base / t_lb:.2f}x; "
          f"WITH FILL overhead over the bare aggregate: "
          f"{t_wf / t_nf:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
