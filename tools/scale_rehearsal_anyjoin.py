#!/usr/bin/env python3
"""Round-9f rehearsal: the ANY JOIN dedup bridge at 10M rows.

Measures the dialect's `ANY LEFT JOIN ... USING (k)` rewrite (right
side deduplicated with any_value(struct(*)) GROUP BY key — a hash
aggregate with map-side partials, chosen over a row_number window
whose shuffle grows with the duplication factor) against the plain
ALL join on a duplicate-heavy right side — the workload ANY JOIN
exists for.  The structural claim under test (SCALE.md): the dedup
exchange carries ~one row per (task, key), and the join's output
multiplicity drops to one row per key before the probe side streams,
so ANY beats ALL on duplicate-heavy dimensions while producing
|left| rows instead of |left| x dup_factor.

Run: python tools/scale_rehearsal_anyjoin.py   (local[32], ~1 min)
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

N_LEFT = 10_000_000
N_KEYS = 100_000          # right side: 100k keys x 20 duplicate rows
DUP = 20


def main() -> None:
    spark = get_spark(app="tce-anyjoin-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
        f"SELECT id AS rowid, id % {N_KEYS} AS k, id AS v "
        f"FROM range({N_LEFT})"
    ).createOrReplaceTempView("aj_left")
    spark.sql(
        f"SELECT id % {N_KEYS} AS k, id AS w FROM range({N_KEYS * DUP})"
    ).createOrReplaceTempView("aj_right")

    def timed(label: str, sql: str) -> float:
        t0 = time.perf_counter()
        [row] = run_ch_sql(spark, sql).collect()
        dt = time.perf_counter() - t0
        print(f"{label:28} {dt:7.2f} s   rows_out={row.c}", flush=True)
        return dt

    # warm both views
    spark.table("aj_left").count()
    spark.table("aj_right").count()

    timed("ALL JOIN (baseline)",
          "SELECT count() AS c FROM aj_left ALL LEFT JOIN aj_right"
          " USING (k)")
    timed("ANY JOIN (dedup bridge)",
          "SELECT count() AS c FROM aj_left ANY LEFT JOIN aj_right"
          " USING (k)")
    # the shape a user would otherwise hand-write
    timed("hand-written dedup",
          "SELECT count() AS c FROM aj_left LEFT JOIN (SELECT k,"
          " min(w) AS w FROM aj_right GROUP BY k) r USING (k)")
    spark.stop()


if __name__ == "__main__":
    main()
