#!/usr/bin/env python3
"""Round-8 rehearsal: the topK/topKWeighted dialect pre-aggregation
(ch_compat._preaggregate_topk) vs the n-sized expression fallback at
10M rows, 200 distinct values.  Results recorded in SCALE.md.

Run: python tools/scale_rehearsal_topk.py   (local[32], ~7 min —
the ungrouped fallback alone is >5 min; that IS the finding)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.queries import ch_compat as cc  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000

Q_UNGROUPED = (
    "SELECT CAST(pos + 1 AS BIGINT) AS rnk, col AS sec_code FROM "
    "(SELECT posexplode(t) FROM "
    "(SELECT topKWeighted(10)(sec_code, quantity) AS t FROM trades))"
)
Q_GROUPED = "SELECT g, topK(5)(sec_code) AS t, sum(quantity) AS q FROM trades GROUP BY g"


def main() -> None:
    spark = get_spark(app="tce-topk-rehearsal")
    spark.range(N).select(
        F.concat(
            F.lit("SEC"),
            F.lpad(((F.col("id") * 7919) % 200).cast("string"), 3, "0"),
        ).alias("sec_code"),
        ((F.col("id") % 50) + 1).alias("quantity"),
        (F.col("id") % 16).alias("g"),
    ).write.mode("overwrite").parquet("/tmp/tce_topk_rehearsal")
    spark.read.parquet("/tmp/tce_topk_rehearsal").createOrReplaceTempView("trades")

    for label, q in (("ungrouped-w", Q_UNGROUPED), ("grouped", Q_GROUPED)):
        for mode in ("preagg", "fallback"):
            orig = cc._preaggregate_topk
            if mode == "fallback":
                cc._preaggregate_topk = lambda s: s
            try:
                t0 = time.perf_counter()
                rows = cc.run_ch_sql(spark, q).collect()
                dt = time.perf_counter() - t0
                print(f"{label:12s} {mode:9s} wall={dt:.1f}s rows={len(rows)}",
                      flush=True)
            finally:
                cc._preaggregate_topk = orig


if __name__ == "__main__":
    main()
