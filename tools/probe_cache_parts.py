#!/usr/bin/env python3
"""Probe: how many RDD partitions does each cached shared view hold at
$SPARK_GRAFT_SF_DIR, and how many tasks does a scan of it therefore
get?  (VERDICT r16 item 2: cached fact views keep their 1-6 source
splits, capping the scan parallelism of everything routed through
them.)"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.queries import parity  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402
from transaq_clickhouse_exporter_spark.testdata import register_views  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="tce-probe-cache-parts")
    register_views(spark, sf_dir)
    parity.register_derived_views(spark, sf_dir)
    views = ("trades", "securities", "etf_codes", "ev", "trades_dup",
             "quotes_dup", "ticks", "documents", "doc_shingles",
             "doc_bands", "chunk_index")
    for v in views:
        df = spark.table(v)
        n = df.count()  # materialize the cache
        parts = df.rdd.getNumPartitions()
        print(f"{v:14s} rows={n:>9} cached_partitions={parts}")
    spark.stop()


if __name__ == "__main__":
    main()
