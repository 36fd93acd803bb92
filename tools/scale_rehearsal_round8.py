#!/usr/bin/env python3
"""Round-8 skew rehearsal (VERDICT r7 item 7): the LSH band-bucket
self-join with a deliberately HOT bucket at 10M-doc scale.

Shape isolated on purpose: 10M banded rows with UNIQUE cold buckets
(zero cold pairs) plus ONE viral (band, bucket) holding HOT_M docs, so
the unsalted join funnels the entire m^2/2 pair enumeration through the
single reducer that owns that key — the exact critical path a viral
near-dup cluster creates at 100 TB.  The salted variant
(`dedup._pairs_from_banded(salt_buckets=g)`) spreads that enumeration
over g reducers at the cost of replicating the right side g times.

Run: python tools/scale_rehearsal_round8.py   (local[32], ~2 min)
Results are recorded in SCALE.md ("Round-8 rehearsal").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.datapipe.dedup import (  # noqa: E402
    _pairs_from_banded,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N_COLD = 10_000_000
HOT_M = 6_000  # one bucket -> 17,997,000 candidate pairs


def main() -> None:
    spark = get_spark(app="tce-skew-rehearsal")
    cold = spark.range(N_COLD).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 16).cast("int").alias("band"),
        F.col("id").alias("bucket"),  # unique -> no cold pairs
    )
    hot = spark.range(HOT_M).select(
        (F.lit(N_COLD) + F.col("id")).alias("doc_id"),
        F.lit(0).cast("int").alias("band"),
        F.lit(-1).cast("long").alias("bucket"),
    )
    banded = cold.unionByName(hot)
    banded.write.mode("overwrite").parquet("/tmp/tce_skew_banded")
    banded = spark.read.parquet("/tmp/tce_skew_banded")
    want = HOT_M * (HOT_M - 1) // 2

    results = {}
    for label, g in (("unsalted", None), ("salt=8", 8), ("salt=32", 32)):
        t0 = time.perf_counter()
        n = _pairs_from_banded(banded, salt_buckets=g).count()
        dt = time.perf_counter() - t0
        assert n == want, (label, n, want)
        results[label] = dt
        print(f"{label:10s} pairs={n:,} wall={dt:.1f}s", flush=True)
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
