#!/usr/bin/env python3
"""Experiment: op07 one-grouped-scan partial states vs the three-scan
union form — values + side-by-side timing in one session."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.operators.aggregating import (  # noqa: E402
    finalize, partial_states)
from transaq_clickhouse_exporter_spark.queries import parity  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402
from transaq_clickhouse_exporter_spark.testdata import register_views  # noqa: E402


def old_form(s):
    t = s.table("trades")
    parts = [
        partial_states(
            t.filter(F.pmod(F.col("trade_no"), F.lit(3)) == i),
            ("sec_code",), sum_cols=("quantity",), min_cols=("price",),
            max_cols=("price",), hll_col="trade_no",
        )
        for i in range(3)
    ]
    states = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return finalize(states, ("sec_code",)).select(
        "sec_code", F.col("n").cast("long").alias("n_trades"),
        F.col("sum_quantity").cast("long").alias("sum_quantity"),
        "min_price", "max_price", "distinct_est")


def new_form(s):
    t = s.table("trades")
    states = partial_states(
        t.withColumn("__batch", F.pmod(F.col("trade_no"), F.lit(3))),
        ("sec_code", "__batch"), sum_cols=("quantity",), min_cols=("price",),
        max_cols=("price",), hll_col="trade_no",
    ).drop("__batch")
    return finalize(states, ("sec_code",)).select(
        "sec_code", F.col("n").cast("long").alias("n_trades"),
        F.col("sum_quantity").cast("long").alias("sum_quantity"),
        "min_price", "max_price", "distinct_est")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="tce-exp-op07")
    register_views(spark, sf_dir)
    parity.register_derived_views(spark, sf_dir)
    spark.table("trades").count()

    a = sorted(map(tuple, old_form(spark).collect()))
    b = sorted(map(tuple, new_form(spark).collect()))
    assert a == b, "MISMATCH"
    print("values identical,", len(a), "rows")

    def run(fn, label, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: median={statistics.median(ts):.3f} min={min(ts):.3f}")

    # interleave to cancel host drift
    run(old_form, "old 3-scan (warm)")
    run(new_form, "new 1-scan (warm)")
    run(old_form, "old 3-scan (again)")
    run(new_form, "new 1-scan (again)")
    spark.stop()


if __name__ == "__main__":
    main()
