#!/usr/bin/env python3
"""Round-6 engine-operator rehearsal at 10M rows on local[32]:
compaction, HLL distinct, histogram quantiles, EMA — the operators
added this round, measured at the same scale as SCALE.md's original
10M-trade table.  Numbers land in SCALE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark import storage  # noqa: E402
from transaq_clickhouse_exporter_spark.functions.hll import hll_distinct  # noqa: E402
from transaq_clickhouse_exporter_spark.functions.quantiles import (  # noqa: E402
    quantile_sketch,
)
from transaq_clickhouse_exporter_spark.queries.analytics import ema  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {n} in {dt:.1f} s ({N / dt / 1e6:.1f}M rows/s)", flush=True)


def main() -> None:
    spark = get_spark(app="tce-scale-engine")
    trades = (
        spark.range(N)
        .select(
            F.timestamp_seconds(
                1734688800 + (F.col("id") % 5) * 86400 + (F.col("id") % 520) * 60
            ).alias("time"),
            (F.col("id") % 200 + 1).cast("int").alias("secid"),
            F.concat(
                F.lit("SEC"), F.lpad((F.col("id") % 200 + 1).cast("string"), 3, "0")
            ).alias("sec_code"),
            F.col("id").alias("trade_no"),
            F.lit("TQBR").alias("board"),
            (F.col("id") % 900 + 100).cast("float").alias("price"),
            (F.col("id") % 50 + 1).alias("quantity"),
            F.when(F.col("id") % 2 == 0, "B").otherwise("S").alias("buy_sell"),
            F.lit(0).alias("open_interest"),
            F.lit("N").alias("period"),
            F.col("id").alias("_ingest_seq"),
        )
        .cache()
    )
    print(f"rows: {trades.count()}", flush=True)

    timed(
        "HLL distinct trade_no by buy_sell (p=12)",
        lambda: hll_distinct(trades, "trade_no", ("buy_sell",), precision=12).count(),
    )
    timed(
        "histogram quantiles p50/p90/p99 of price by buy_sell",
        lambda: quantile_sketch(trades, "price", group_cols=("buy_sell",)).count(),
    )
    bars = (
        trades.groupBy("sec_code", (F.unix_timestamp("time") / 60).cast("long").alias("bucket_s"))
        .agg(F.max("price").cast("double").alias("close"))
        .cache()
    )
    nb = bars.count()
    t0 = time.perf_counter()
    ema(bars).count()
    print(
        f"EMA over {nb} minute bars (200 keys): {time.perf_counter() - t0:.1f} s",
        flush=True,
    )

    tmp = tempfile.mkdtemp(prefix="tce_compact_")
    try:
        path = os.path.join(tmp, "trades")
        t0 = time.perf_counter()
        # fragmented ingest: 4 appends x 32 files per day partition
        for _ in range(4):
            storage.write_table(
                trades.repartition(32), path, "transaq_trades"
            )
        t_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        report = storage.compact_table(spark, path, "transaq_trades")
        t_comp = time.perf_counter() - t0
        before = sum(b for b, _ in report.values())
        after = sum(a for _, a in report.values())
        print(
            f"compact_table: {before} -> {after} files over {len(report)} days "
            f"in {t_comp:.1f} s (fragmented 4x write took {t_write:.1f} s)",
            flush=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
