#!/usr/bin/env python3
"""Round-6 session-3 rehearsal at 10M rows on local[32]: the five
operators added this session — sequenceMatch, native session windows,
shard export/manifest, SCD2 history, RANGE-frame trailing stats —
measured at the same scale as SCALE.md's other tables."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.datapipe.shards import (  # noqa: E402
    shard_manifest,
    verify_shards,
    write_training_shards,
)
from transaq_clickhouse_exporter_spark.functions.seqmatch import (  # noqa: E402
    sequence_match_summary,
)
from transaq_clickhouse_exporter_spark.operators.scd2 import scd2_history  # noqa: E402
from transaq_clickhouse_exporter_spark.operators.sessions import (  # noqa: E402
    session_windows,
)
from transaq_clickhouse_exporter_spark.queries.analytics import (  # noqa: E402
    trailing_time_stats,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {n} rows out in {dt:.1f} s ({N / dt / 1e6:.1f}M rows/s in)", flush=True)


def main() -> None:
    spark = get_spark(app="tce-scale-r6s3")

    # ---- events: 1M users, ~10 events each, 4 types, 1-day span
    events = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 1_000_000).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("event_type"),
            ((F.col("id") * 7919) % 86400).alias("ts_s"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        .cache()
    )
    print(f"events: {events.count()}", flush=True)

    timed(
        "sequenceMatch (?1).*(?2).*(?1) over 1M users",
        lambda: sequence_match_summary(
            events,
            "(?1).*(?2).*(?1)",
            [F.col("event_type") == "view", F.col("event_type") == "purchase"],
        ).count(),
    )
    timed(
        "session_windows gap=300s (native session_window, 1M keys)",
        lambda: session_windows(events, gap_seconds=300).count(),
    )
    events.unpersist()

    # ---- trades: RANGE-frame trailing stats + SCD2 on versioned quotes
    trades = (
        spark.range(N)
        .select(
            F.concat(
                F.lit("SEC"), F.lpad((F.col("id") % 200 + 1).cast("string"), 3, "0")
            ).alias("sec_code"),
            (1734688800 + (F.col("id") * 13) % 432000).alias("time_s"),
            (F.col("id") % 900 + 100).cast("double").alias("price"),
            (F.col("id") % 50 + 1).alias("quantity"),
            F.col("id").alias("_ingest_seq"),
        )
        .cache()
    )
    print(f"trades: {trades.count()}", flush=True)
    timed(
        "trailing_time_stats 300s RANGE frame (200 keys)",
        lambda: trailing_time_stats(trades, seconds=300).select(F.sum("vol_trailing")).collect() and N,
    )
    timed(
        "scd2_history (version collapse + change collapse + close)",
        lambda: scd2_history(
            trades, ("sec_code",), "time_s", ("price",), "_ingest_seq"
        ).count(),
    )
    trades.unpersist()

    # ---- docs: shard manifest at 10M ids; full shard write at 2M rows
    docs = spark.range(N).select(
        F.col("id").alias("doc_id"), (F.col("id") % 997).alias("n_chars")
    )
    timed(
        "shard_manifest 256 shards over 10M ids",
        lambda: shard_manifest(docs, "doc_id", 256, token_col="n_chars").count(),
    )
    small = docs.limit(2_000_000).withColumn(
        "text", F.repeat(F.lit("x"), (F.col("doc_id") % 64 + 16).cast("int"))
    )
    out = tempfile.mkdtemp(prefix="tce_shards_")
    try:
        t0 = time.perf_counter()
        write_training_shards(small, out, "doc_id", 64, token_col="n_chars")
        dt = time.perf_counter() - t0
        print(f"write_training_shards 2M rows -> 64 files: {dt:.1f} s", flush=True)
        t0 = time.perf_counter()
        bad = verify_shards(spark, out, "doc_id").count()
        print(
            f"verify_shards read-back: {bad} diffs in {time.perf_counter() - t0:.1f} s",
            flush=True,
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
