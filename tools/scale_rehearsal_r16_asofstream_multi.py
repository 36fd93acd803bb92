#!/usr/bin/env python3
"""Round-16 rehearsal: multi-right streaming as-of at 5M events with a
mid-stream KILL/RESTART.

Shape under test (the serve --enrich-trades shape, scaled, plus a
second right side):

  left  (trades): 2M rows over 10,000 keys, 4 replay chunks
  right1 (quotes): 2M rows, same keys/chunks
  right2 (wins):   1M rows, same keys/chunks

Run 1 sees chunks 0-1 only (availableNow drains what exists), the
query STOPS, chunks 2-3 land, run 2 resumes on the SAME checkpoint —
the per-side carry slots must survive the restart so post-restart
trades still match pre-restart quotes/wins.  Event time grows with
chunk index, honoring the order contract.

Asserted in-run: the stream digest (row count + per-side sums of the
matched timestamps and payloads over all 2M output rows) EXACTLY
equals the batch ``asof_join_multi`` on the union of all chunks.

State is ONE row per key (two carry slots in one struct): 10,000
state rows regardless of event volume — key-cardinality-bound exactly
like the candle builder, so at 100 TB the state store partitions on
the same security key the reference subscribes by.

Run: python tools/scale_rehearsal_r16_asofstream_multi.py  (~3 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.operators.asof import (  # noqa: E402
    asof_join_multi,
)
from transaq_clickhouse_exporter_spark.operators.asof_stream import (  # noqa: E402
    asof_join_stream_multi,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

KEYS = 10_000
N_LEFT_PER_CHUNK = 500_000
N_R1_PER_CHUNK = 500_000
N_R2_PER_CHUNK = 250_000
CHUNKS = 4
SPAN = 1_000_000  # per-chunk event-time span: chunk c covers [c*SPAN, …)

T_SCHEMA = "g int, t double, lv long"
Q_SCHEMA = "g int, qt double, price double"
W_SCHEMA = "g int, wt double, wv long"


def _chunk(spark, c: int):
    left = spark.range(N_LEFT_PER_CHUNK).select(
        (F.col("id") % KEYS).cast("int").alias("g"),
        (F.lit(float(c * SPAN)) + (F.col("id") * 7 % SPAN)).alias("t"),
        (F.col("id") % 97).alias("lv"),
    )
    r1 = spark.range(N_R1_PER_CHUNK).select(
        (F.col("id") % KEYS).cast("int").alias("g"),
        (F.lit(float(c * SPAN)) + (F.col("id") * 11 % SPAN)).alias("qt"),
        (F.col("id") % 89).cast("double").alias("price"),
    )
    r2 = spark.range(N_R2_PER_CHUNK).select(
        (F.col("id") % KEYS).cast("int").alias("g"),
        (F.lit(float(c * SPAN)) + (F.col("id") * 13 % SPAN)).alias("wt"),
        (F.col("id") % 83).alias("wv"),
    )
    return left, r1, r2


def main() -> int:
    spark = get_spark(app="r16-asofstream-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="r16_asofstream_")
    tdir, qdir, wdir = (os.path.join(base, d) for d in ("t", "q", "w"))
    sink, ck = os.path.join(base, "out"), os.path.join(base, "ck")

    def write_chunks(cs):
        for c in cs:
            l, r1, r2 = _chunk(spark, c)
            l.coalesce(2).write.parquet(f"{tdir}/c{c}")
            r1.coalesce(2).write.parquet(f"{qdir}/c{c}")
            r2.coalesce(2).write.parquet(f"{wdir}/c{c}")

    def run_stream():
        ts = (spark.readStream.schema(T_SCHEMA)
              .option("maxFilesPerTrigger", 2).parquet(f"{tdir}/c*"))
        qs = (spark.readStream.schema(Q_SCHEMA)
              .option("maxFilesPerTrigger", 2).parquet(f"{qdir}/c*"))
        ws = (spark.readStream.schema(W_SCHEMA)
              .option("maxFilesPerTrigger", 2).parquet(f"{wdir}/c*"))
        out = asof_join_stream_multi(
            ts, [(qs, "qt", "mqt"), (ws, "wt", "mwt")], by=["g"],
            left_ts="t")
        q = (out.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(900)

    t0 = time.time()
    write_chunks([0, 1])
    run_stream()                      # run 1: chunks 0-1, then STOPS
    write_chunks([2, 3])
    run_stream()                      # run 2: restart on same checkpoint
    wall = time.time() - t0

    def digest(df):
        return tuple(df.agg(
            F.count(F.lit(1)),
            F.sum("mqt"), F.sum("price"),
            F.sum("mwt"), F.sum("wv"),
        ).collect()[0])

    got = digest(spark.read.parquet(sink))

    lefts, r1s, r2s = [], [], []
    for c in range(CHUNKS):
        l, r1, r2 = _chunk(spark, c)
        lefts.append(l); r1s.append(r1); r2s.append(r2)
    from functools import reduce
    from pyspark.sql import DataFrame
    batch = asof_join_multi(
        reduce(DataFrame.unionAll, lefts),
        [(reduce(DataFrame.unionAll, r1s), "qt", "mqt"),
         (reduce(DataFrame.unionAll, r2s), "wt", "mwt")],
        by=["g"], left_ts="t")
    want = digest(batch)

    n_events = CHUNKS * (N_LEFT_PER_CHUNK + N_R1_PER_CHUNK + N_R2_PER_CHUNK)
    print(f"events={n_events:,} keys={KEYS:,} wall={wall:.1f}s "
          f"({n_events / wall / 1000:.0f}k ev/s incl. restart + sink)")
    print("stream digest:", got)
    print("batch  digest:", want)
    assert got == want, "stream digest != batch asof_join_multi"
    print("OK: digest equal across kill/restart")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
