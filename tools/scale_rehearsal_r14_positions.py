#!/usr/bin/env python3
"""Round-14 rehearsal (VERDICT r13 item 6): the positions snapshot
merge (O-11, ``in04``) at 10M updates / 100k clients — the only
O-operator family without a 10M SCALE.md row until now.

Claims under test:

* ``merge_positions`` (batch twin): one shuffle on the client key,
  map-side partial ``max_by`` per field — scan-shaped at any scale.
* ``merge_positions_stream`` (GroupState): 10M updates stream through
  ``applyInPandasWithState`` in several micro-batches; the state store
  holds exactly ONE row per distinct client (100k rows — verified via
  lastProgress stateOperators), NOT per update; NoTimeout means state
  is bounded by client cardinality, which the reference caps at ONE
  in-memory struct (process.go:74-102) — 100k is already 100,000x its
  envelope.
* RESTART-EQUALITY at scale: the stream is killed after phase 1
  (first half of the files), rebuilt on the SAME checkpoint for
  phase 2, and the final per-client snapshot must equal the batch
  twin over all 10M updates byte-for-byte — the state store carried
  100k merged snapshots across the restart.

Ordering contract: the stream fold takes last-non-null by seq WITHIN a
micro-batch and trusts ordered delivery ACROSS micro-batches (the
reference's TCP stream gives the same guarantee); the rehearsal writes
seq-range-disjoint files with increasing mtimes so the file source
delivers them in order.

Run: python tools/scale_rehearsal_r14_positions.py   (local[32], ~3 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.ingest.positions import (  # noqa: E402
    merge_positions,
    merge_positions_stream,
)
from transaq_clickhouse_exporter_spark.schemas import (  # noqa: E402
    POSITIONS_SNAPSHOT_FIELDS,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000
CLIENTS = 100_000
FILES_PER_PHASE = 4


def build_updates(spark):
    """10M updates, 100k clients, seq = global id (per-client
    increasing); each field present on ~1/4 of updates, value encodes
    (field, seq) so equality checks are exact."""
    df = spark.range(N).select(
        F.concat(F.lit("c"), (F.col("id") % CLIENTS)).alias("client"),
        F.col("id").alias("seq"),
        *[
            F.when(
                F.pmod(F.xxhash64(F.col("id"), F.lit(f)), F.lit(4)) == 0,
                F.concat(F.lit(f[:4]), F.lit("_"), F.col("id")),
            ).alias(f)
            for f in POSITIONS_SNAPSHOT_FIELDS
        ],
    )
    return df


def write_phase(df, lo, hi, out_dir, mtime0):
    """Write [lo, hi) as FILES_PER_PHASE seq-range files with
    increasing mtimes (file-source delivery order = seq order)."""
    step = (hi - lo) // FILES_PER_PHASE
    for k in range(FILES_PER_PHASE):
        a, b = lo + k * step, (lo + (k + 1) * step if k < FILES_PER_PHASE - 1 else hi)
        part = df.filter((F.col("seq") >= a) & (F.col("seq") < b))
        tmp = out_dir + f"/__tmp{k}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = f"{out_dir}/part-{lo:09d}-{k}.parquet"
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (mtime0 + k, mtime0 + k))


def run_stream(spark, src_dir, ckpt, out_dir, schema):
    """Update-mode emissions land in parquet via foreachBatch (the
    memory sink cannot recover from a checkpoint — foreachBatch can)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = merge_positions_stream(stream, list(POSITIONS_SNAPSHOT_FIELDS))

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    state_rows = None
    if progress and progress.get("stateOperators"):
        state_rows = progress["stateOperators"][0].get("numRowsTotal")
    return state_rows


def main() -> None:
    spark = get_spark(app="tce-r14-positions-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r14pos_")
    src_dir, ckpt = work + "/src", work + "/ckpt"
    os.makedirs(src_dir)

    updates = build_updates(spark)
    updates.write.mode("overwrite").parquet(work + "/all")
    all_df = spark.read.parquet(work + "/all")
    schema = all_df.schema

    t0 = time.perf_counter()
    batch = {
        r["client"]: tuple(r[f] for f in POSITIONS_SNAPSHOT_FIELDS)
        for r in merge_positions(all_df).collect()
    }
    t_batch = time.perf_counter() - t0
    print(f"batch merge_positions 10M/100k: {t_batch:.2f} s, "
          f"{len(batch)} clients", flush=True)

    # phase 1: first half of the updates
    out_dir = work + "/emit"
    write_phase(all_df, 0, N // 2, src_dir, mtime0=1_000)
    t0 = time.perf_counter()
    run_stream(spark, src_dir, ckpt, out_dir, schema)
    t_p1 = time.perf_counter() - t0
    print(f"stream phase 1 (5M updates, {FILES_PER_PHASE} batches): "
          f"{t_p1:.2f} s", flush=True)

    # KILL: the phase-1 query object is gone; phase 2 rebuilds the
    # identical query on the SAME checkpoint — source offsets + 100k
    # state rows must be restored
    write_phase(all_df, N // 2, N, src_dir, mtime0=2_000)
    t0 = time.perf_counter()
    state_rows = run_stream(spark, src_dir, ckpt, out_dir, schema)
    t_p2 = time.perf_counter() - t0
    print(f"stream phase 2 (restart, 5M updates): {t_p2:.2f} s, "
          f"state rows={state_rows}", flush=True)
    assert state_rows == CLIENTS, f"state store holds {state_rows}, want {CLIENTS}"

    # the LAST emission per client (highest last_seq) is the final
    # snapshot; every client re-emits in phase 2 by construction
    from pyspark.sql.window import Window

    final = {
        r["client"]: tuple(r[f] for f in POSITIONS_SNAPSHOT_FIELDS)
        for r in spark.read.parquet(out_dir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("client").orderBy(F.desc("last_seq"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert len(final) == CLIENTS, f"stream emitted {len(final)} clients"
    mismatches = [c for c in batch if batch[c] != final.get(c)]
    assert not mismatches, f"{len(mismatches)} clients diverge, e.g. {mismatches[:3]}"
    print("RESTART-EQUALITY: stream-across-restart == batch twin "
          f"for all {CLIENTS} clients", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
