#!/usr/bin/env python3
"""Round-10 rehearsal (VERDICT r9 item 6): the LEFT ASOF bridge under
key skew at 10M rows.

op09's plan is union + ONE keyed window ordered by (ts, side) — the
shuffle partitions on the join key, so a hot key (one sec_code holding
50% of the quotes) lands its whole timeline in a single task whose
sort is the stage's critical path.  The op04 rehearsal covered INNER
at uniform keys; this one measures the LEFT form with

  left  (trades):  2M rows, uniform over 1,000 keys
  right (quotes): 10M rows, (a) uniform over 1,000 keys
                            (b) key 0 holds 5M rows (50%), the rest
                                uniform over keys 1..999

and a RANGE-SPLIT variant for (b): the hot key's timeline is cut into
TIME BUCKETS, the window runs per (key, bucket) — parallel again —
and each bucket's leading rows are patched with a carry-in (the last
right row of every earlier bucket, computed from a bucket-level
aggregate that is tiny: keys x buckets rows).  The carry-in join is a
broadcast; correctness is asserted against the unsplit result.

Run: python tools/scale_rehearsal_asofskew.py   (local[32], ~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.operators.asof import asof_join  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N_LEFT = 2_000_000
N_RIGHT = 10_000_000
N_KEYS = 1_000
BUCKETS = 64  # range-split granularity for the hot-key recipe


def timed(label: str, df: DataFrame) -> tuple[float, int, int]:
    t0 = time.perf_counter()
    row = df.agg(
        F.count("*").alias("n"),
        F.count("price").alias("matched"),
        F.sum(F.hash("k", "lts", "price")).alias("chk"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    print(f"{label:34} {dt:7.2f} s   rows={row.n}  matched={row.matched}"
          f"  chk={row.chk}", flush=True)
    return dt, row.matched, row.chk


def range_split_asof(left: DataFrame, right: DataFrame) -> DataFrame:
    """ASOF LEFT with the hot-key timeline cut into BUCKETS time
    ranges.  Window partitions on (k, bucket) — the hot key's sort
    parallelizes across BUCKETS tasks — then rows whose bucket has no
    earlier right row in-bucket take the carry-in: the latest right
    row of any EARLIER bucket, itself computed with a window over the
    per-bucket maxima (keys x BUCKETS rows, broadcast back)."""
    span = N_LEFT  # ts domain is [0, N_LEFT) for both sides here
    bsz = span // BUCKETS + 1
    l_b = left.withColumn("__b", (F.col("lts") / bsz).cast("int"))
    r_b = right.withColumn("__b", (F.col("rts") / bsz).cast("int"))
    # in-bucket ASOF via the same union+window trick
    joined = asof_join(
        l_b, r_b, by=["k", "__b"], left_ts="lts", right_ts="rts",
        right_ts_out="__mrts",
    )
    # carry-in: per (k, bucket), the last right row at-or-before the
    # bucket's end — cumulative over buckets, tiny relation
    per_bucket = r_b.groupBy("k", "__b").agg(
        F.max_by("price", "rts").alias("__ci_price"),
        F.max("rts").alias("__ci_rts"),
    )
    wb = (Window.partitionBy("k").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = per_bucket.select(
        "k", "__b",
        F.last("__ci_price", ignorenulls=True).over(wb).alias("__p_price"),
        F.last("__ci_rts", ignorenulls=True).over(wb).alias("__p_rts"),
    )
    out = joined.join(F.broadcast(carry), ["k", "__b"], "left")
    return out.select(
        "k", "lts",
        F.coalesce("price", "__p_price").alias("price"),
        F.coalesce("__mrts", "__p_rts").alias("mrts"),
    )


def main() -> None:
    spark = get_spark(app="tce-asofskew-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    left = spark.sql(
        f"SELECT id % {N_KEYS} AS k, id AS lts FROM range({N_LEFT})"
    )
    right_uniform = spark.sql(
        f"SELECT id % {N_KEYS} AS k, CAST(id % {N_LEFT} AS BIGINT) AS rts,"
        f" CAST(id AS DOUBLE) AS price FROM range({N_RIGHT})"
    )
    right_skew = spark.sql(
        f"SELECT CASE WHEN id < {N_RIGHT // 2} THEN 0"
        f" ELSE 1 + id % {N_KEYS - 1} END AS k,"
        f" CAST(id % {N_LEFT} AS BIGINT) AS rts,"
        f" CAST(id AS DOUBLE) AS price FROM range({N_RIGHT})"
    )
    for df in (left, right_uniform, right_skew):
        df.count()  # warm

    t_u, m_u, _ = timed(
        "LEFT ASOF, uniform keys",
        asof_join(left, right_uniform, by=["k"],
                  left_ts="lts", right_ts="rts"))
    t_s, m_s, _ = timed(
        "LEFT ASOF, 50% hot key",
        asof_join(left, right_skew, by=["k"],
                  left_ts="lts", right_ts="rts"))
    t_r, m_r, chk_r = timed(
        "LEFT ASOF, hot key, range-split",
        range_split_asof(left, right_skew))
    # correctness of the recipe vs the unsplit plan on the hot slice
    base = asof_join(left, right_skew, by=["k"],
                     left_ts="lts", right_ts="rts")
    diff = (
        range_split_asof(left, right_skew)
        .select("k", "lts", "price")
        .exceptAll(base.select("k", "lts", "price"))
        .count()
    )
    print(f"range-split vs unsplit diff rows: {diff} (must be 0)")
    print(f"skew/uniform wall ratio: {t_s / t_u:.2f}x; "
          f"range-split recovers to {t_r / t_u:.2f}x of uniform")
    spark.stop()
    if diff:
        sys.exit(1)


if __name__ == "__main__":
    main()
