#!/usr/bin/env python3
"""Capture ONE convergence-iteration plan of dp16's
connected_components loop (VERDICT r16 "What's wrong" #2: the
committed dp16 plans show only the post-localCheckpoint 2-node plan;
the claimed join shape — edges exchange-free on dst, shuffled-hash on
the labels side, no per-round sort — was not plan-evidenced).

Reproduces the loop body with the SAME inputs dp16 feeds it (the
near-dup pairs over `documents`) but explains the iteration
DataFrame INSTEAD of localCheckpoint-ing it.

Run: SPARK_GRAFT_SF_DIR=... python tools/dump_dp16_iteration_plan.py <out.txt>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.queries import parity  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402
from transaq_clickhouse_exporter_spark.testdata import register_views  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r17/dp16_iteration.txt"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="tce-dp16-iter-plan")
    register_views(spark, sf_dir)
    parity.register_derived_views(spark, sf_dir)

    from transaq_clickhouse_exporter_spark.datapipe import dedup as dd

    pairs = dd.minhash_near_dups(
        spark.table("documents"), threshold=0.5,
        banded=spark.table("doc_bands"), shingles=spark.table("doc_shingles"),
    ).select("id_a", "id_b")

    # === the loop body of connected_components, verbatim ===
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("dst")
        .persist()
    )
    edges.count()  # materialize, as the first-round job would
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    neighbor_min = (
        edges.join(labels.hint("shuffle_hash"), edges["dst"] == labels["node"])
        .select(F.col("src").alias("node"), F.col("comp"))
    )
    new_labels = (
        labels.unionAll(neighbor_min)
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        new_labels.explain("formatted")
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
