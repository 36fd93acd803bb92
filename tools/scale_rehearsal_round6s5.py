#!/usr/bin/env python3
"""Round-6 session-5 rehearsal on local[32]: the operators added this
session — sliding-window chunking, the hashed chunk index + doc
search, the retention aggregate, and the dialect-layer windowFunnel /
sequenceCount / topK expansions — measured at 10M events / a 50k-doc
(10× bench) corpus, the same scales as SCALE.md's other tables."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.datapipe.chunking import (  # noqa: E402
    chunk_documents,
)
from transaq_clickhouse_exporter_spark.datapipe.retrieval import (  # noqa: E402
    build_chunk_index,
    doc_search,
)
from transaq_clickhouse_exporter_spark.functions.funnel import (  # noqa: E402
    retention_flags,
)
from transaq_clickhouse_exporter_spark.queries.ch_compat import (  # noqa: E402
    run_ch_sql,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N = 10_000_000


def timed(label, n_in, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(
        f"{label}: {n} rows out in {dt:.1f} s ({n_in / dt / 1e6:.1f}M rows/s in)",
        flush=True,
    )


def main() -> None:
    spark = get_spark(app="tce-scale-r6s5")

    # ---- 50k-doc corpus: every sf0.1 doc replicated 10× (the
    # datapipe rehearsal's corpus shape), ~200 tokens/doc
    docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(10).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"), "text"
        )
    )
    docs.cache().count()
    n_docs = 50_000

    timed("chunk_documents 50k docs", n_docs,
          lambda: chunk_documents(docs, size=64, stride=48).count())

    idx = build_chunk_index(docs, size=64, stride=48, dim=16)
    idx.cache()
    timed("build_chunk_index 50k docs", n_docs, idx.count)

    q = (
        idx.filter((F.col("doc_id") % 991 == 5) & (F.col("chunk_idx") == 0))
        .select(F.col("doc_id").alias("query_id"), "embedding")
    )
    nq = q.count()
    timed(f"doc_search {nq} queries x index", idx.count(),
          lambda: doc_search(idx, q, k=10).count())

    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        doc_search_lsh,
    )

    timed(f"doc_search_lsh {nq} queries x index (6 planes, 3 probes)",
          idx.count(),
          lambda: doc_search_lsh(idx, q, dim=16, k=10,
                                 n_planes=6, n_probes=3).count())
    idx.unpersist()
    docs.unpersist()

    # ---- 10M events, 1M users (the session-3 event shape)
    events = (
        spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 1_000_000).alias("user_id"),
            # (id*131 % 997) % 4 varies BETWEEN a user's events (users
            # are id % 1M, so a user's ids step by 1M: constant mod 4 —
            # the session-3 shape would give every user one type only)
            F.element_at(
                F.array(F.lit("view"), F.lit("view"), F.lit("click"),
                        F.lit("purchase")),
                ((F.col("id") * 131 % 997) % 4 + 1).cast("int"),
            ).alias("event_type"),
            # murmur-hash ts: an affine (id*c % 86400) progression is
            # constant-step per user and can make the funnel's
            # within-window stage vacuously empty at some scales
            (F.abs(F.hash(F.col("id"))) % 86400).cast("long").alias("ts_s"),
        )
    )
    events.cache().count()
    events.createOrReplaceTempView("ev10m")

    timed("retention_flags 10M events / 1M users", N,
          lambda: retention_flags(
              events,
              [F.col("event_type") == t for t in ("view", "click", "purchase")],
          ).count())

    timed("dialect windowFunnel 10M events", N,
          lambda: run_ch_sql(
              spark,
              "SELECT user_id, windowFunnel(3600)(ts_s, event_type='view', "
              "event_type='click', event_type='purchase') AS lvl "
              "FROM ev10m GROUP BY user_id",
          ).filter("lvl >= 2").count())

    timed("dialect sequenceCount 10M events", N,
          lambda: run_ch_sql(
              spark,
              "SELECT user_id, sequenceCount('(?1).*(?2)')(ts_s, "
              "event_type='click', event_type='purchase') AS c "
              "FROM ev10m GROUP BY user_id",
          ).filter("c > 0").count())

    timed("dialect topK(5) over 10M rows", N,
          lambda: run_ch_sql(
              spark,
              "SELECT topK(5)(event_type) AS top FROM ev10m",
          ).count())

    # ---- aggregating states: 3 ingest batches over 10M rows, 100k keys
    from transaq_clickhouse_exporter_spark.operators.aggregating import (
        finalize,
        partial_states,
    )

    ev2 = events.select(
        "event_id",
        (F.col("user_id") % 100_000).alias("key"),
        F.col("ts_s").cast("double").alias("price"),
        (F.col("event_id") % 7 + 1).alias("qty"),
    )
    spec = dict(sum_cols=("qty",), min_cols=("price",), max_cols=("price",),
                hll_col="event_id")

    def agg_run():
        parts = [
            partial_states(ev2.filter(F.pmod(F.col("event_id"), F.lit(3)) == i),
                           ("key",), **spec)
            for i in range(3)
        ]
        return finalize(parts[0].unionAll(parts[1]).unionAll(parts[2]),
                        ("key",)).count()

    timed("aggregating states 3-batch ingest+finalize 10M rows / 100k keys",
          N, agg_run)

    spark.stop()


if __name__ == "__main__":
    main()
