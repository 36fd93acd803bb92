#!/usr/bin/env python3
"""Round-7 rehearsal (VERDICT r6 item 7): the retrieval scale path —
``doc_search_lsh`` over a pre-bucketed chunk index PLUS incremental
index maintenance — at ~10M-row scale on local[32], measuring rows/s
and the LSH-vs-linear crossover.  Results land in SCALE.md.

Shape: sf0.1 documents (5k docs, ~200 tokens) replicated R× with
distinct doc_ids; chunk grid 64/48 → ~7 chunks/doc at these lengths;
the index is built ONCE with the bucket column persisted
(``bucket_planes``), which SCALE.md's round-6 measurement showed is
the requirement for the bucketed path to compete at all.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.datapipe.retrieval import (  # noqa: E402
    build_chunk_index,
    doc_search,
    doc_search_lsh,
    index_stream_sink,
    read_chunk_index,
)
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

PLANES = 12
N_PROBES = 3
K = 5
N_QUERIES = 50
ROOT = "/tmp/r7_rehearsal"


def corpus(spark, rep: int):
    return (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(rep).select(F.col("id").alias("rep")))
        .select((F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"), "text")
    )


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f} s", flush=True)
    return out, dt


def recall_at_k(approx_rows, exact_rows):
    ex, ap = {}, {}
    for r in exact_rows:
        ex.setdefault(r.query_id, set()).add(r.doc_id)
    for r in approx_rows:
        ap.setdefault(r.query_id, set()).add(r.doc_id)
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    return hits / max(1, sum(len(s) for s in ex.values()))


def main() -> None:
    spark = get_spark(app="tce-scale-r7")
    if os.environ.get("R7_FRESH"):
        shutil.rmtree(ROOT, ignore_errors=True)

    # ---- crossover study: linear (blas) vs pre-bucketed LSH at
    # growing corpus sizes, same 50-query panel
    print(f"== crossover: blas linear vs LSH({PLANES} planes, "
          f"{N_PROBES} probes), k={K}, {N_QUERIES} queries ==", flush=True)
    for rep in (20, 60, 140, 280):
        docs = corpus(spark, rep)
        path = f"{ROOT}/idx_rep{rep}"
        if os.path.exists(path + "/_SUCCESS"):
            t_build = float("nan")
            print(f"build rep={rep}: reusing persisted index", flush=True)
        else:
            idx0 = build_chunk_index(docs, bucket_planes=PLANES)
            _, t_build = timed(f"build+persist rep={rep}",
                               lambda: idx0.write.mode("overwrite").parquet(path))
        idx = spark.read.parquet(path)
        n_chunks = idx.count()
        q = (
            idx.select(F.col("embedding"))
            .limit(20000)
            .sample(fraction=1.0, seed=7)
            .limit(N_QUERIES)
            .rdd.zipWithIndex()
            .map(lambda r: (r[1], r[0][0]))
            .toDF(["query_id", "embedding"])
        )
        q = spark.createDataFrame(q.collect(), "query_id long, embedding array<double>")
        (lin, t_lin) = timed(f"  blas linear   ({n_chunks} chunks)",
                             lambda: doc_search(idx, q, k=K, engine="blas").collect())
        (lsh, t_lsh) = timed(f"  lsh bucketed  ({n_chunks} chunks)",
                             lambda: doc_search_lsh(idx, q, dim=16, k=K,
                                                    n_planes=PLANES,
                                                    n_probes=N_PROBES).collect())
        r = recall_at_k(lsh, lin)
        print(f"  rep={rep}: chunks={n_chunks} build={t_build:.2f}s "
              f"({n_chunks / t_build / 1e3:.0f}k chunks/s) "
              f"linear={t_lin:.2f}s lsh={t_lsh:.2f}s "
              f"speedup={t_lin / t_lsh:.2f}x recall@{K}={r:.3f}", flush=True)

    # ---- incremental maintenance at the biggest size: stream 25
    # batches of 2k NEW docs each through index_stream_sink (bucketed),
    # then search history+increments together
    print("== incremental maintenance (50k new docs, 25 batches) ==", flush=True)
    inc_root = f"{ROOT}/inc"
    # unique per-doc marker: the final chunk of every increment doc
    # differs from every corpus chunk, so its embedding must retrieve
    # its own doc at rank 1 (retrievability check below)
    new_docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(10).select(F.col("id").alias("rep")))
        .select((F.lit(10_000_000) + F.col("doc_id") * 10 + F.col("rep"))
                .alias("doc_id"), "text",
                (F.col("doc_id") % 25).cast("int").alias("b"))
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" uniqmark"),
                     F.col("doc_id").cast("string")),
        )
    )
    sink = index_stream_sink(inc_root, bucket_planes=PLANES)
    t0 = time.perf_counter()
    n_new = new_docs.count()
    for b in range(25):
        sink(new_docs.filter(F.col("b") == b).drop("b"), b)
    dt = time.perf_counter() - t0
    print(f"  maintained {n_new} docs in {dt:.1f} s "
          f"({n_new / dt / 1e3:.1f}k docs/s incl. per-batch parquet)", flush=True)

    merged = spark.read.parquet(f"{ROOT}/idx_rep280").unionByName(
        read_chunk_index(spark, inc_root)
    )
    nm = merged.count()
    inc_idx = read_chunk_index(spark, inc_root)
    from pyspark.sql import Window

    last_chunk = (
        inc_idx.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("chunk_idx")))
        ).filter(F.col("rn") == 1).limit(10)
        .select("doc_id", "embedding").collect()
    )
    q2 = spark.createDataFrame(
        [(r.doc_id, r.embedding) for r in last_chunk],
        "query_id long, embedding array<double>",
    )
    (res, t_m) = timed(f"  lsh over merged ({nm} chunks)",
                       lambda: doc_search_lsh(merged, q2, dim=16, k=K,
                                              n_planes=PLANES,
                                              n_probes=N_PROBES).collect())
    top1_self = sum(1 for r in res if r.rank == 1 and r.doc_id == r.query_id)
    print(f"  merged search: {t_m:.2f} s; increments retrieved at rank 1 "
          f"by their own (unique) chunk: {top1_self}/10", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
