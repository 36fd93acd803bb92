#!/usr/bin/env python3
"""Round-6 scale rehearsal for the curation/dedup family: 10× the
bench corpus (50k documents with a realistic near-dup cluster
structure) on local[32], measuring the operators end to end.

Corpus: each sf0.1 document replicated 10× with a small suffix
perturbation — every base doc becomes a 10-member near-dup cluster
(high pairwise Jaccard, distinct exact hashes), the shape a crawled
corpus actually has.  Numbers land in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.datapipe import dedup as dd  # noqa: E402
from transaq_clickhouse_exporter_spark.datapipe import text as dtx  # noqa: E402
from transaq_clickhouse_exporter_spark.datapipe.packing import pack_sequences  # noqa: E402
from transaq_clickhouse_exporter_spark.datapipe.sampling import mixture_weights  # noqa: E402
from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402
from transaq_clickhouse_exporter_spark.testdata import load_table  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {n} rows in {dt:.1f} s ({n / dt / 1e3:.0f}k rows/s)", flush=True)
    return n, dt


def main() -> None:
    spark = get_spark(app="tce-scale-datapipe")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    docs = (
        base.crossJoin(spark.range(10).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"),
            F.concat("text", F.lit(" replica marker "),
                     F.col("rep").cast("string")).alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(32)
        .cache()
    )
    n = docs.count()
    print(f"corpus: {n} docs", flush=True)

    timed("curation gate (codegen scan)",
          lambda: dtx.curation_filter(docs).count())
    timed("exact dedup (hash groupBy)",
          lambda: dd.exact_dedup(docs).count())
    pairs = dd.minhash_near_dups(docs, threshold=0.7).cache()
    timed("minhash LSH near-dups (sign->band->verify)", pairs.count)
    timed("connected components over pair graph",
          lambda: dd.connected_components(pairs).count())
    ev = docs.filter(F.col("doc_id") % 101 == 0)
    # aggregate over n_shared: a bare count() lets Catalyst eliminate
    # the unique-key left join and skip the probe entirely
    timed(f"decontaminate vs {ev.count()}-doc eval set",
          lambda: dd.decontaminate(docs, ev)
          .agg(F.sum("n_shared")).collect() and n)
    timed("sequence packing (16 shards)",
          lambda: pack_sequences(
              docs.select("doc_id", dtx.ws_token_count("text").alias("t")),
              "doc_id", "t", budget=2048).count())
    timed("mixture weights", lambda: mixture_weights(docs).count())
    # duplicate-passage removal: on THIS corpus every base doc's 10
    # replicas share all aligned windows, so the dup-passage set is
    # dense — the worst realistic case for the dup-set shuffle.
    # Aggregate n_removed so the full reassembly actually executes.
    timed("passage dedup (20-word cross-doc windows)",
          lambda: dd.passage_dedup(docs)
          .agg(F.sum("n_removed")).collect() and n)
    timed("self passage dedup (zero-shuffle scan)",
          lambda: dd.self_passage_dedup(docs)
          .agg(F.sum("n_kept")).collect() and n)
    # compressed-ANN family at 10x corpus: SQ fit+scan, PQ encode+ADC
    emb10 = (
        load_table(spark, "/root/testdata/sf0.1", "embeddings")
        .crossJoin(spark.range(10).select(F.col("id").alias("rep")))
        .select((F.col("vec_id") * 16 + F.col("rep")).alias("vec_id"),
                "embedding")
        .repartition(32)
        .cache()
    )
    nq = emb10.filter(F.col("vec_id") % 5000 == 0)
    queries = nq.select(F.col("vec_id").alias("query_id"), "embedding")
    print(f"embeddings: {emb10.count()} vectors, {queries.count()} queries",
          flush=True)
    from transaq_clickhouse_exporter_spark.datapipe import similarity as sim

    timed("SQ int8 fit + quantized brute-force top-10",
          lambda: sim.sq_topk(emb10, queries, k=10).count())
    cb = sim.pq_codebooks(emb10, n_cent=64, train=True, sample_size=1024)
    timed("PQ encode (8 subspaces x 64 cents, zero shuffle)",
          lambda: sim.pq_encode(emb10, cb).count())
    enc = sim.pq_encode(emb10, cb).cache()
    enc.count()
    timed("PQ/ADC top-10 over persisted codes",
          lambda: sim.pq_topk(emb10, queries, codebooks=cb, k=10,
                              encoded=enc).count())
    spark.stop()


if __name__ == "__main__":
    main()
