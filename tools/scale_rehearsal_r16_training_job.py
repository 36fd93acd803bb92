#!/usr/bin/env python3
"""Round-16 rehearsal (VERDICT r15 item 7): the COMPOSED
``training_data_job`` end-to-end at 1M documents with every gate on —
SCALE.md covers the individual operators at 10M rows; this closes the
loop on the whole 100 TB curation story in one run:

  rule gate → benchmark decontamination (broadcast probe) →
  model-quality gate (Arrow-batched scorer seam) → exact dedup →
  MinHash-LSH near-dup removal (banded, never all-pairs) →
  contamination-proof split assignment → token counting →
  sequence packing → sharded export with verified manifest.

Synthetic corpus (deterministic, JVM-side synthesis — no driver
loops): 1,000,000 docs of 40 hex words + a stopword prefix
(passes the Gopher-style gate), seeded with

  * too-short docs      (id % 211 == 0  → rule-gate reject)
  * exact duplicates    (id % 131 == 0  → text of id−1 verbatim)
  * near duplicates     (id %  97 == 0  → text of id + one extra word)
  * eval-set overlap    (id % 419 == 0  → the doc text IS an eval doc)

Asserted in-run: every reject class appears with the expected
magnitude, exact/near duplicates are removed (smallest id survives),
the per-split summary accounts for every curated doc, and
``verify_shards`` round-trips the exported manifest cleanly.

Run: python tools/scale_rehearsal_r16_training_job.py   (~4 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transaq_clickhouse_exporter_spark.session import get_spark  # noqa: E402

N_DOCS = 1_000_000


def _corpus(spark, n):
    """Deterministic synthetic corpus: (doc_id, text)."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # exact dups copy the PREVIOUS doc's text verbatim
    bid = F.when((F.col("doc_id") % 131 == 0) & (F.col("doc_id") > 0),
                 F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    core = (
        "concat('the data and the value ', concat_ws(' ', "
        "flatten(transform(sequence(0, 4), k -> "
        "transform(sequence(0, 7), j -> substring("
        "sha2(concat(cast(__bid as string), '#', cast(k as string)), 256),"
        " j * 8 + 1, 8))))))"
    )
    out = base.withColumn("__bid", bid).withColumn("__core", F.expr(core))
    text = (
        F.when(F.col("doc_id") % 211 == 0, F.lit("tiny doc"))
        .when(F.col("doc_id") % 97 == 0,
              F.concat(F.col("__core"), F.lit(" extra"),
                       F.substring(F.sha2(F.col("doc_id").cast("string"),
                                          256), 1, 6)))
        .otherwise(F.col("__core"))
    )
    return out.select("doc_id", text.alias("text"))


def main() -> int:
    spark = get_spark(app="r16-training-job-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    from transaq_clickhouse_exporter_spark.datapipe.pipeline import (
        export_training_run, training_data_job,
    )
    from transaq_clickhouse_exporter_spark.datapipe.scoring import SCORERS
    from transaq_clickhouse_exporter_spark.datapipe.shards import (
        verify_shards,
    )

    docs = _corpus(spark, N_DOCS).persist()
    n_in = docs.count()  # materialize untimed
    # eval set = the texts of the id % 419 == 0 train docs (overlap by
    # construction) plus some fresh eval-only docs
    eval_docs = (
        docs.filter(F.col("doc_id") % 419 == 0)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .persist()
    )
    n_eval = eval_docs.count()

    t0 = time.time()
    out = training_data_job(
        docs,
        token_budget=2048,
        near_dup_threshold=0.7,
        eval_docs=eval_docs,
        min_model_score=0.1,
        model_scorer=SCORERS["fake"],
    )
    base = tempfile.mkdtemp(prefix="r16_training_")
    manifest = export_training_run(out, base)
    n_shards = manifest.count()  # materializes the whole run
    wall = time.time() - t0

    curated = spark.read.parquet(os.path.join(base, "data"))
    rejects = spark.read.parquet(os.path.join(base, "rejects"))
    summary = spark.read.parquet(os.path.join(base, "summary")).collect()

    n_cur = curated.count()
    rej = {r["fail_reason"]: r["n"] for r in
           rejects.groupBy("fail_reason").agg(
               F.count(F.lit(1)).alias("n")).collect()}
    print(f"docs_in={n_in:,} eval={n_eval:,} curated={n_cur:,} "
          f"wall={wall:.1f}s ({n_in / wall / 1000:.0f}k docs/s "
          f"end-to-end incl. export)")
    print("rejects:", rej)
    print("summary:", sorted((r["split"], r["n_docs"], int(r["n_tokens"]),
                              r["n_sequences"]) for r in summary))
    print(f"shards={n_shards}")

    # every seeded defect class must be caught with expected magnitude
    assert rej.get("too_short", 0) >= int(N_DOCS / 211 * 0.95)
    assert rej.get("eval_overlap", 0) >= int(N_DOCS / 419 * 0.7)
    assert rej.get("model_score", 0) >= int(N_DOCS * 0.05)
    # exact dups (id%131==0 copies of id-1): the copy must lose to the
    # smaller id whenever both passed the gates — allow the small
    # residue where the BASE was itself rejected upstream
    dup_ids = curated.filter(
        (F.col("doc_id") % 131 == 0) & (F.col("doc_id") > 0)
        & (F.col("doc_id") % 211 != 0)).count()
    assert dup_ids < N_DOCS / 131 * 0.15, dup_ids
    # near dups (id%97==0, one extra word): same
    near_ids = curated.filter(
        (F.col("doc_id") % 97 == 0) & (F.col("doc_id") > 0)
        & (F.col("doc_id") % 211 != 0)).count()
    assert near_ids < N_DOCS / 97 * 0.2, near_ids
    # the summary accounts for every curated doc exactly
    assert sum(r["n_docs"] for r in summary) == n_cur
    assert {r["split"] for r in summary} == {"train", "val", "test"}
    assert all(r["n_sequences"] > 0 for r in summary)
    # manifest round-trip: verify_shards recomputes per-shard counts/
    # hashes from the files and must agree with the manifest
    bad = verify_shards(spark, os.path.join(base, "data"), "doc_id") \
        .filter(~F.col("ok")).count()
    assert bad == 0, f"{bad} shards failed verification"
    print("OK: composed training_data_job end-to-end at 1M docs")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
