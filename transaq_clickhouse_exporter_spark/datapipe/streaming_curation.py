"""Streaming incremental corpus curation: the 100 TB ingest shape.

A training corpus is not built in one batch job — it accretes from a
document stream (crawl drops, ingest feeds).  This module runs the
curation-family operators *incrementally* inside a Structured
Streaming ``foreachBatch`` sink, maintaining three persisted state
tables alongside the corpus:

- ``curated/``  — the accepted documents (the corpus itself),
- ``hashes/``   — their content hashes (:func:`..dedup.incremental_exact_dedup`'s probe table),
- ``bands/``    — their MinHash band buckets (:func:`..dedup.incremental_minhash_near_dups`'s probe table),

so a new micro-batch is gated by one anti-join against ``hashes`` and
one band-bucket probe against ``bands`` — the historical corpus is
never re-read, never re-shingled.  Per batch, in order:

1. within-batch exact dedup + anti-join vs ``hashes``,
2. within-batch near-dup removal (banded LSH pairs → connected
   components → keep each cluster's minimum id),
3. cross-history near-dup removal (probe ``bands``, exact-Jaccard
   verify, drop the new side),
4. append survivors + their hashes + their band rows.

Exactly-once without a transaction log: every batch writes its output
under ``<state>/<table>/b<batch_id>`` with ``mode("overwrite")``, and
state reads take only directories with batch id *below* the current
one.  A batch replayed after a mid-write crash therefore recomputes
from exactly the pre-batch state and overwrites its own directories —
idempotent by construction, no commit marker needed.  (On object
storage the directory listing becomes a manifest read; the per-batch-
prefix overwrite pattern is unchanged.)

Reference anchor: this is the streaming analogue of the reference's
continuous ingest loop (``main.go:121-228`` consumes channels forever
and upserts into ReplacingMergeTree); curation replaces the merge-tree
dedup with the corpus-dedup family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import (
    band_buckets,
    connected_components,
    incremental_exact_dedup,
    incremental_minhash_near_dups,
    minhash_near_dups,
    minhash_signatures,
)

_HASH_SCHEMA = T.StructType([T.StructField("content_hash", T.StringType())])


def _state_dirs(root: str, table: str, before_batch: int) -> list[str]:
    base = os.path.join(root, table)
    if not os.path.isdir(base):
        return []
    return [
        os.path.join(base, d)
        for d in sorted(os.listdir(base))
        if d.startswith("b") and d[1:].isdigit() and int(d[1:]) < before_batch
    ]


def _read_state(
    spark: SparkSession, root: str, table: str, schema, before_batch: int
) -> DataFrame:
    dirs = _state_dirs(root, table, before_batch)
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*dirs)


def read_curated(
    spark: SparkSession,
    state_root: str,
    schema=None,
    before_batch: int | None = None,
) -> DataFrame:
    """The curated corpus accumulated so far.  ``before_batch``: an
    exclusive upper bound on batch ids — a reader racing a live stream
    must pass the in-flight batch id so it never sees that batch's
    partially-written directory (the same rule the batch's own state
    reads follow).  The default reads every directory present, which
    is safe only when no batch is mid-write."""
    bb = (1 << 62) if before_batch is None else int(before_batch)
    dirs = _state_dirs(state_root, "curated", bb)
    if not dirs:
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise FileNotFoundError(
            f"no committed curated state under {state_root}/curated; "
            "pass schema= to get an empty frame instead"
        )
    return (
        spark.read.schema(schema).parquet(*dirs)
        if schema is not None
        else spark.read.parquet(*dirs)
    )


def curate_document_batch(
    batch: DataFrame,
    batch_id: int,
    state_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> None:
    """One micro-batch of incremental curation (the ``foreachBatch``
    body — callable directly for batch backfills too)."""
    spark = batch.sparkSession
    bid = int(batch_id)

    seen = _read_state(spark, state_root, "hashes", _HASH_SCHEMA, bid)
    surv = incremental_exact_dedup(batch, seen, text_col, id_col)

    banded = band_buckets(
        minhash_signatures(surv, text_col, id_col, n_hashes, shingle_k),
        n_bands,
        id_col,
        n_hashes=n_hashes,
    ).localCheckpoint()  # pandas-UDF stage runs once, not per reuse

    within = minhash_near_dups(
        surv, text_col, id_col, threshold=threshold, n_hashes=n_hashes,
        bands=n_bands, shingle_k=shingle_k, banded=banded,
    )
    comps = connected_components(within.select("id_a", "id_b"))
    surv = surv.join(
        comps.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        ),
        id_col,
        "left_anti",
    )
    surv_banded = banded.join(surv.select(id_col), id_col, "left_semi")

    hist_bands = _read_state(spark, state_root, "bands", banded.schema, bid)
    hist_docs = _read_state(
        spark,
        state_root,
        "curated",
        T.StructType(
            [f for f in batch.schema.fields if f.name in (id_col, text_col)]
        ),
        bid,
    )
    cross = incremental_minhash_near_dups(
        surv, hist_docs, text_col, id_col, threshold=threshold,
        n_hashes=n_hashes, bands=n_bands, shingle_k=shingle_k,
        new_banded=surv_banded, history_banded=hist_bands,
    )
    surv = surv.join(
        cross.select(F.col("id_a").alias(id_col)).distinct(), id_col, "left_anti"
    ).localCheckpoint()  # three writes below read it; cut recompute + lineage

    cols = [f.name for f in batch.schema.fields]
    surv.select(*cols).write.mode("overwrite").parquet(
        os.path.join(state_root, "curated", f"b{bid:08d}")
    )
    surv.select("content_hash").write.mode("overwrite").parquet(
        os.path.join(state_root, "hashes", f"b{bid:08d}")
    )
    surv_banded.join(surv.select(id_col), id_col, "left_semi").write.mode(
        "overwrite"
    ).parquet(os.path.join(state_root, "bands", f"b{bid:08d}"))


def curate_document_stream(
    docs_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **params,
):
    """Attach incremental curation to a streaming documents DataFrame;
    returns the started query.  ``available_now=True`` drains what's
    there and stops (tests, catch-up runs); ``False`` runs continuous
    micro-batches (the deployment mode)."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        curate_document_batch(batch, batch_id, state_root, **params)

    w = (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
