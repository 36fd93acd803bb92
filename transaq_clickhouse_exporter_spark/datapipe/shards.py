"""Training-shard export — the final materialization step of the
curation pipeline (:func:`.pipeline.training_data_job` ends at a
``curated`` DataFrame; this module turns it into the on-disk artifact
a trainer actually consumes).

What a 100 TB training run needs from its shard layout, and how each
maps to Spark:

- **Deterministic shard assignment.**  ``shard = int(md5(id)[:8], 16)
  % n_shards`` — content-stable like every sampling key in
  :mod:`.sampling`: a document lands in the same shard across re-runs,
  re-shards of the input, cluster sizes, and engines (portable to SQL
  as ``CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % n``).  Never
  ``spark_partition_id()`` — that bakes the input layout into the
  output.
- **Deterministic within-shard order.**  Training-tape order must not
  depend on task scheduling: rows sort by the full id hash inside each
  shard, which doubles as the corpus-level "global shuffle" every
  pretraining run wants (hash order IS a uniform random permutation,
  with no RNG state to coordinate across 1000 executors).
- **One file per shard.**  A hash ``repartition`` on (split, shard)
  co-locates each shard in exactly one task, so ``partitionBy(split,
  shard)`` emits exactly one file per shard directory — no small-file
  explosion, no cross-file ordering ambiguity.
- **A manifest the trainer can trust.**  Per-shard row/token counts
  plus an order-independent integer checksum (sum of the 32-bit id
  hashes — 32-bit summands keep the sum inside int64 up to ~4 billion
  rows per shard; the 52-bit order key would overflow at thousands).
  The manifest is computed from the DataFrame with one aggregation and
  verified against the written files on request — resumable ingestion
  diffs a new manifest against the stored one instead of re-reading
  shard bytes.

The reference has no export surface (its sink is ClickHouse,
``db.go:111-174``); this is the training-pipeline extension family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import id_hash


def assign_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add content-stable ``shard`` (int, [0, n_shards)) and the
    deterministic within-shard ``order_key`` (52-bit id hash)."""
    if not 1 <= n_shards <= 100_000:
        raise ValueError("n_shards must be in [1, 100000]")
    h8 = _hash32(id_col)
    h13 = F.conv(F.substring(id_hash(id_col), 1, 13), 16, 10).cast("long")
    return df.withColumn("shard", (h8 % n_shards).cast("int")).withColumn(
        "order_key", h13
    )


def _hash32(id_col: str) -> F.Column:
    """First 8 hex digits of md5(id) as a long in [0, 2^32)."""
    return F.conv(F.substring(id_hash(id_col), 1, 8), 16, 10).cast("long")


def shard_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    token_col: str | None = None,
    split_col: str | None = None,
) -> DataFrame:
    """Shard plan + manifest in one aggregation: per (split?, shard)
    ``n_docs``, ``n_tokens`` (when ``token_col``), and ``id_checksum``
    — the order-independent sum of 32-bit id hashes that two
    independent runs (or engines) must reproduce exactly."""
    keys = ([split_col] if split_col else []) + ["shard"]
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_hash32(id_col)).alias("id_checksum"),
    ]
    if token_col:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    return assign_shard(df, id_col, n_shards).groupBy(*keys).agg(*aggs)


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    token_col: str | None = None,
    split_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize the corpus as ``path/[split=…/]shard=K/`` parquet —
    one file per shard, rows in deterministic hash order — and write
    the manifest to ``path/_manifest``.  Returns the manifest.

    Plan: ONE shuffle (hash repartition on the shard key) feeds both
    the sorted write and nothing else; the manifest is a separate
    single aggregation over the narrow key/count columns (cheap — it
    reads only id/token columns, so at 100 TB the text/binary payload
    bytes flow through exactly once)."""
    keys = ([split_col] if split_col else []) + ["shard"]
    sharded = assign_shard(df, id_col, n_shards)
    (
        sharded.repartition(*[F.col(k) for k in keys])
        .sortWithinPartitions(*keys, "order_key", id_col)
        .write.mode(mode)
        .partitionBy(*keys)
        .parquet(path)
    )
    manifest = shard_manifest(df, id_col, n_shards, token_col, split_col)
    manifest.coalesce(1).write.mode(mode).parquet(os.path.join(path, "_manifest"))
    return manifest


def verify_shards(spark: SparkSession, path: str, id_col: str) -> DataFrame:
    """Recompute the manifest from the written shard files and diff it
    against the stored one.  Returns rows that disagree (empty =
    verified) with ``side`` 'stored'/'actual' — the resumability check
    a long-running ingest runs before trusting existing output."""
    stored = spark.read.parquet(os.path.join(path, "_manifest"))
    keys = [c for c in stored.columns if c not in ("n_docs", "n_tokens", "id_checksum")]
    data = spark.read.parquet(path)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_hash32(id_col)).alias("id_checksum"),
    ]
    if "n_tokens" in stored.columns:
        # token column name is not persisted; recompute is count/checksum
        # only unless the caller re-derives tokens — diff on shared cols.
        stored = stored.drop("n_tokens")
    actual = data.groupBy(*keys).agg(*aggs).select(*stored.columns)
    return stored.exceptAll(actual).withColumn("side", F.lit("stored")).unionAll(
        actual.exceptAll(stored).withColumn("side", F.lit("actual"))
    )
