"""Token-budget sequence packing — the last step of an LLM pretraining
data pipeline: concatenate documents in a deterministic order and chop
the tape into fixed-budget training sequences.

The packing model here is the standard "concatenate-then-chunk": lay
documents end to end and cut every ``budget`` tokens (documents may
straddle a cut; the tokenizer's EOD token separates them downstream).
A document's sequence assignment is therefore just integer division of
its *cumulative token offset* — expressible as one window sum, no
Python, no greedy bin-packing loop.

Scale shape: a single global ordering would funnel 100 TB through one
range-partitioned sort and emit one unparallelizable tape.  Instead the
corpus is first split into ``n_buckets`` content-stable shards by an
md5 digit of the id (the same trick as
:mod:`~transaq_clickhouse_exporter_spark.datapipe.sampling` — shard
membership never depends on the rest of the data), and each shard packs
independently: ONE shuffle (window partition on ``bucket``),
parallelism = ``n_buckets`` × within no contention, and adding data to
one shard never renumbers another.  At cluster scale set ``n_buckets``
≈ executor-core count or pack per date-partition.

Deterministic order within a shard is (md5(id), id) — reproducible
across engines and runs, and it doubles as the corpus shuffle
(pretraining wants documents in hash order, not source order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import id_hash

HEX = "0123456789abcdef"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 16,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every document a (bucket, seq_in_bucket, offset_in_seq).

    ``n_buckets`` must divide 16 (buckets are md5-hex-digit groups so
    the bucketing stays portable to any SQL engine).  Offsets are exact
    integer arithmetic throughout (`DIV`/`%`), never double math.

    ``partition_cols`` prepends extra columns to the packing window
    partition so documents only ever share a sequence with documents in
    the same group — e.g. ``("split",)`` keeps train/val/test tapes
    disjoint (a sequence spanning splits would leak val/test tokens
    into training).  A sequence is then identified by
    ``(*partition_cols, bucket, seq_in_bucket)``."""
    if 16 % n_buckets != 0:
        raise ValueError("n_buckets must divide 16")
    per = 16 // n_buckets
    h = id_hash(id_col)
    # hex digit → 0..15 via position in the alphabet (portable: DuckDB
    # strpos/instr agree with Spark's instr, both 1-based)
    digit = F.expr(f"instr('{HEX}', substring(md5(CAST({id_col} AS STRING)), 1, 1))") - 1
    bucket = (digit / per).cast("long") if per > 1 else digit.cast("long")
    w = Window.partitionBy(*partition_cols, "bucket").orderBy("__h", id_col)
    cum = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    out = (
        df.withColumn("__h", h)
        .withColumn("bucket", bucket)
        .withColumn("cum_before", cum)
        .withColumn("seq_in_bucket", F.expr(f"cum_before DIV {int(budget)}"))
        .withColumn("offset_in_seq", F.expr(f"cum_before % {int(budget)}"))
        .drop("__h")
    )
    return out


def pack_summary(
    packed: DataFrame, token_col: str, partition_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-sequence roll-up of a :func:`pack_sequences` output: document
    count and token fill (the tail sequence of each bucket under-fills;
    everything else fills to ≥ budget − max_doc_tokens + 1).

    ``partition_cols`` must match the packing call: the sequence
    identity is ``(*partition_cols, bucket, seq_in_bucket)``, so a
    per-split tape summarized without its partition columns would merge
    unrelated sequences that share (bucket, seq) coordinates."""
    return packed.groupBy(*partition_cols, "bucket", "seq_in_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("sum_tokens"),
        F.min("offset_in_seq").alias("first_offset"),
    )
