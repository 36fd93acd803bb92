"""Aggregating/SummingMergeTree semantics — ClickHouse's incremental
materialized-aggregate engines (the MergeTree family members beyond
the reference's ReplacingMergeTree, ``db.go:31``): ingest writes
small PARTIAL aggregate states per key; background merges combine
states; reads finalize.  The Spark-first re-expression keeps one
mergeable-state row per key per ingest batch:

* ``sum`` / ``count`` states merge by addition (SummingMergeTree),
* ``min`` / ``max`` by min/max,
* approx-distinct by HLL register max-merge — the registers ride
  along as a ``map<bucket, rho>`` column (`functions/hll.py`'s
  portable seed-free sketch, so partial-merged registers are
  IDENTICAL to whole-data registers and the estimate is
  engine-reproducible).

Why this matters at 100 TB: a rollup consumer never re-reads raw
data — each new batch contributes |keys| state rows, compaction
(`storage.compact_table`'s shape) merges states instead of rows, and
the read-side finalize touches only states.  Merge is associative +
commutative by construction, so batch boundaries, re-shards, and
replays cannot change the final answer (proved by the split-invariance
test).

Plan shape: partials are ONE map-side-combinable hash agg per batch
(plus the register agg sharing the same shuffle key); merge is one
hash agg over state rows; finalize is a narrow projection + the
exact-integer HLL estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hll import _bucket_rho, hll_estimate_from_registers


def partial_states(
    df: DataFrame,
    keys: tuple[str, ...],
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    hll_col: str | None = None,
    precision: int = 10,
) -> DataFrame:
    """One mergeable state row per key for this batch:
    ``(keys…, n, sum_<c>…, min_<c>…, max_<c>…[, hll map<int,int>])``.

    With ``hll_col`` the scalars ride the register aggregation's own
    two-level pass — count/sum/min/max all decompose over the
    (keys, bucket) grain, so one scan and one shuffle produce BOTH
    the scalar states and the register map (no second agg, no join)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    if hll_col is None:
        return df.groupBy(*keys).agg(*aggs)
    keep = list(dict.fromkeys([*keys, *sum_cols, *min_cols, *max_cols]))
    lvl1 = (
        _bucket_rho(df, hll_col, keep, precision)
        .groupBy(*keys, "bucket")
        .agg(*aggs, F.max("__rho").alias("m_rho"))
    )
    relay = [F.sum("n").alias("n")]
    relay += [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    relay += [F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols]
    relay += [F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols]
    return lvl1.groupBy(*keys).agg(
        *relay,
        F.map_from_entries(
            F.filter(
                F.collect_list(F.struct("bucket", "m_rho")),
                lambda e: e["bucket"].isNotNull(),
            )
        ).alias("hll"),
    )


def merge_states(states: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """Combine state rows per key (background-merge semantics): adds
    counts/sums, min/max of extrema, per-bucket max of HLL registers.
    Associative + commutative — any grouping of batches merges to the
    same state."""
    has_hll = "hll" in states.columns
    aggs = []
    for c in states.columns:
        if c in keys or c == "hll":
            continue
        if c == "n" or c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"unmergeable state column: {c}")
    if has_hll:
        # map-merge: explode to (bucket, rho), max per bucket, re-pack
        flat = states.select(
            *keys, F.explode_outer("hll").alias("bucket", "m_rho")
        )
        regs = (
            flat.filter(F.col("bucket").isNotNull())
            .groupBy(*keys, "bucket")
            .agg(F.max("m_rho").alias("m_rho"))
            .groupBy(*keys)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("bucket", "m_rho"))
                ).alias("hll")
            )
        )
        # LEFT join: a key whose hll map was empty on every state row
        # (hll_col NULL throughout) has no register rows; its scalar
        # states must survive with an empty map (ADVICE r6).
        empty_map = F.map_from_arrays(
            F.array().cast("array<int>"), F.array().cast("array<int>")
        )
        return (
            states.groupBy(*keys)
            .agg(*aggs)
            .join(regs, list(keys), "left")
            .withColumn("hll", F.coalesce(F.col("hll"), empty_map))
        )
    return states.groupBy(*keys).agg(*aggs)


def finalize(
    states: DataFrame,
    keys: tuple[str, ...],
    precision: int = 10,
) -> DataFrame:
    """Read-side FINAL: scalar states pass through; the HLL map (if
    present) becomes a ``distinct_est`` column via the exact-integer
    estimator.  Registers go straight from the state maps to the
    estimator (explode → per-bucket max → estimate) without the
    intermediate re-packed map ``merge_states`` would build — the
    per-bucket max IS the merge, so the estimate is identical."""
    if "hll" not in states.columns:
        return merge_states(states, keys)
    merged = merge_states(states.drop("hll"), keys)
    regs = (
        states.select(*keys, F.explode("hll").alias("bucket", "m_rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("m_rho").alias("m_rho"))
    )
    est = hll_estimate_from_registers(regs, tuple(keys), precision).withColumnRenamed(
        "est", "distinct_est"
    )
    # LEFT join + 0: keys with no register rows (hll empty on every
    # state row) keep their scalars; the distinct estimate of an
    # all-NULL column is 0 (ADVICE r6).
    return merged.join(est, list(keys), "left").withColumn(
        "distinct_est", F.coalesce(F.col("distinct_est"), F.lit(0).cast("long"))
    )


# ---- streaming maintenance (CH: a materialized view feeding the
# AggregatingMergeTree on every insert) -----------------------------------


def states_stream_sink(
    state_root: str,
    keys: tuple[str, ...],
    **spec,
):
    """``foreachBatch`` sink: each micro-batch writes its partial
    states to ``<state_root>/b<batch_id>`` with ``mode("overwrite")``
    — the per-batch-directory overwrite makes crash replays idempotent
    (the re-run batch recomputes the same states and overwrites its
    own directory; streaming_curation.py's exactly-once discipline).

    State volume per batch is |keys in batch| rows, not |rows|; the
    raw batch is never persisted."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        partial_states(batch, keys, **spec).write.mode("overwrite").parquet(
            f"{state_root}/b{int(batch_id)}"
        )

    return _sink


def read_final(
    spark,
    state_root: str,
    keys: tuple[str, ...],
    precision: int = 10,
) -> DataFrame:
    """Read-side FINAL over every batch's states (merge + estimate)."""
    return finalize(spark.read.parquet(f"{state_root}/b*"), keys, precision)
