"""Skew mitigation: salted two-phase aggregation and salted broadcast
join.

At 100 TB a handful of hot keys (one security carrying half the tape,
one viral document cluster) make a single reducer the critical path.
Two standing answers, both here:

- **AQE skew-join splitting** — on by default in :mod:`..session`
  (``spark.sql.adaptive.skewJoin.enabled``): oversized join partitions
  split at runtime.  Covers sort-merge joins.
- **Salted aggregation** (this module): explicit two-phase combine for
  aggregations, where AQE does not re-balance a single hot group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregates that re-combine with themselves (partial = final op).
_SELF_MERGING = {"sum", "min", "max", "count"}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates
    (keys, salt) — the hot key spreads over ``salt_buckets`` reducers —
    phase 2 merges the partials per key.

    ``aggs`` maps output column → (function, input column) with
    function ∈ {sum, min, max, count}; ``count`` merges via sum of
    partial counts.  Result is identical to the direct
    ``groupBy(keys).agg(...)`` (asserted in tests) — only the shuffle
    shape changes."""
    unknown = {f for f, _ in aggs.values()} - _SELF_MERGING
    if unknown:
        raise ValueError(f"non-self-merging aggregate(s): {unknown}")
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial_exprs = [
        getattr(F, fn)(col).alias(f"__p_{out}") for out, (fn, col) in aggs.items()
    ]
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    final_exprs = []
    for out, (fn, _col) in aggs.items():
        merge = "sum" if fn == "count" else fn
        final_exprs.append(getattr(F, merge)(f"__p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Hot-key-proof join for a small-enough right side: broadcast it.
    Broadcast joins have NO shuffle on the big side, so key skew simply
    cannot concentrate — this is why every dashboard dim join broadcasts
    (queries/dashboard.py).  Provided as the named idiom; falls back to
    Catalyst if the small side exceeds the broadcast threshold."""
    return big.join(F.broadcast(small), on=list(on), how=how)


def explode_salt(small: DataFrame, salt_buckets: int) -> DataFrame:
    """For the rare big⋈big skewed join where neither side broadcasts:
    replicate the small(er) side across all salt values; the big side
    salts randomly; join on (key, salt).  Pair with
    ``big.withColumn('__salt', (F.rand(42)*n).cast('int'))``."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    return small.select("*", salts)
