"""Top-K helpers.

The dashboard's only non-standard aggregate is ``topK(10)(sec_code)``
(ClickHouse heavy-hitters sketch, ``etc/grafana-dashboard-trades.json:374``).
In that query the group key includes ``sec_code`` itself, so the sketch
is degenerate (each group holds one code); the exact implementation here
covers both that case and the general "top K values per group by weight"
semantics.

Scale: the window ranks after a single hash-partition on the group key;
for heavy-hitter detection over 100 TB without a full shuffle, prefer
the two-phase count-min/Space-Saving route: partial per-partition top-M
(M >> K) via ``mapInPandas`` then exact re-rank of the surviving
candidates — the exact path below is the verification oracle for it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_top_k(
    df: DataFrame,
    value_col: str,
    k: int,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """Approximate global heavy hitters — the ClickHouse ``topK``
    sketch's 100 TB shape: per-partition partial top-M (M = 5k by
    default, Space-Saving-style candidate bound) computed map-side, then
    an exact re-count of only the surviving candidates.

    One narrow shuffle of ≤ M×partitions candidate rows replaces a full
    ``groupBy(value)`` shuffle of the raw data.  Exact when every true
    heavy hitter reaches the per-partition top-M (the standard
    Space-Saving guarantee under bounded skew); :func:`top_k_per_group`
    is the exact verifier."""
    m = candidates_per_partition or 5 * k
    import pandas as pd

    def partial(batches):
        counts: dict = {}
        for pdf in batches:
            for v, c in pdf[value_col].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        yield pd.DataFrame(top, columns=[value_col, "partial_count"])

    field = df.schema[value_col].dataType.simpleString()
    candidates = (
        df.select(value_col)
        .mapInPandas(partial, schema=f"{value_col} {field}, partial_count long")
        .select(value_col)
        .distinct()
    )
    return (
        df.join(F.broadcast(candidates), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy(F.desc("weight"), value_col)
        .limit(k)
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact top-``k`` ``value_col`` per group, ranked by descending
    total ``weight_col`` (count if None); deterministic tie-break on the
    value itself."""
    agg = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    counted = df.groupBy(*group_cols, value_col).agg(agg.alias("__w"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("__w").desc(), F.col(value_col))
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .withColumnRenamed("__w", "weight")
    )
