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
