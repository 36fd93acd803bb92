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


class SpaceSaving:
    """Metwally et al.'s Space-Saving sketch with a HARD ``m``-counter
    memory bound (`Efficient Computation of Frequent and Top-k Elements
    in Data Streams`, ICDT 2005).

    State is exactly ``m`` (value → estimated count) entries plus a
    lazy-deletion min-heap that is compacted back to ``m`` live entries
    whenever stale pushes exceed ``8*m`` — O(m) memory regardless of
    the number of distinct values seen, unlike a full distinct dict.
    Any value whose true count exceeds N/m is guaranteed to be resident;
    when distinct ≤ m no eviction ever fires and counts are exact."""

    def __init__(self, m: int):
        self.m = m
        self.counters: dict = {}
        self._heap: list = []  # (count, value), lazily invalidated

    def _push(self, v, c) -> None:
        import heapq

        heapq.heappush(self._heap, (c, v))
        if len(self._heap) > 8 * self.m:
            self._heap = [(c, v) for v, c in self.counters.items()]
            heapq.heapify(self._heap)

    def add(self, v, c: int = 1) -> None:
        import heapq

        cur = self.counters.get(v)
        if cur is not None:
            self.counters[v] = cur + c
            self._push(v, cur + c)
        elif len(self.counters) < self.m:
            self.counters[v] = c
            self._push(v, c)
        else:
            # evict the current minimum; the newcomer inherits its
            # count (the Space-Saving overestimate invariant)
            while True:
                cnt, u = self._heap[0]
                if self.counters.get(u) == cnt:
                    break
                heapq.heappop(self._heap)  # stale entry
            heapq.heappop(self._heap)
            del self.counters[u]
            self.counters[v] = cnt + c
            self._push(v, cnt + c)

    def items_desc(self) -> list:
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))


def approx_top_k(
    df: DataFrame,
    value_col: str,
    k: int,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """Approximate global heavy hitters — the ClickHouse ``topK``
    sketch's 100 TB shape: per-partition Space-Saving with M = 5k
    counters by default (hard O(M) state, not a full distinct dict),
    then an exact re-count of only the surviving candidates.

    One narrow shuffle of ≤ M×partitions candidate rows replaces a full
    ``groupBy(value)`` shuffle of the raw data.  Exact when every true
    heavy hitter survives the per-partition sketch (guaranteed for any
    value with per-partition frequency > rows/M — the Space-Saving
    bound); :func:`top_k_per_group` is the exact verifier."""
    m = candidates_per_partition or 5 * k
    import pandas as pd

    def partial(batches):
        sk = SpaceSaving(m)
        for pdf in batches:
            # chunk-local pre-aggregation: distinct-per-Arrow-batch is
            # bounded by the batch size, then folded into O(M) state
            for v, c in pdf[value_col].value_counts().items():
                sk.add(v, int(c))
        yield pd.DataFrame(
            sk.items_desc(), columns=[value_col, "partial_count"]
        )

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
