"""Range (interval) join — the second canonical time-series operator
Spark lacks natively: match each point row to every interval row whose
``[start, end)`` contains the point's timestamp, optionally per key.

The reference never needs one (its dashboard buckets with fixed
``$interval`` tumbling windows, ``etc/grafana-dashboard-trades.json``),
but a trades engine without it cannot answer "which auction window /
halt / session does this tick belong to" for *variable-width* windows —
the case fixed-interval ``toStartOfInterval`` bucketing cannot express.

Why not a plain theta join: ``points JOIN intervals ON t >= s AND
t < e`` has no equi-key, so Spark plans **BroadcastNestedLoopJoin**
(fine while the interval table fits a broadcast) or, worse, a
cartesian — O(|points| × |intervals|) comparisons at 100 TB.

The scale path is **binning** (the standard interval-join decomposition
used by engines with native range joins): pick a bin width ``w``,

1. each point maps to exactly ONE bin, ``floor(t / w)`` — narrow;
2. each interval explodes to the bins its span covers,
   ``sequence(floor(s/w), floor((e-1)/w))`` — linear in span/w;
3. equi-join on (bin [, keys]) — a plain shuffled/broadcast hash join
   Catalyst already knows how to distribute — then re-check the exact
   range predicate to discard same-bin misses.

A (point, interval) pair can meet in at most one bin (the point's), so
the output needs no dedup.  Shuffle volume is |points| +
|intervals| × avg(span)/w; pick ``w`` near the median interval length
to keep the explode factor ~2×.  Skewed bins (a burst of points in one
window) are ordinary join skew — AQE skew-join splitting applies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bin_width: int | None = None,
    strategy: str = "bin",
) -> DataFrame:
    """Inner join of ``points`` rows to the ``intervals`` rows whose
    half-open ``[start_col, end_col)`` window contains ``point_ts``
    (equal ``by`` keys required when given).  Output carries all point
    columns plus all interval columns (names must not collide).

    ``strategy='bin'`` (default) is the linear-shuffle decomposition
    described in the module docstring; ``bin_width`` defaults to 60
    (seconds) — size it near the median interval span.
    ``strategy='theta'`` emits the naive conditional join: correct, and
    occasionally optimal when ``intervals`` is broadcast-tiny, but
    never at scale."""
    by = list(by)
    overlap = set(points.columns) & set(intervals.columns) - set(by)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    range_cond = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    if strategy == "theta":
        # Join on the by-key NAMES (merged key columns) + post-filter, so
        # the theta path emits the SAME schema as the bin path — a raw
        # expression condition would keep both sides' copies of each
        # `by` column and make downstream references ambiguous.  With no
        # keys it stays the pure conditional (nested-loop) join.
        if by:
            return points.join(intervals, by).filter(range_cond)
        return points.join(intervals, range_cond)
    w = bin_width or 60
    # Empty/corrupt intervals (end <= start) can never contain a point,
    # but a hugely negative span would make `sequence` descend with
    # step -1 and explode |span|/w spurious bins — drop them up front.
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    # DIV: exact integer division (no double rounding at epoch scale)
    p = points.withColumn("__bin", F.expr(f"CAST({point_ts} AS BIGINT) DIV {w}"))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS BIGINT) DIV {w}"),
                F.expr(f"CAST({end_col} - 1 AS BIGINT) DIV {w}"),
            )
        ),
    )
    keys = ["__bin", *by]
    out = p.join(i, keys, "inner").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return out.drop("__bin")
