"""As-of join — the canonical market-data operator Spark lacks
natively (join each left row to the latest right row at-or-before its
timestamp, per key).  The reference's dashboard never needs it, but a
trades⋈quotes engine without it is incomplete; it also generalizes the
positions-merge pattern (O-11) to two-sided streams.

Implementation is the **union + last-ignorenulls window** trick, not a
per-group ``pd.merge_asof`` UDF:

1. tag right rows side=0 carrying their payload, left rows side=1 with
   NULL payload;
2. union; one window per key ordered by (ts, side) — at equal
   timestamps the right row sorts first, giving the standard
   ``left.ts >= right.ts`` inclusive semantics;
3. ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame pulls the latest right payload onto every left row;
4. keep side=1.

Scale shape: ONE shuffle (the window partition on the key), no
row-pairing blowup, no Python.  Skewed keys behave like any windowed
aggregation (AQE/salting apply).  ``tolerance`` optionally voids
matches older than the given seconds, like ``pd.merge_asof``."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "time",
    right_ts: str = "time",
    tolerance_seconds: int | None = None,
    right_ts_out: str | None = None,
) -> DataFrame:
    """Left as-of join.  Right payload columns (everything except
    ``by`` + ``right_ts``) appear on the output with their own names;
    left rows with no prior right row get NULLs.  ``right_ts_out``
    additionally emits the MATCHED right row's timestamp under that
    name (NULL = no match) — the match indicator ClickHouse's inner
    ``ASOF JOIN`` semantics need."""
    by = list(by)
    if left_ts in by or right_ts in by:
        raise ValueError("timestamp column must not be a key column")
    l_cols = [c for c in left.columns if c not in by + [left_ts]]
    payload = [c for c in right.columns if c not in by + [right_ts]]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    l_tag = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(left_ts),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tag = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c) for c in payload],
        F.col(right_ts).alias("__rts"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *by,
        "__ts",
        "__side",
        left_ts,
        *l_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
        F.last("__rts", ignorenulls=True).over(w).alias("__rts"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        is_ts = right.schema[right_ts].dataType.typeName().startswith("timestamp")
        as_s = (lambda c: F.unix_timestamp(c)) if is_ts else (lambda c: F.col(c) if isinstance(c, str) else c)
        stale = (
            F.col("__rts").isNull()
            | (as_s("__ts") - as_s("__rts") > tolerance_seconds)
        )
        out = out.select(
            *by, left_ts, *l_cols,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in payload],
            *(
                [F.when(stale, F.lit(None)).otherwise(F.col("__rts")).alias(right_ts_out)]
                if right_ts_out
                else []
            ),
        )
    else:
        out = out.select(
            *by, left_ts, *l_cols, *payload,
            *([F.col("__rts").alias(right_ts_out)] if right_ts_out else []),
        )
    return out
