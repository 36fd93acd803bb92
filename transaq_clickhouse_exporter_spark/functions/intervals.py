"""Tumbling time-bucket helpers — ClickHouse ``toStartOfInterval`` parity.

Every time-series dashboard query buckets with
``toStartOfInterval(time, INTERVAL $interval MINUTE)`` where interval ∈
{1,3,5,10,12,15,20,24,30,48,60,120,240,480}
(``etc/grafana-dashboard-trades.json:113, 3784``).  ClickHouse floors
the *wall-clock* time in the column's timezone; with the session tz
pinned to the same zone, flooring the epoch is identical for
minute-granularity intervals (offsets from UTC are whole minutes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_start_of_interval(ts: Column, minutes: int) -> Column:
    """Floor a timestamp column to an ``n``-minute boundary, returning a
    timestamp.  Expressed via epoch floor-division so Catalyst folds it
    into whole-stage codegen (no UDF, no window-function shuffle)."""
    step = int(minutes) * 60
    return F.timestamp_seconds((F.unix_timestamp(ts) / step).cast("long") * step)


def to_start_of_interval_epoch(epoch_s: Column, minutes: int) -> Column:
    """Same flooring on an epoch-seconds (bigint) column — the
    timezone-free fast path used when timestamps are carried as epochs."""
    step = int(minutes) * 60
    return ((epoch_s / step).cast("long") * step).cast("long")
