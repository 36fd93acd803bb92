"""Native session windows — Spark's ``session_window`` (dynamic-gap
session aggregation) in both batch and Structured Streaming form.

The batch sessionizer the catalog already checks (ev03) is the
classic gaps-and-islands window-function plan: a per-user sort, a
``lag`` diff, a running flag sum.  That is the right shape for a
*report* over a closed day, but it is not streamable — the sort/lag
pipeline needs the whole history per key.  Spark ships a first-class
alternative: ``F.session_window(ts, gap)`` is a GROUP BY key whose
windows merge as events arrive, runs in one hash-aggregation pass
(no per-key sort), and carries the SAME semantics into
``readStream`` — with a watermark, sessions close and emit exactly
once when the gap expires (append mode).  A 100 TB engine wants both:
the window-function form for ad-hoc SQL parity, the session_window
form for the always-on stream.

Semantics (both modes): a session is a maximal run of events per key
where consecutive events are ``<= gap`` apart — each event's window
is ``[ts, ts + gap)`` and Spark coalesces overlapping AND adjacent
windows, so a successor exactly ``gap`` seconds later CONTINUES the
session (verified empirically: events at 0 and 1800 with gap 1800
merge into one ``[0, 3600)`` session).  The emitted ``session_end``
is ``last_event_ts + gap`` (Spark's contract); ``n_events``/value
aggregates cover the merged run.

A gaps-and-islands oracle mirror therefore breaks sessions on
``ts - prev_ts > gap`` — the same strict-``>`` rule ev03 uses, so the
two sessionizers agree on session MEMBERSHIP and differ only in
output shape (per-session rows + gap-padded end here, per-user counts
there).

Reference: the exporter itself has no sessionizer (its Go loop is
stateless row shaping, ``main.go:121-228``); this is part of the
generic event-analytics surface a ClickHouse-backed stack gets from
CH SQL, per SURVEY §2.3/§6.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sessionized(
    events: DataFrame,
    gap_seconds: int,
    ts_col: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Shared groupBy(session_window)+agg plan, epoch-second bounds.
    Output: ``(*keys, session_start_s, session_end_s, n_events,
    *agg aliases in order)``."""
    sw = F.session_window("__ts", f"{gap_seconds} seconds")
    out = events.groupBy(sw, *keys).agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    agg_names = [c for c in out.columns if c not in ("session_window", *keys, "n_events")]
    return out.select(
        *keys,
        F.unix_timestamp(F.col("session_window.start")).alias("session_start_s"),
        F.unix_timestamp(F.col("session_window.end")).alias("session_end_s"),
        F.col("n_events"),
        *[F.col(c) for c in agg_names],
    )


def session_windows(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts_s",
    keys: Sequence[str] = ("user_id",),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Batch session aggregation via native ``session_window``:
    one row per (keys…, session).  Plan: ONE hash aggregation with
    partial map-side merge — no per-key sort, unlike the lag/flag-sum
    sessionizer (ev03)."""
    ev = events.withColumn("__ts", F.timestamp_seconds(F.col(ts_col)))
    return _sessionized(ev, gap_seconds, ts_col, keys, aggs)


def session_windows_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts_s",
    keys: Sequence[str] = ("user_id",),
    aggs: Sequence[Column] = (),
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming form: same output contract as :func:`session_windows`,
    over a ``readStream`` DataFrame.  Sessions are held in the state
    store while open and emitted exactly once (append mode) when the
    watermark passes ``last_event + gap`` — state is O(open sessions)
    per key, and the watermark bounds total state regardless of stream
    length.  Late events inside the delay re-open and re-merge their
    session before it is finalized."""
    ev = events.withColumn("__ts", F.timestamp_seconds(F.col(ts_col))).withWatermark(
        "__ts", watermark_delay
    )
    return _sessionized(ev, gap_seconds, ts_col, keys, aggs)
