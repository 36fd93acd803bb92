"""Market analytics beyond the dashboard's 20 panels — the queries a
reference user writes next, built from the same primitives (interval
bucketing, broadcast dim joins, window functions).

All expressions keep the exact-arithmetic discipline of the parity
catalog: integer-valued money sums, ratios computed double-identically
on both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.intervals import to_start_of_interval


def vwap_by_interval(trades: DataFrame, interval_min: int) -> DataFrame:
    """Volume-weighted average price per (security, interval):
    ``sum(price*quantity)/sum(quantity)`` — one partial→final
    aggregation, no window."""
    return (
        trades.withColumn("minute", to_start_of_interval(F.col("time"), interval_min))
        .groupBy("sec_code", "minute")
        .agg(
            (
                F.sum(F.col("price") * F.col("quantity")) / F.sum("quantity")
            ).alias("vwap"),
            F.sum("quantity").alias("volume"),
        )
    )


def cumulative_volume(trades: DataFrame, interval_min: int) -> DataFrame:
    """Running traded volume per security over the session — the
    intraday volume curve.  One shuffle on sec_code; the running sum is
    a frame-bounded window over the pre-aggregated minutes (tiny)."""
    per_min = (
        trades.withColumn("minute", to_start_of_interval(F.col("time"), interval_min))
        .groupBy("sec_code", "minute")
        .agg(F.sum("quantity").alias("vol"))
    )
    w = Window.partitionBy("sec_code").orderBy("minute").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_min.select(
        "sec_code", "minute", "vol", F.sum("vol").over(w).alias("cum_vol")
    )


def minute_returns(candles: DataFrame) -> DataFrame:
    """Bucket-over-bucket price change per security from OHLCV rows
    (``bucket_s``, ``close``): ``close - lag(close)`` — NULL on the
    first bucket."""
    w = Window.partitionBy("sec_code").orderBy("bucket_s")
    return candles.select(
        "sec_code",
        "bucket_s",
        "close",
        (F.col("close") - F.lag("close").over(w)).alias("chg"),
    )


def price_percentiles_approx(trades: DataFrame, accuracy: int = 10000) -> DataFrame:
    """The 100 TB percentile path: ``percentile_approx`` (a mergeable
    KLL-style sketch — one map-side pass, tiny shuffle) instead of the
    exact sort-based ``percentile``.  Verified against
    :func:`price_percentiles` within the sketch's rank-error bound in
    tests; not oracle-paired (sketch internals are engine-specific)."""
    return trades.groupBy("sec_code").agg(
        F.percentile_approx("price", 0.5, accuracy).alias("p50"),
        F.percentile_approx("price", 0.9, accuracy).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


def price_percentiles(trades: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of price per security (median +
    p90).  Exact ``percentile`` — not ``percentile_approx`` — so the
    result is engine-independent; at 100 TB swap in the sketch and keep
    this as its verification oracle on samples."""
    return trades.groupBy("sec_code").agg(
        F.round(F.expr("percentile(price, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(price, 0.9)"), 6).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


def rolling_channel(trades: DataFrame, window_minutes: int = 10) -> DataFrame:
    """Donchian-style rolling channel per security: trailing
    ``window_minutes``-bar high / low / volume over 1-minute bars.

    Two-level shape: the minute-bar aggregation is a plain hash agg
    whose map-side partial combine collapses ticks BEFORE its shuffle,
    so the first Exchange carries bars, not ticks; the rolling frame
    is a ROWS window over the already-tiny bar series behind a second,
    bar-sized Exchange on sec_code.  (Repartitioning by sec_code up
    front would merge the two Exchanges into one — but that one would
    carry RAW ticks, strictly worse at scale; two small shuffles beat
    one big one.)  All the math is max/min/integer sums on
    integer-valued doubles — exact, engine-independent."""
    bars = (
        trades.withColumn("minute_s", F.expr("time_s DIV 60 * 60"))
        .groupBy("sec_code", "minute_s")
        .agg(
            F.max("price").alias("px_high"),
            F.min("price").alias("px_low"),
            F.sum(F.col("price") * F.col("quantity")).alias("vol"),
        )
    )
    w = (
        Window.partitionBy("sec_code")
        .orderBy("minute_s")
        .rowsBetween(-(window_minutes - 1), 0)
    )
    return bars.select(
        "sec_code",
        "minute_s",
        F.max("px_high").over(w).alias("roll_high"),
        F.min("px_low").over(w).alias("roll_low"),
        F.sum("vol").over(w).alias("roll_vol"),
    )


def trailing_time_stats(trades: DataFrame, seconds: int = 300) -> DataFrame:
    """Trailing-``seconds`` activity per trade event: count and volume
    of the security's trades in ``(t - seconds, t]`` — the event-time
    sliding aggregate behind "trades in the last 5 minutes" tickers.

    This is a **RANGE** window frame (``rangeBetween`` on the epoch
    seconds), the class a ROWS frame (an05) cannot express on
    irregularly spaced events: the frame width is wall-clock, not a
    row count.  Both engines define RANGE frames to include ALL peer
    rows sharing the current order value, so same-second trades see
    each other symmetrically — deterministic without a tiebreak.

    Plan: one Exchange on sec_code + one sort; Spark evaluates the
    sliding frame with a moving two-pointer over the sorted run (no
    per-row rescan).  At 100 TB the partition key is the security —
    skew on a hot symbol is ordinary window skew; pre-bucketing by
    (sec_code, day) bounds any one sort run."""
    w = (
        Window.partitionBy("sec_code")
        .orderBy(F.col("time_s").cast("long"))
        .rangeBetween(-(seconds - 1), 0)
    )
    return trades.select(
        "sec_code",
        "time_s",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum("quantity").over(w).cast("long").alias("vol_trailing"),
    )


def twap(
    history: DataFrame,
    frm: int,
    to: int,
    keys: Sequence[str] = ("sec_code",),
    value_col: str = "price",
    ts_from: str = "valid_from_s",
    ts_to: str = "valid_to_s",
) -> DataFrame:
    """Time-weighted average price over SCD2 validity intervals
    (:func:`..operators.scd2.scd2_history` output): each value run
    contributes ``value × overlap([from,to), run)`` seconds —
    the standard TWAP/TWAR definition, and the duration-weighted
    aggregation class (vs an01's volume-weighted VWAP).

    Open runs (NULL ``ts_to``) extend to ``to``.  Runs outside the
    window contribute nothing (narrow filter, pushes to the scan).
    Exactness: integer second weights × integer-valued prices — the
    quotient is ONE double division of two exact integers, identical
    on any IEEE engine.  Plan: filter + one hash agg, no window."""
    keys = list(keys)
    w_start = F.greatest(F.col(ts_from), F.lit(frm))
    w_end = F.least(F.coalesce(F.col(ts_to), F.lit(to)), F.lit(to))
    dur = w_end - w_start
    return (
        history.filter((F.col(ts_from) < to) & (w_end > w_start))
        .groupBy(*keys)
        .agg(
            F.sum(dur).cast("long").alias("covered_s"),
            F.round(
                F.sum(F.col(value_col) * dur) / F.sum(dur), 6
            ).alias("twap"),
        )
    )


def ema(
    bars: DataFrame,
    value_col: str = "close",
    key_col: str = "sec_code",
    order_col: str = "bucket_s",
    alpha: float = 0.2,
) -> DataFrame:
    """Exponential moving average per key over an ordered bar series —
    ClickHouse's ``exponentialMovingAverage`` for the candle tables.

    The recurrence ``e_t = e_{t-1} + α·(x_t − e_{t-1})`` (e_0 = x_0) is
    inherently sequential per key, so this is the applyInPandas case by
    design: one grouped pass where each group is ONE security's bar
    series — bounded by the trading day, not the corpus, exactly like
    the exact candle fold (`ingest/candles.py`).  No closed-form window
    trick is used on purpose: the Σ x_i·(1−α)^(t−i) reformulation needs
    (1−α)^(−i) factors that overflow/denormalize on long series.

    Engine-exactness: the recurrence fixes the float evaluation ORDER,
    so an engine replaying the identical IEEE ops (e.g. a recursive SQL
    CTE with the same update expression) reproduces the result
    bit-for-bit — no rounding tolerance needed, unlike the BLAS
    reductions in the ANN family.

    Output: (key_col, order_col, value_col, ``ema`` double)."""
    import pandas as pd

    a = float(alpha)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        e = None
        out = []
        for x in pdf[value_col].astype("float64"):
            e = x if e is None else e + a * (x - e)
            out.append(e)
        pdf = pdf.copy()
        pdf["ema"] = out
        return pdf

    schema_src = bars.select(key_col, order_col, F.col(value_col).cast("double").alias(value_col))
    return schema_src.groupBy(key_col).applyInPandas(
        fold,
        schema=f"{key_col} string, {order_col} bigint, {value_col} double, ema double",
    )


def ema_stream(
    bars_stream: DataFrame,
    value_col: str = "close",
    key_col: str = "sec_code",
    order_col: str = "bucket_s",
    alpha: float = 0.2,
) -> DataFrame:
    """Streaming :func:`ema`: the recurrence's state is ONE double per
    key (the last EMA), carried in GroupState across micro-batches —
    the smallest possible stateful-stream operator, same machinery as
    the exact candle builder (`ingest/candles.py:228`).  Within a
    micro-batch rows fold in ``order_col`` order; across batches the
    source must deliver a key's bars in order (true for the replay/
    backfill shape: time-ordered micro-batches).

    Restart-safe by construction: state lives in the checkpoint, so a
    killed query resumes the recurrence exactly (see
    tests/test_streaming_curation.py for the restart pattern)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    a = float(alpha)
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(order_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("ema", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("e", T.DoubleType())])

    def fold(key, pdfs, state: GroupState):
        e = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="stable")
            for t, x in zip(pdf[order_col], pdf[value_col].astype("float64")):
                e = x if e is None else e + a * (x - e)
                rows.append((key[0], int(t), float(x), e))
        if e is not None:
            state.update((float(e),))
        if rows:
            yield pd.DataFrame(rows, columns=[key_col, order_col, value_col, "ema"])

    return bars_stream.select(
        key_col, order_col, F.col(value_col).cast("double").alias(value_col)
    ).groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def max_drawdown(candles: DataFrame) -> DataFrame:
    """Maximum drawdown per security from a bar series (``bucket_s``,
    ``close``): the most negative ``close / running_peak − 1``, with
    the bucket where it bottomed — the running-extrema window class
    (cummax composed into a ratio, then an argmin).

    Plan shape: one (sec_code) exchange reused by BOTH windows (the
    running max and the argmin rank share the partitioning), bar-sized
    input — ticks never enter a window.  Exact cross-engine: one IEEE
    division per bar under round(…, 6)."""
    w = (
        Window.partitionBy("sec_code")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = candles.select(
        "sec_code",
        "bucket_s",
        F.round(F.col("close") / F.max("close").over(w) - 1, 6).alias("dd"),
    )
    r = Window.partitionBy("sec_code").orderBy("dd", "bucket_s")
    return (
        scored.withColumn("rn", F.row_number().over(r))
        .filter(F.col("rn") == 1)
        .select(
            "sec_code",
            F.col("dd").alias("max_drawdown"),
            F.col("bucket_s").alias("at_bucket_s"),
        )
    )
