"""Stateful OHLCV candle builder — O-10, the reference's only bespoke
stateful operator (``/root/reference/process.go:126-169``).

Exact fold semantics (per ``SecId``, in arrival order):

- boundary tick (``Time`` ends ``':00'`` AND ``Last > 0`` AND an
  accumulator exists): emit ``(open=acc.open, close=Last, high=acc.high,
  low=acc.low, volume=acc.volume, period=1, date=server_date+' '+Time)``
  then reset the accumulator to the zero struct (which *stays present*).
  The boundary tick's own Last/Quantity are NOT folded into either
  candle (they only provide close).
- otherwise, accumulator exists: ``open`` backfills from the first
  non-zero ``Open`` field while ``acc.open == 0`` (process.go:147-149);
  ``high = max(high, Last)``; ``low = Last if Last < low or low == 0``
  (NB a ``Last == 0`` tick drives low to 0 — faithful to
  process.go:153-155); ``volume += Quantity``.
- first tick ever for the key: init ``{open: Last, low: Last,
  high: Last, volume: Quantity}`` (process.go:160-166 — note init uses
  ``Last``, not the ``Open`` field).

Three implementations, one semantics:

- :func:`fold_ticks` — pure-Python reference fold (golden oracle).
- :func:`quotation_candles_batch` — ``groupBy(sec_id).applyInPandas``:
  the fold is inherently sequential *per key*, so parallelism comes
  from hash-partitioning on ``sec_id`` (thousands of securities →
  thousands-way parallel; per-key tick counts are bounded by one
  session day, so no partition blowup at 100 TB).
- :func:`quotation_candles_stream` — ``applyInPandasWithState``
  (GroupState carries the accumulator across micro-batches).

:func:`candles_windowed` is the clean declarative variant (tumbling
window, standard first/last/max/min OHLCV) — documented divergences:
standard ``low`` ignores nothing, every tick folds, emit per window
whether or not a boundary tick exists.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema shared by all three implementations (candle date kept
#: as the reference's wall-clock string; parse with shape_candles).
CANDLE_OUT_SCHEMA = (
    "sec_code string, period int, date string, open double, close double, "
    "high double, low double, volume long"
)
_STATE_SCHEMA = "open double, high double, low double, volume long, exists boolean"


@dataclass
class Acc:
    open: float = 0.0
    high: float = 0.0
    low: float = 0.0
    volume: int = 0


def fold_ticks(rows, emit_date: str, acc: Acc | None = None):
    """Pure-Python exact fold.  ``rows``: iterable of dicts with keys
    ``sec_code, time, open, last, quantity`` (single security, arrival
    order).  Returns (emitted candle dicts, final accumulator or None).
    """
    candles = []
    for r in rows:
        last = float(r["last"] or 0.0)
        if r["time"].endswith(":00") and last > 0 and acc is not None:
            candles.append(
                {
                    "sec_code": r["sec_code"],
                    "period": 1,
                    "date": f"{emit_date} {r['time']}",
                    "open": acc.open,
                    "close": last,
                    "high": acc.high,
                    "low": acc.low,
                    "volume": acc.volume,
                }
            )
            acc = Acc()  # zero struct, still present (process.go:144)
        elif acc is not None:
            if acc.open == 0 and (r["open"] or 0) != 0:
                acc.open = float(r["open"])
            if last > acc.high:
                acc.high = last
            if last < acc.low or acc.low == 0:
                acc.low = last
            acc.volume += int(r["quantity"] or 0)
        else:
            acc = Acc(open=last, high=last, low=last, volume=int(r["quantity"] or 0))
    return candles, acc


def fold_ticks_vectorized(
    times, opens, lasts, qtys, sec_code: str, emit_date: str, acc: Acc | None = None
):
    """Numpy segment-vectorized equivalent of :func:`fold_ticks` —
    ~50-100× the per-core throughput of the Python loop, same results
    (hypothesis-verified equivalence in tests/test_properties.py).

    Key observation: whether a tick *emits* depends only on its
    position, its time suffix, and ``Last > 0`` — never on accumulator
    values — so emit points are computable up front and the fold
    decomposes into independent segments between emits:

    - ``high`` = max of lasts in the segment (update rule only raises),
    - ``low``  = min of lasts after the segment's final ``Last == 0``
      tick (a zero drives low to 0 and the next tick's ``low == 0``
      branch re-seeds it) — 0 if the zero is last,
    - ``volume`` = sum of quantities (emitting ticks belong to no
      segment: the reference drops their quantity),
    - ``open`` = first tick's Last for the initial segment (init path),
      else the first non-zero Open field (zero-struct backfill); a
      carried accumulator supplies open/high/low/volume merge-ins.
    """
    import numpy as np

    n = len(lasts)
    lasts = np.asarray(lasts, dtype=np.float64)
    opens = np.asarray(opens, dtype=np.float64)
    qtys = np.asarray(qtys, dtype=np.int64)
    boundary = np.array([t.endswith(":00") for t in times])
    emits = boundary & (lasts > 0)
    if acc is None:
        emits[0:1] = False  # no accumulator before the first tick
    emit_idx = np.flatnonzero(emits)

    candles = []
    seg_start = 0
    cur = acc  # accumulator entering the current segment (None = not exists)
    for e in emit_idx.tolist() + [n]:
        is_emit = e < n
        s, seg_end = seg_start, e  # ticks s..e-1 update; tick e emits
        if seg_end > s:
            seg_last = lasts[s:seg_end]
            seg_open = opens[s:seg_end]
            seg_q = qtys[s:seg_end]
            if cur is None:
                # init path: first tick seeds open/high/low/vol from Last
                o = seg_last[0]
                merged_open_seed = o
                base_low, base_high, base_vol = None, 0.0, 0
                backfill = seg_open[1:]
                o_is_zero = o == 0
            else:
                merged_open_seed = cur.open
                base_low, base_high, base_vol = cur.low, cur.high, cur.volume
                backfill = seg_open
                o_is_zero = cur.open == 0
            if o_is_zero:
                nz = backfill[backfill != 0]
                new_open = float(nz[0]) if len(nz) else merged_open_seed
            else:
                new_open = merged_open_seed
            high = float(max(base_high, seg_last.max()))
            zeros = np.flatnonzero(seg_last == 0)
            if len(zeros):
                k = zeros[-1]
                tail = seg_last[k + 1 :]
                low = float(tail.min()) if len(tail) else 0.0
            else:
                if cur is None:
                    low = float(seg_last.min())
                elif base_low == 0:
                    low = float(seg_last.min())
                else:
                    low = float(min(base_low, seg_last.min()))
            vol = int((base_vol or 0) + seg_q.sum())
            cur = Acc(open=float(new_open), high=high, low=low, volume=vol)
        elif cur is None and is_emit:
            # can't happen: emits[0] forced False when acc is None
            cur = None
        if is_emit:
            a = cur if cur is not None else Acc()
            candles.append(
                {
                    "sec_code": sec_code,
                    "period": 1,
                    "date": f"{emit_date} {times[e]}",
                    "open": a.open,
                    "close": float(lasts[e]),
                    "high": a.high,
                    "low": a.low,
                    "volume": a.volume,
                }
            )
            cur = Acc()  # zero struct, still present
            seg_start = e + 1
    return candles, cur


def _fold_pdf(pdf: pd.DataFrame, emit_date: str, acc: Acc | None):
    pdf = pdf.sort_values("seq", kind="stable")
    if len(pdf) == 0:
        return [], acc
    return fold_ticks_vectorized(
        pdf["time"].tolist(),
        pdf["open"].to_numpy(),
        pdf["last"].to_numpy(),
        pdf["quantity"].to_numpy(),
        str(pdf["sec_code"].iloc[0]),
        emit_date,
        acc,
    )


def quotation_candles_batch(df: DataFrame, emit_date: str) -> DataFrame:
    """Batch/backfill variant: exact fold per security.  ``df`` needs
    columns (sec_id, sec_code, time, open, last, quantity, seq) where
    ``seq`` is the arrival order within each sec_id."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        candles, _ = _fold_pdf(pdf, emit_date, None)
        return pd.DataFrame(
            candles,
            columns=["sec_code", "period", "date", "open", "close", "high", "low", "volume"],
        )

    return df.groupBy("sec_id").applyInPandas(fold, schema=CANDLE_OUT_SCHEMA)


def quotation_candles_stream(df: DataFrame, emit_date: str) -> DataFrame:
    """Streaming variant: same fold with the accumulator carried in
    GroupState across micro-batches.  ``df`` is a streaming DataFrame
    with the same columns as the batch variant."""

    def fold(key, pdfs, state: GroupState):
        if state.exists:
            o, h, lo, v, present = state.get
            acc = Acc(o, h, lo, v) if present else None
        else:
            acc = None
        out = []
        for pdf in pdfs:
            candles, acc = _fold_pdf(pdf, emit_date, acc)
            out.extend(candles)
        if acc is not None:
            state.update((acc.open, acc.high, acc.low, acc.volume, True))
        if out:
            yield pd.DataFrame(
                out,
                columns=["sec_code", "period", "date", "open", "close", "high", "low", "volume"],
            )

    return df.groupBy("sec_id").applyInPandasWithState(
        fold,
        outputStructType=CANDLE_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def candles_windowed_stream(
    df: DataFrame, minutes: int = 1, watermark: str = "2 minutes"
) -> DataFrame:
    """Structured-Streaming windowed OHLCV (the O-10 declarative
    fallback, SURVEY §4.3): tumbling event-time windows with a
    watermark bounding state and admitting late ticks up to the delay.
    ``min_by/max_by(last, seq)`` give deterministic open/close without
    per-key sequential folding — fully parallel streaming aggregation.
    Append mode: a candle emits exactly once, when the watermark passes
    its window end (the reference instead emits on a ``:00`` boundary
    tick and silently never emits minutes lacking one)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes"), "sec_code")
        .agg(
            F.min_by("last", "seq").alias("open"),
            F.max_by("last", "seq").alias("close"),
            F.max("last").alias("high"),
            F.min("last").alias("low"),
            F.sum("quantity").alias("volume"),
        )
        .select(
            "sec_code", F.col("window.start").alias("bucket_start"),
            "open", "close", "high", "low", "volume",
        )
    )


def rollup_candles(df: DataFrame, minutes: int, bucket_col: str = "bucket_s") -> DataFrame:
    """Continuous-aggregate-style OHLCV rollup: combine fine candles
    into coarser ones (1-min → N-min/hourly/daily).  OHLCV composes
    associatively — open from the earliest sub-candle (``min_by``),
    close from the latest, extrema and volume merge directly — so
    rollups are ordinary partial→final aggregation: one shuffle, no
    window.  This is how a 100 TB candle store serves every dashboard
    ``$interval`` from one 1-minute base table."""
    step = minutes * 60
    bucket = ((F.col(bucket_col) / step).cast("long") * step).alias(bucket_col)
    return (
        df.groupBy("sec_code", bucket)
        .agg(
            F.min_by("open", bucket_col).alias("open"),
            F.max_by("close", bucket_col).alias("close"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("volume").alias("volume"),
        )
    )


def candles_windowed(df: DataFrame, minutes: int = 1) -> DataFrame:
    """Declarative tumbling-window OHLCV over ticks with an event-time
    ``ts`` (timestamp) and arrival order ``seq`` — the clean variant the
    dashboard actually needs, fully parallel and whole-stage-codegen'd.
    Standard semantics (all ticks fold; low/high over all Last values).

    Plain grouped aggregation, not a per-row window + DISTINCT: with
    ``seq`` unique, ``min_by/max_by(last, seq)`` ARE first/last in seq
    order, so the whole candle reduces map-side — only per-group
    partials shuffle (vs every tick, sorted, under the window form).
    """
    step = minutes * 60
    bucket = ((F.unix_timestamp("ts") / step).cast("long") * step).alias("bucket_s")
    return (
        df.select("sec_code", bucket, "last", "quantity", "seq")
        .groupBy("sec_code", "bucket_s")
        .agg(
            F.min_by("last", "seq").alias("open"),
            F.max_by("last", "seq").alias("close"),
            F.max("last").alias("high"),
            F.min("last").alias("low"),
            F.sum("quantity").alias("volume"),
        )
    )
