"""Streaming as-of enrichment — the real-time twin of
:func:`operators.asof.asof_join` (trades joined to the latest quote
at-or-before each trade, per security, as both arrive).

The reference streams trades AND quotes side by side
(kmlebedev/transaq-clickhouse-exporter ``process.go`` shapes both into
ClickHouse and the dashboard joins them at query time); this operator
does the join IN the stream, so a sink receives already-enriched
trades.

Plan: the batch operator's union+window trick made stateful —

1. both streams tag and union (side 0 = right/quote with its payload
   struct, side 1 = left/trade);
2. ``groupBy(key).applyInPandasWithState``: state carries the LATEST
   right row (payload + its timestamp) seen so far per key;
3. each micro-batch materializes ALL of the group's Arrow chunks
   (Spark splits a group at ``arrow.maxRecordsPerBatch`` in arbitrary
   chunk order), sorts once by (ts, side) — right before left at
   equal timestamps, the inclusive ``l.ts >= r.ts`` rule — and a
   single vectorized ``pd.merge_asof`` joins the batch's left rows
   against the batch's right rows PLUS the carried state row;
4. left rows emit with the matched payload (NULL when no right row
   has arrived yet); the newest right row replaces the state.

ORDER CONTRACT (documented, tested): results equal the batch
``asof_join`` on the same data when right rows arrive in
micro-batches no later than any left row of greater timestamp —
i.e. per-key event-time order ACROSS micro-batches, which the
replay source preserves and real exchange feeds guarantee per
instrument.  WITHIN a micro-batch any order is fine (sorted).  A
right row arriving in a LATER micro-batch than a left row with
ts >= its own is matched only to subsequent lefts — the standard
no-retraction streaming as-of contract (append output mode cannot
revise emitted rows).  A right row arriving in a later micro-batch
with ts BELOW the carried state (cross-batch right disorder) never
crashes the query: it degrades to fewer/older matches for that batch
and the state keeps the max-ts right.

Scale shape: state is ONE row per key (the latest right), not a
buffer; per-batch work is a sort + merge_asof over Arrow-transferred
pandas frames.  Keys partition the state store exactly like the
candle builder (``ingest/candles.py``) and positions merge
(``ingest/positions.py``)."""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "time",
    right_ts: str = "time",
    right_ts_out: str = "matched_ts",
) -> DataFrame:
    """Backward-inclusive streaming as-of join (the CH ``ASOF JOIN``
    comparator, LEFT form: unmatched lefts emit with NULLs — filter
    ``right_ts_out IS NOT NULL`` for INNER gating).

    ``left`` / ``right`` are streaming DataFrames sharing the ``by``
    key columns; timestamps must be numeric or timestamp-typed (they
    are compared, never parsed).  Right payload columns (everything
    except ``by`` + ``right_ts``) appear on the output under their
    own names and must not collide with left columns."""
    by = list(by)
    if left_ts in by or right_ts in by:
        raise ValueError("timestamp column must not be a key column")
    l_cols = [c for c in left.columns if c not in by + [left_ts]]
    payload = [c for c in right.columns if c not in by + [right_ts]]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns collide with left: {sorted(overlap)}")

    lt = left.select(
        *by,
        F.col(left_ts).cast("double").alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__lts_orig"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    rt = right.select(
        *by,
        F.col(right_ts).cast("double").alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias("__lts_orig"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_cols],
        *[F.col(c) for c in payload],
        F.col(right_ts).alias("__rts"),
    )
    u = lt.unionByName(rt)

    out_schema = T.StructType(
        [left.schema[c] for c in by]
        + [left.schema[left_ts]]
        + [left.schema[c] for c in l_cols]
        + [T.StructField(c, right.schema[c].dataType) for c in payload]
        + [T.StructField(right_ts_out, right.schema[right_ts].dataType)]
    )
    # state: the latest right row — its ts (double, for comparison),
    # original-typed matched ts, payload fields, and a present flag
    state_schema = T.StructType(
        [T.StructField("__sts", T.DoubleType())]
        + [T.StructField("__srts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload]
        + [T.StructField("__present", T.BooleanType())]
    )
    n_by = len(by)
    out_names = [f.name for f in out_schema.fields]

    def fold(key, pdfs, state: GroupState):
        carry = state.get if state.exists else None  # tuple per state_schema
        # Materialize the WHOLE group micro-batch before sorting:
        # applyInPandasWithState hands the group over as Arrow chunks
        # split at spark.sql.execution.arrow.maxRecordsPerBatch in
        # arbitrary chunk order (the union even puts all lefts before
        # all rights), so per-chunk merge_asof would let lefts in an
        # early chunk silently miss rights in a later chunk with
        # smaller ts.  One concat + one sort + one merge instead.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if carry is not None:
                state.update(tuple(carry))
            return
        pdf = (chunks[0] if len(chunks) == 1
               else pd.concat(chunks, ignore_index=True))
        pdf = pdf.sort_values(["__ts", "__side"], kind="stable")
        rights = pdf[pdf["__side"] == 0]
        lefts = pdf[pdf["__side"] == 1]
        # right table for this batch: carried state row + batch rows
        rcols = {"__ts": rights["__ts"].to_numpy(),
                 "__rts": rights["__rts"].to_numpy()}
        for c in payload:
            rcols[c] = rights[c].to_numpy()
        rdf = pd.DataFrame(rcols)
        if carry is not None and carry[-1]:
            head = {"__ts": [carry[0]], "__rts": [carry[1]]}
            for i, c in enumerate(payload):
                head[c] = [carry[2 + i]]
            hdf = pd.DataFrame(head)
            # concat of an EMPTY all-NA frame changes dtypes under
            # pandas' announced future behavior — branch instead
            rdf = (pd.concat([hdf, rdf], ignore_index=True)
                   if len(rdf) else hdf)
            # A right row arriving in a later micro-batch with ts
            # BELOW the carried state (cross-batch right disorder)
            # would leave rdf unsorted and merge_asof would raise —
            # re-sort instead (stable: the carry row sits first, so at
            # equal ts the batch's own row wins, and such disorder
            # degrades to fewer/older matches rather than a crash).
            rdf = rdf.sort_values("__ts", kind="stable",
                                  ignore_index=True)
        if len(rdf):
            # advance the carry to the max-ts right row (positionally
            # last only BECAUSE rdf is sorted — never trust raw order)
            last = rdf.iloc[-1]
            carry = (float(last["__ts"]), last["__rts"],
                     *[last[c] for c in payload], True)
        if carry is not None:
            state.update(tuple(carry))
        if len(lefts):
            if len(rdf):
                merged = pd.merge_asof(
                    lefts.reset_index(drop=True), rdf,
                    on="__ts", direction="backward",
                    allow_exact_matches=True,
                    suffixes=("__l", ""),
                )
            else:
                merged = lefts.reset_index(drop=True)
            yield pd.DataFrame({
                **{c: [key[i]] * len(merged)
                   for i, c in enumerate(by)},
                out_names[n_by]: merged["__lts_orig"],
                **{c: merged[c] for c in l_cols},
                **{c: merged[c] for c in payload},
                out_names[-1]: merged["__rts"],
            })

    return u.groupBy(*by).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
