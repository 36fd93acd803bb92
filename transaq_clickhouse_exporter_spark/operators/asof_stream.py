"""Streaming as-of enrichment — the real-time twin of
:func:`operators.asof.asof_join` (trades joined to the latest quote
at-or-before each trade, per security, as both arrive).

The reference streams trades AND quotes side by side
(kmlebedev/transaq-clickhouse-exporter ``process.go`` shapes both into
ClickHouse and the dashboard joins them at query time); this operator
does the join IN the stream, so a sink receives already-enriched
trades.

Plan: the batch operator's union+window trick made stateful —

1. all streams tag and union (sides 0..k−1 = the right/quote sides
   with their payloads, side k = left/trade — so the (ts, side) sort
   puts rights before lefts at equal timestamps);
2. ``groupBy(key).applyInPandasWithState``: state carries the LATEST
   right row PER SIDE (k slots in one struct) seen so far per key;
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


def asof_join_stream_multi(
    left: DataFrame,
    rights: Sequence[tuple[DataFrame, str, str]],
    by: Sequence[str],
    left_ts: str = "time",
) -> DataFrame:
    """Backward-inclusive streaming as-of join against MULTIPLE right
    sides sharing the equality key — the streaming twin of
    :func:`operators.asof.asof_join_multi` (r16, VERDICT r15 item 4):
    each left row emits once, enriched per side with the latest right
    row at-or-before its own timestamp.

    ``rights``: (right_df, right_ts, right_ts_out) triples.  Payload
    columns (everything except ``by`` + that side's ts) must be
    disjoint across sides and from the left — same contract as the
    batch operator.  State per key is ONE row per side (k carry
    slots in one struct), and all k sides ride ONE
    ``applyInPandasWithState`` over ONE union — one keyed exchange,
    exactly the batch operator's single-shuffle shape made stateful.
    Unmatched sides emit NULLs (LEFT form; filter a side's
    ``right_ts_out IS NOT NULL`` for INNER gating)."""
    by = list(by)
    rights = [tuple(r) for r in rights]
    if not rights:
        raise ValueError("asof_join_stream_multi needs >= 1 right side")
    if left_ts in by or any(rts in by for _, rts, _ in rights):
        raise ValueError("timestamp column must not be a key column")
    k = len(rights)
    l_cols = [c for c in left.columns if c not in by + [left_ts]]
    taken = set(left.columns)
    payloads: list[list[str]] = []
    for rdf_, rts, out_col in rights:
        pay = [c for c in rdf_.columns if c not in by + [rts]]
        clash = (set(pay) | {out_col}) & taken
        if clash:
            raise ValueError(
                f"right payload/output columns collide: {sorted(clash)}")
        taken |= set(pay) | {out_col}
        payloads.append(pay)

    def _nulls_for(side_exclude: int):
        """NULL-typed literals for every OTHER side's payload + rts."""
        cols = []
        for j, ((rdf_, rts, _), pay) in enumerate(zip(rights, payloads)):
            if j == side_exclude:
                continue
            cols += [F.lit(None).cast(rdf_.schema[c].dataType).alias(c)
                     for c in pay]
            cols.append(F.lit(None).cast(rdf_.schema[rts].dataType)
                        .alias(f"__rts{j}"))
        return cols

    # side k = left so the (ts, side) sort keeps every right row
    # before any left row at equal timestamps (inclusive l.ts >= r.ts)
    lt = left.select(
        *by,
        F.col(left_ts).cast("double").alias("__ts"),
        F.lit(k).alias("__side"),
        F.col(left_ts).alias("__lts_orig"),
        *[F.col(c) for c in l_cols],
        *_nulls_for(-1),
    )
    srcs = [lt]
    for i, ((rdf_, rts, _), pay) in enumerate(zip(rights, payloads)):
        srcs.append(rdf_.select(
            *by,
            F.col(rts).cast("double").alias("__ts"),
            F.lit(i).alias("__side"),
            F.lit(None).cast(left.schema[left_ts].dataType)
            .alias("__lts_orig"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in l_cols],
            *[F.col(c) for c in pay],
            F.col(rts).alias(f"__rts{i}"),
            *_nulls_for(i),
        ))
    u = srcs[0]
    for s in srcs[1:]:
        u = u.unionByName(s)

    out_fields = (
        [left.schema[c] for c in by]
        + [left.schema[left_ts]]
        + [left.schema[c] for c in l_cols]
    )
    for (rdf_, rts, out_col), pay in zip(rights, payloads):
        out_fields += [T.StructField(c, rdf_.schema[c].dataType)
                       for c in pay]
        out_fields.append(T.StructField(out_col, rdf_.schema[rts].dataType))
    out_schema = T.StructType(out_fields)
    # state: per side — comparison ts (double), original-typed matched
    # ts, payload fields, present flag — k slots flattened into one
    # struct (ONE state row per key total)
    state_fields: list[T.StructField] = []
    slot_at: list[int] = []  # offset of side i's slot in the flat tuple
    for i, ((rdf_, rts, _), pay) in enumerate(zip(rights, payloads)):
        slot_at.append(len(state_fields))
        state_fields.append(T.StructField(f"__sts{i}", T.DoubleType()))
        state_fields.append(
            T.StructField(f"__srts{i}", rdf_.schema[rts].dataType))
        state_fields += [
            T.StructField(f"__sp{i}_{c}", rdf_.schema[c].dataType)
            for c in pay]
        state_fields.append(
            T.StructField(f"__present{i}", T.BooleanType()))
    state_schema = T.StructType(state_fields)
    slot_len = [2 + len(pay) + 1 for pay in payloads]
    n_by = len(by)
    out_names = [f.name for f in out_schema.fields]

    # Carry values must be stored as the DECLARED state types: the
    # union's NULL-padding promotes int payload columns to float64 in
    # pandas, and GroupState's serializer silently NULLs a float64
    # written into an IntegerType slot (found by the r16 multi tests —
    # matched_ts survived, the int payload vanished).
    def _to_py(dt):
        if isinstance(dt, (T.ByteType, T.ShortType,
                           T.IntegerType, T.LongType)):
            return lambda v: None if pd.isna(v) else int(v)
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return lambda v: None if pd.isna(v) else float(v)
        if isinstance(dt, T.BooleanType):
            return lambda v: None if pd.isna(v) else bool(v)
        return lambda v: None if (v is None or (
            not isinstance(v, (str, bytes, list, dict)) and pd.isna(v)
        )) else v

    # per side: converters for [matched_ts, *payload] slot fields
    convs = [
        [_to_py(rdf_.schema[rts].dataType)]
        + [_to_py(rdf_.schema[c].dataType) for c in pay]
        for (rdf_, rts, _), pay in zip(rights, payloads)
    ]

    def fold(key, pdfs, state: GroupState):
        carry = list(state.get) if state.exists else None
        # Materialize the WHOLE group micro-batch before sorting:
        # applyInPandasWithState hands the group over as Arrow chunks
        # split at spark.sql.execution.arrow.maxRecordsPerBatch in
        # arbitrary chunk order (the union even puts all lefts before
        # all rights), so per-chunk merge_asof would let lefts in an
        # early chunk silently miss rights in a later chunk with
        # smaller ts.  One concat + one sort + one merge per side.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if carry is not None:
                state.update(tuple(carry))
            return
        pdf = (chunks[0] if len(chunks) == 1
               else pd.concat(chunks, ignore_index=True))
        pdf = pdf.sort_values(["__ts", "__side"], kind="stable")
        lefts = pdf[pdf["__side"] == k].reset_index(drop=True)
        new_carry = carry if carry is not None else [None] * len(
            state_fields)
        for i, pay in enumerate(payloads):
            srows = pdf[pdf["__side"] == i]
            rcols = {"__ts": srows["__ts"].to_numpy(),
                     f"__rts{i}": srows[f"__rts{i}"].to_numpy()}
            for c in pay:
                rcols[c] = srows[c].to_numpy()
            rdf = pd.DataFrame(rcols)
            off = slot_at[i]
            if carry is not None and carry[off + slot_len[i] - 1]:
                head = {"__ts": [carry[off]],
                        f"__rts{i}": [carry[off + 1]]}
                for j, c in enumerate(pay):
                    head[c] = [carry[off + 2 + j]]
                hdf = pd.DataFrame(head)
                # concat of an EMPTY all-NA frame changes dtypes under
                # pandas' announced future behavior — branch instead
                rdf = (pd.concat([hdf, rdf], ignore_index=True)
                       if len(rdf) else hdf)
                # A right row arriving in a later micro-batch with ts
                # BELOW the carried state (cross-batch right disorder)
                # would leave rdf unsorted and merge_asof would raise
                # — re-sort instead (stable: the carry row sits first,
                # so at equal ts the batch's own row wins; disorder
                # degrades to fewer/older matches, never a crash).
                rdf = rdf.sort_values("__ts", kind="stable",
                                      ignore_index=True)
            if len(rdf):
                # advance the carry to the max-ts right row (last only
                # BECAUSE rdf is sorted — never trust raw order)
                last = rdf.iloc[-1]
                new_carry[off] = float(last["__ts"])
                new_carry[off + 1] = convs[i][0](last[f"__rts{i}"])
                for j, c in enumerate(pay):
                    new_carry[off + 2 + j] = convs[i][1 + j](last[c])
                new_carry[off + slot_len[i] - 1] = True
            if len(lefts) and len(rdf):
                m = pd.merge_asof(
                    lefts[["__ts"]], rdf,
                    on="__ts", direction="backward",
                    allow_exact_matches=True,
                )
                # overwrite the union's NULL columns positionally —
                # merge_asof preserves left row order
                for c in pay + [f"__rts{i}"]:
                    lefts[c] = m[c].to_numpy()
        if any(new_carry[slot_at[i] + slot_len[i] - 1]
               for i in range(k)):
            state.update(tuple(new_carry))
        if len(lefts):
            out = {
                **{c: [key[i]] * len(lefts) for i, c in enumerate(by)},
                out_names[n_by]: lefts["__lts_orig"],
                **{c: lefts[c] for c in l_cols},
            }
            pos = n_by + 1 + len(l_cols)
            for i, pay in enumerate(payloads):
                for c in pay:
                    out[c] = lefts[c]
                out[out_names[pos + len(pay)]] = lefts[f"__rts{i}"]
                pos += len(pay) + 1
            yield pd.DataFrame(out)

    return u.groupBy(*by).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
    ``right_ts_out IS NOT NULL`` for INNER gating).  The one-right
    form of :func:`asof_join_stream_multi` — same fold, same state
    contract.

    ``left`` / ``right`` are streaming DataFrames sharing the ``by``
    key columns; timestamps must be numeric or timestamp-typed (they
    are compared, never parsed).  Right payload columns (everything
    except ``by`` + ``right_ts``) appear on the output under their
    own names and must not collide with left columns."""
    return asof_join_stream_multi(
        left, [(right, right_ts, right_ts_out)], by, left_ts=left_ts)
