"""Positions snapshot merge — O-11 (``/root/reference/process.go:74-102``).

The reference keeps one in-memory ``positions`` struct and, per
incoming snapshot, overwrites each of seven sub-lists only when the
update's list is non-empty ("Todo avoid overwrite if only change
field", process.go:75).  Relationally that is: per client, for every
field, the value of the **latest snapshot in which that field was
present** — ``max_by(field, seq) FILTER (field IS NOT NULL)``, an
ordinary aggregation (shuffles once on the client key; map-side partial
combine keeps it cheap at scale).

The reference never persists this state (SURVEY O-11); we expose it as
a first-class operator so the snapshot is queryable.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import POSITIONS_SNAPSHOT_FIELDS


def merge_positions(
    df: DataFrame,
    fields: Sequence[str] = tuple(POSITIONS_SNAPSHOT_FIELDS),
    key: str = "client",
    seq: str = "seq",
) -> DataFrame:
    """Field-wise last-non-empty merge: one row per ``key`` holding, for
    each field, the value carried by the latest snapshot where it was
    non-NULL (empty sub-list ≙ NULL)."""
    aggs = [
        F.max_by(F.col(f), F.when(F.col(f).isNotNull(), F.col(seq))).alias(f)
        for f in fields
    ]
    return df.groupBy(key).agg(*aggs)


def merge_positions_stream(
    df: DataFrame, fields: Sequence[str] = tuple(POSITIONS_SNAPSHOT_FIELDS)
) -> DataFrame:
    """Streaming variant: GroupState carries the merged snapshot; each
    micro-batch emits the updated snapshot per client (update-mode
    changelog of the reference's in-memory struct).  ``last_seq`` is the
    snapshot's version — the highest input seq folded in so far."""
    out_schema = (
        "client string, last_seq long, " + ", ".join(f"{f} string" for f in fields)
    )
    state_schema = "last_seq long, " + ", ".join(f"{f} string" for f in fields)

    def merge(key, pdfs, state: GroupState):
        if state.exists:
            got = list(state.get)
            last_seq, cur = got[0], got[1:]
        else:
            last_seq, cur = -1, [None] * len(fields)
        # a group's micro-batch arrives as SEVERAL Arrow chunks whose
        # relative order follows shuffle-input split order, NOT seq —
        # sorting per chunk silently took a stale chunk's value when a
        # later-seq chunk arrived first (caught by the r14 10M-row
        # rehearsal: 56/100k clients diverged from the batch twin).
        # Concat the whole group batch, THEN one stable seq sort; the
        # column-wise NA scan stays vectorized (no per-row loop).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "seq", kind="stable"
            )
            last_seq = max(last_seq, int(pdf["seq"].iloc[-1]))
            for i, f in enumerate(fields):
                idx = pdf[f].last_valid_index()
                if idx is not None:
                    cur[i] = pdf[f].loc[idx]
        state.update((last_seq, *cur))
        yield pd.DataFrame([[key[0], last_seq, *cur]], columns=["client", "last_seq", *fields])

    return df.groupBy("client").applyInPandasWithState(
        merge,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def alltrades_feedback_ids(sec_positions: DataFrame) -> list[int]:
    """Subscription feedback (process.go:97-101): secids from the
    current sec-positions to extend the all-trades subscription.
    Driver-side list — inherently small (one row per held security)."""
    return [r[0] for r in sec_positions.select("secid").distinct().collect()]
