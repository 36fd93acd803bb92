"""sequenceMatch / sequenceCount parity (functions/seqmatch.py):
pattern translation, crafted-chain semantics, ordering determinism,
and the condition-storage rule (non-matching events ignored)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.functions.seqmatch import (
    sequence_match,
    sequence_match_summary,
    sequence_strings,
    translate_pattern,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s long, event_id long"
    )


def test_translate_pattern():
    assert translate_pattern("(?1).*(?2)", 2) == "1.*2"
    assert translate_pattern("(?1).*(?2)", 2, lazy=True) == "1.*?2"
    assert translate_pattern("(?1).+(?2).*(?1)", 2) == "1.+2.*1"
    with pytest.raises(ValueError):
        # time guards are outside the REGEX translator's scope — they
        # take the chain fold via parse_chain (r16,
        # test_r16_seqmatch_time.py)
        translate_pattern("(?1)(?t<=3600)(?2)", 2)
    with pytest.raises(ValueError):
        translate_pattern("(?3)", 2)  # ref out of range
    with pytest.raises(ValueError):
        translate_pattern("", 2)
    with pytest.raises(ValueError):
        translate_pattern("(?1)|(?2)", 2)  # alternation outside the subset


def test_sequence_strings_order_and_storage_rule(spark):
    rows = [
        # u1: noise events ('x') must be ignored; ties on ts pinned by
        # event_id (event 11 before 12 at ts 100)
        (1, "b", 100, 12),
        (1, "a", 100, 11),
        (1, "x", 150, 13),
        (1, "a", 200, 14),
        # u2: only noise -> absent from the output entirely
        (2, "x", 100, 21),
    ]
    conds = [F.col("event_type") == "a", F.col("event_type") == "b"]
    got = {
        r.user_id: r.seq
        for r in sequence_strings(_ev(spark, rows), conds).collect()
    }
    assert got == {1: "121"}


def test_sequence_match_and_count(spark):
    rows = [
        # u1: a b a b -> '1212'; match 1.*2, two lazy chains
        (1, "a", 1, 1), (1, "b", 2, 2), (1, "a", 3, 3), (1, "b", 4, 4),
        # u2: b a -> '21'; no match of 1.*2
        (2, "b", 1, 5), (2, "a", 2, 6),
        # u3: a a b -> '112'; one non-overlapping chain
        (3, "a", 1, 7), (3, "a", 2, 8), (3, "b", 3, 9),
    ]
    conds = [F.col("event_type") == "a", F.col("event_type") == "b"]
    got = {
        r.user_id: (r.matched, r.n_chains)
        for r in sequence_match(_ev(spark, rows), "(?1).*(?2)", conds).collect()
    }
    assert got == {1: (True, 2), 2: (False, 0), 3: (True, 1)}


def test_repeating_alphabet_beyond_funnel(spark):
    # (?1).*(?2).*(?1) — return-after-purchase; a join-chain funnel
    # cannot express the repeated condition.
    rows = [
        (1, "view", 1, 1), (1, "purchase", 2, 2), (1, "view", 3, 3),
        (2, "view", 1, 4), (2, "purchase", 2, 5),
    ]
    conds = [F.col("event_type") == "view", F.col("event_type") == "purchase"]
    got = {
        r.user_id: r.matched
        for r in sequence_match(
            _ev(spark, rows), "(?1).*(?2).*(?1)", conds
        ).collect()
    }
    assert got == {1: True, 2: False}


def test_summary_rollup(spark):
    rows = [
        (1, "a", 1, 1), (1, "b", 2, 2),
        (2, "b", 1, 3),
        (3, "a", 1, 4), (3, "b", 2, 5), (3, "a", 3, 6), (3, "b", 4, 7),
    ]
    conds = [F.col("event_type") == "a", F.col("event_type") == "b"]
    row = sequence_match_summary(_ev(spark, rows), "(?1).*(?2)", conds).collect()[0]
    assert (row.n_users, row.n_matched, row.n_chains) == (3, 2, 3)
