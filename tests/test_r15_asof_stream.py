"""Streaming as-of enrichment (r15): replay equality vs the batch
asof_join under the documented order contract (per-key event-time
order across micro-batches; any order within one), plus the
no-retraction contract for cross-batch stragglers.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.operators.asof import asof_join
from transaq_clickhouse_exporter_spark.operators.asof_stream import (
    asof_join_stream,
)


def _run_stream(spark, tmp_path, trade_chunks, quote_chunks):
    """Write per-chunk parquet for both sides, replay with one file
    per trigger, return the collected enriched rows."""
    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    for i, rows in enumerate(trade_chunks):
        spark.createDataFrame(rows, "g int, t double, lv int") \
            .coalesce(1).write.parquet(f"{tdir}/c{i}")
    for i, rows in enumerate(quote_chunks):
        spark.createDataFrame(rows, "g int, qt double, price double") \
            .coalesce(1).write.parquet(f"{qdir}/c{i}")
    # each side is its own stream; maxFilesPerTrigger=1 advances both
    # chunk-by-chunk in write (modification-time) order, so chunk i of
    # trades and quotes share micro-batch i
    ts = (spark.readStream.schema("g int, t double, lv int")
          .option("maxFilesPerTrigger", 1).parquet(f"{tdir}/c*"))
    qs = (spark.readStream.schema("g int, qt double, price double")
          .option("maxFilesPerTrigger", 1).parquet(f"{qdir}/c*"))
    out = asof_join_stream(ts, qs, by=["g"], left_ts="t",
                           right_ts="qt", right_ts_out="mqt")
    sink = str(tmp_path / "out")
    q = (out.writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return [tuple(r) for r in spark.read.parquet(sink).collect()]


def test_replay_equals_batch_asof(spark, tmp_path):
    # in-order per key ACROSS chunks (the contract); shuffled WITHIN
    trades = [
        [(1, 10.0, 100), (2, 5.0, 200), (1, 12.0, 101)],
        [(1, 20.0, 102), (2, 30.0, 201)],
        [(1, 35.0, 103)],
    ]
    quotes = [
        [(1, 9.0, 250.0), (1, 11.0, 251.0), (2, 4.0, 130.0)],
        [(1, 19.0, 252.0), (2, 29.0, 131.0)],
        [(1, 33.0, 253.0)],
    ]
    got = sorted(_run_stream(spark, tmp_path, trades, quotes), key=repr)

    ldf = spark.createDataFrame(
        [r for c in trades for r in c], "g int, t double, lv int")
    rdf = spark.createDataFrame(
        [r for c in quotes for r in c], "g int, qt double, price double")
    want = sorted(
        (tuple(r) for r in asof_join(
            ldf, rdf, by=["g"], left_ts="t", right_ts="qt",
            right_ts_out="mqt").collect()),
        key=repr)
    assert got == want and len(got) == 6
    # spot semantics: trade (1, 12.0) matched quote 11.0 @ 251.0
    row = next(r for r in got if r[0] == 1 and r[1] == 12.0)
    assert row[3] == 251.0 and row[4] == 11.0


def test_no_retraction_for_straggler_right(spark, tmp_path):
    # a quote arriving in a LATER chunk than a trade of greater ts is
    # matched only to SUBSEQUENT trades — the emitted row never revises
    trades = [[(1, 10.0, 100)], [(1, 20.0, 101)]]
    quotes = [[], [(1, 8.0, 250.0)]]  # straggler: ts 8 < trade ts 10
    got = {r[1]: (r[3], r[4]) for r in
           _run_stream(spark, tmp_path, trades, quotes)}
    assert got[10.0] == (None, None)       # already emitted unmatched
    assert got[20.0] == (250.0, 8.0)       # later trade sees it


def test_unmatched_then_matched_and_state_carry(spark, tmp_path):
    trades = [[(1, 5.0, 100)], [(1, 50.0, 101)], [(1, 60.0, 102)]]
    quotes = [[(1, 7.0, 99.0)], [], [(1, 55.0, 98.0)]]
    got = {r[1]: (r[3], r[4]) for r in
           _run_stream(spark, tmp_path, trades, quotes)}
    assert got[5.0] == (None, None)      # quote 7.0 is in the future
    assert got[50.0] == (99.0, 7.0)      # carried across an empty batch
    assert got[60.0] == (98.0, 55.0)


def test_restart_restores_state_exactly(spark, tmp_path):
    # run chunks 0-1, STOP, add chunk 2, restart on the SAME
    # checkpoint: the carried latest-quote state must survive, so the
    # post-restart trade still matches the PRE-restart quote
    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def start():
        ts = (spark.readStream.schema("g int, t double, lv int")
              .option("maxFilesPerTrigger", 1).parquet(f"{tdir}/c*"))
        qs = (spark.readStream.schema("g int, qt double, price double")
              .option("maxFilesPerTrigger", 1).parquet(f"{qdir}/c*"))
        out = asof_join_stream(ts, qs, by=["g"], left_ts="t",
                               right_ts="qt", right_ts_out="mqt")
        q = (out.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    spark.createDataFrame([(1, 10.0, 100)], "g int, t double, lv int") \
        .coalesce(1).write.parquet(f"{tdir}/c0")
    spark.createDataFrame([(1, 9.0, 250.0)],
                          "g int, qt double, price double") \
        .coalesce(1).write.parquet(f"{qdir}/c0")
    start()
    # second run: ONLY a new trade arrives — its match (quote 9.0)
    # lives in state written by run 1
    spark.createDataFrame([(1, 20.0, 101)], "g int, t double, lv int") \
        .coalesce(1).write.parquet(f"{tdir}/c1")
    spark.createDataFrame([], "g int, qt double, price double") \
        .coalesce(1).write.parquet(f"{qdir}/c1")
    start()
    got = {r.t: (r.price, r.mqt) for r in spark.read.parquet(sink).collect()}
    assert got == {10.0: (250.0, 9.0), 20.0: (250.0, 9.0)}


def test_payload_collision_raises(spark):
    ldf = spark.createDataFrame([(1, 1.0, 2)], "g int, t double, p int")
    rdf = spark.createDataFrame([(1, 1.0, 3)], "g int, qt double, p int")
    with pytest.raises(ValueError, match="collide"):
        asof_join_stream(ldf, rdf, by=["g"], left_ts="t", right_ts="qt")
