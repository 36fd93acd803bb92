"""Multi-right streaming as-of (r16 — VERDICT r15 item 4): replay
equality vs the batch ``asof_join_multi`` under the order contract,
per-side state carry across micro-batches and restarts, and the
payload-collision contract shared with the batch operator."""

from __future__ import annotations

import pytest

from transaq_clickhouse_exporter_spark.operators.asof import (
    asof_join_multi,
)
from transaq_clickhouse_exporter_spark.operators.asof_stream import (
    asof_join_stream_multi,
)

T_SCHEMA = "g int, t double, lv int"
Q_SCHEMA = "g int, qt double, price double"
W_SCHEMA = "g int, wt double, wv int"


def _write_chunks(spark, base, schema, chunks):
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(f"{base}/c{i}")


def _streams(spark, tmp_path, trades, quotes, wins):
    tdir, qdir, wdir = (str(tmp_path / d) for d in ("t", "q", "w"))
    _write_chunks(spark, tdir, T_SCHEMA, trades)
    _write_chunks(spark, qdir, Q_SCHEMA, quotes)
    _write_chunks(spark, wdir, W_SCHEMA, wins)
    ts = (spark.readStream.schema(T_SCHEMA)
          .option("maxFilesPerTrigger", 1).parquet(f"{tdir}/c*"))
    qs = (spark.readStream.schema(Q_SCHEMA)
          .option("maxFilesPerTrigger", 1).parquet(f"{qdir}/c*"))
    ws = (spark.readStream.schema(W_SCHEMA)
          .option("maxFilesPerTrigger", 1).parquet(f"{wdir}/c*"))
    return ts, qs, ws


def _run(spark, tmp_path, trades, quotes, wins):
    ts, qs, ws = _streams(spark, tmp_path, trades, quotes, wins)
    out = asof_join_stream_multi(
        ts, [(qs, "qt", "mqt"), (ws, "wt", "mwt")], by=["g"],
        left_ts="t")
    sink = str(tmp_path / "out")
    q = (out.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return [tuple(r) for r in spark.read.parquet(sink).collect()]


def test_replay_equals_batch_multi(spark, tmp_path):
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
    wins = [
        [(1, 8.0, 7)],
        [(2, 28.0, 8)],
        [(1, 34.0, 9)],
    ]
    got = sorted(_run(spark, tmp_path, trades, quotes, wins), key=repr)
    ldf = spark.createDataFrame([r for c in trades for r in c], T_SCHEMA)
    qdf = spark.createDataFrame([r for c in quotes for r in c], Q_SCHEMA)
    wdf = spark.createDataFrame([r for c in wins for r in c], W_SCHEMA)
    want = sorted(
        (tuple(r) for r in asof_join_multi(
            ldf, [(qdf, "qt", "mqt"), (wdf, "wt", "mwt")],
            by=["g"], left_ts="t").collect()),
        key=repr)
    assert got == want and len(got) == 6
    # spot check: trade (1, 12.0) -> quote 11.0 @ 251.0, win 8.0 @ 7
    row = next(r for r in got if r[0] == 1 and r[1] == 12.0)
    assert row[3] == 251.0 and row[4] == 11.0
    assert row[5] == 7 and row[6] == 8.0


def test_per_side_state_carry_independent(spark, tmp_path):
    # side A's latest quote arrives in batch 0, side B's only in batch
    # 2 — each side's slot advances independently of the other
    trades = [[(1, 5.0, 100)], [(1, 50.0, 101)], [(1, 60.0, 102)]]
    quotes = [[(1, 4.0, 99.0)], [], []]
    wins = [[], [], [(1, 55.0, 7)]]
    got = {r[1]: (r[2 + 1], r[4], r[5], r[6]) for r in
           _run(spark, tmp_path, trades, quotes, wins)}
    assert got[5.0] == (99.0, 4.0, None, None)
    assert got[50.0] == (99.0, 4.0, None, None)   # quote carried
    assert got[60.0] == (99.0, 4.0, 7, 55.0)      # win arrives late


def test_multi_restart_restores_both_slots(spark, tmp_path):
    tdir, qdir, wdir = (str(tmp_path / d) for d in ("t", "q", "w"))
    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def start():
        ts = (spark.readStream.schema(T_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{tdir}/c*"))
        qs = (spark.readStream.schema(Q_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{qdir}/c*"))
        ws = (spark.readStream.schema(W_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{wdir}/c*"))
        out = asof_join_stream_multi(
            ts, [(qs, "qt", "mqt"), (ws, "wt", "mwt")], by=["g"],
            left_ts="t")
        q = (out.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    _write_chunks(spark, tdir, T_SCHEMA, [[(1, 10.0, 100)]])
    _write_chunks(spark, qdir, Q_SCHEMA, [[(1, 9.0, 250.0)]])
    _write_chunks(spark, wdir, W_SCHEMA, [[(1, 8.0, 7)]])
    start()
    # run 2: ONLY a trade — both matches live in restored state
    spark.createDataFrame([(1, 20.0, 101)], T_SCHEMA).coalesce(1) \
        .write.parquet(f"{tdir}/c1")
    spark.createDataFrame([], Q_SCHEMA).coalesce(1) \
        .write.parquet(f"{qdir}/c1")
    spark.createDataFrame([], W_SCHEMA).coalesce(1) \
        .write.parquet(f"{wdir}/c1")
    start()
    got = {r.t: (r.price, r.mqt, r.wv, r.mwt)
           for r in spark.read.parquet(sink).collect()}
    assert got == {10.0: (250.0, 9.0, 7, 8.0),
                   20.0: (250.0, 9.0, 7, 8.0)}


def test_multi_payload_collision_raises(spark):
    ldf = spark.createDataFrame([(1, 1.0, 2)], "g int, t double, p int")
    qdf = spark.createDataFrame([(1, 1.0, 3.0)], Q_SCHEMA)
    wdf = spark.createDataFrame([(1, 1.0, 9.0)],
                                "g int, wt double, price double")
    with pytest.raises(ValueError, match="collide"):
        # wdf's 'price' collides with qdf's 'price' payload
        asof_join_stream_multi(
            ldf, [(qdf, "qt", "mqt"), (wdf, "wt", "mwt")], by=["g"],
            left_ts="t")
    with pytest.raises(ValueError, match=">= 1 right"):
        asof_join_stream_multi(ldf, [], by=["g"], left_ts="t")
