"""Checkpoint kill/restart smoke (VERDICT r5 item 3): drive the two
stateful streaming paths across a stop/restart boundary and assert
EXACT results — the property the reference's reconnect watchdog
(S6/S7, ``main.go:46-59`` / ``process.go:43-49``) only approximates
with fire-and-forget inserts.

Both tests run phase 1 (availableNow → terminates = the "kill"), drop
every session object, then rebuild the identical query on the SAME
checkpoint so Spark restores source offsets + state store:

- candle builder: a minute that OPENS in phase 1 and CLOSES in phase 2
  must emit one correct candle — the GroupState accumulator crossed
  the restart (``ingest/candles.py:228``, semantics process.go:126-169);
- stream-stream enrichment: a phase-2 trade must join a phase-1 quote
  — the join state store crossed the restart
  (``ingest/streaming.py:166``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.ingest.candles import (
    quotation_candles_batch,
    quotation_candles_stream,
)
from transaq_clickhouse_exporter_spark.ingest.streaming import (
    stream_enrich_trades_with_quotes,
)
from transaq_clickhouse_exporter_spark.sources.replay import (
    read_replay_stream,
    write_jsonl_fixture,
)

TICK_SCHEMA = (
    "sec_id long, sec_code string, time string, open double, last double, "
    "quantity long, seq long"
)

PHASE1_TICKS = [
    {"sec_id": 1, "sec_code": "SBER", "time": "11:00:10", "open": 0.0, "last": 100.0,
     "quantity": 1, "seq": 1},
    {"sec_id": 1, "sec_code": "SBER", "time": "11:00:40", "open": 0.0, "last": 101.0,
     "quantity": 2, "seq": 2},
    # boundary tick (':00', last>0): emits the first candle and leaves
    # the ZERO-STRUCT accumulator (present, open=0) in state
    {"sec_id": 1, "sec_code": "SBER", "time": "11:01:00", "open": 0.0, "last": 102.0,
     "quantity": 3, "seq": 3},
]
PHASE2_TICKS = [
    # open-field backfill fires ONLY on an existing open==0 accumulator
    # (process.go:147-149) — if the restart lost state this tick would
    # take the init path and the next candle's open would be 103.0
    {"sec_id": 1, "sec_code": "SBER", "time": "11:01:20", "open": 103.5, "last": 103.0,
     "quantity": 4, "seq": 4},
    {"sec_id": 1, "sec_code": "SBER", "time": "11:02:00", "open": 0.0, "last": 104.0,
     "quantity": 5, "seq": 5},
]


def test_candle_builder_state_survives_restart(spark, tmp_path):
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))

    def run_phase():
        stream = read_replay_stream(spark, in_dir, TICK_SCHEMA)
        out = quotation_candles_stream(stream, emit_date="2024-12-20")
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write_jsonl_fixture(in_dir + "/k0.json", PHASE1_TICKS, mtime=1000)
    run_phase()
    phase1 = spark.read.parquet(out_dir)
    # exactly the boundary-tick candle emitted in phase 1
    assert [str(r.date) for r in phase1.collect()] == ["2024-12-20 11:01:00"]

    write_jsonl_fixture(in_dir + "/k1.json", PHASE2_TICKS, mtime=2000)
    run_phase()  # fresh query object, same checkpoint = restart

    got = {
        str(r.date): (r.open, r.close, r.high, r.low, r.volume)
        for r in spark.read.parquet(out_dir).collect()
    }
    # oracle: the exact batch fold over the full tick series
    ticks = spark.createDataFrame(
        [tuple(t.values()) for t in PHASE1_TICKS + PHASE2_TICKS], TICK_SCHEMA
    )
    want = {
        str(r.date): (r.open, r.close, r.high, r.low, r.volume)
        for r in quotation_candles_batch(ticks, emit_date="2024-12-20").collect()
    }
    assert got == want
    # phase-1 accumulator closed by the phase-1 boundary tick
    assert got["2024-12-20 11:01:00"] == (100.0, 102.0, 101.0, 100.0, 3)
    # the cross-restart candle: open=103.5 is the open-field backfill
    # into the RESTORED zero-struct accumulator — a lost state store
    # would take the init path and emit open=103.0
    assert got["2024-12-20 11:02:00"] == (103.5, 104.0, 103.0, 103.0, 4)


def test_stream_stream_join_state_survives_restart(spark, tmp_path):
    t_dir, q_dir, out_dir, ck = (str(tmp_path / d) for d in ("t", "q", "out", "ck"))
    base = 1734688800

    def run_phase():
        ts = read_replay_stream(
            spark, t_dir, "sec_code string, ts_s long, price double, tid long"
        ).withColumn("t_ts", F.timestamp_seconds("ts_s")).drop("ts_s")
        qs = read_replay_stream(
            spark, q_dir, "sec_code string, ts_s long, bid double, qid long"
        ).withColumn("q_ts", F.timestamp_seconds("ts_s")).drop("ts_s")
        out = stream_enrich_trades_with_quotes(ts, qs, max_lag_seconds=60)
        q = (
            out.select("tid", "qid")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write_jsonl_fixture(
        q_dir + "/q0.json",
        [{"sec_code": "SBER", "ts_s": base + 100, "bid": 100.0, "qid": 1}],
        mtime=1000,
    )
    write_jsonl_fixture(
        t_dir + "/t0.json",
        [{"sec_code": "SBER", "ts_s": base + 110, "price": 101.0, "tid": 1}],
        mtime=1000,
    )
    run_phase()
    got1 = {(r.tid, r.qid) for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {(1, 1)}

    write_jsonl_fixture(
        q_dir + "/q1.json",
        [{"sec_code": "SBER", "ts_s": base + 140, "bid": 100.5, "qid": 2}],
        mtime=2000,
    )
    write_jsonl_fixture(
        t_dir + "/t1.json",
        [{"sec_code": "SBER", "ts_s": base + 150, "price": 102.0, "tid": 2}],
        mtime=2000,
    )
    run_phase()  # restart on the same checkpoint

    got = {(r.tid, r.qid) for r in spark.read.parquet(out_dir).collect()}
    # (2, 1) is the cross-restart match: quote 1 arrived before the
    # kill, trade 2 after — it only exists if the join state survived
    assert got == {(1, 1), (2, 1), (2, 2)}
