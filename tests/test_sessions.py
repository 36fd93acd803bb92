"""Native session_window operator (operators/sessions.py): batch
semantics (adjacency coalescing, gap-padded end, per-session aggs)
and the streaming form — watermark-closed sessions emitted append-mode
across micro-batches must equal the batch result on the same events."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from transaq_clickhouse_exporter_spark.operators.sessions import (
    session_windows,
    session_windows_stream,
)
from transaq_clickhouse_exporter_spark.sources.replay import (
    read_replay_stream,
    write_jsonl_fixture,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts_s long, value double")


def test_batch_session_semantics(spark):
    rows = [
        # u1: 0,1799,3599 chain -> one session [0, 5399)
        (1, 0, 1.0), (1, 1799, 2.0), (1, 3599, 3.0),
        # u2: gap of exactly 1800 MERGES (adjacent windows coalesce)
        (2, 0, 1.0), (2, 1800, 1.0),
        # u3: gap of 1801 splits
        (3, 0, 1.0), (3, 1801, 1.0),
    ]
    got = {
        (r.user_id, r.session_start_s): (r.session_end_s, r.n_events)
        for r in session_windows(_ev(spark, rows), gap_seconds=1800).collect()
    }
    assert got == {
        (1, 0): (5399, 3),
        (2, 0): (3600, 2),
        (3, 0): (1800, 1),
        (3, 1801): (3601, 1),
    }


def test_batch_session_aggs_and_keys(spark):
    rows = [(1, 0, 2.5), (1, 100, 1.5), (2, 0, 4.0)]
    out = session_windows(
        _ev(spark, rows),
        gap_seconds=60,
        aggs=[F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_micro")],
    )
    got = {(r.user_id, r.session_start_s): (r.n_events, r.sum_micro) for r in out.collect()}
    assert got == {(1, 0): (1, 2500000), (1, 100): (1, 1500000), (2, 0): (1, 4000000)}


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Three micro-batches of out-of-session-order users; a final
    far-future flush event advances the watermark so every real
    session closes.  Append-mode stream output must equal the batch
    session_windows over the same (non-flush) events."""
    rows = [
        {"user_id": 1, "ts_s": 0, "value": 1.0},
        {"user_id": 1, "ts_s": 500, "value": 2.0},
        {"user_id": 2, "ts_s": 100, "value": 1.0},
        {"user_id": 1, "ts_s": 2500, "value": 1.0},   # splits u1 (gap 2000 > 1000)
        {"user_id": 2, "ts_s": 1100, "value": 1.0},   # continues u2 (gap == 1000 merges)
        {"user_id": 3, "ts_s": 3000, "value": 5.0},
    ]
    flush = {"user_id": 99, "ts_s": 10_000_000, "value": 0.0}
    d = str(tmp_path / "in")
    write_jsonl_fixture(d + "/b0.json", rows[:3], mtime=1000)
    write_jsonl_fixture(d + "/b1.json", rows[3:], mtime=1001)
    write_jsonl_fixture(d + "/b2.json", [flush], mtime=1002)

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_s", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = read_replay_stream(spark, d, schema, max_files_per_trigger=1)
    sess = session_windows_stream(
        stream,
        gap_seconds=1000,
        aggs=[F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_micro")],
        watermark_delay="0 seconds",
    )
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in spark.table("sess_stream").filter(F.col("user_id") != 99).collect()
    }
    want = {
        tuple(r)
        for r in session_windows(
            _ev(spark, [(r["user_id"], r["ts_s"], r["value"]) for r in rows]),
            gap_seconds=1000,
            aggs=[F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_micro")],
        ).collect()
    }
    assert got == want and len(got) == 4
