"""Golden tests for the stateful OHLCV candle builder (O-10) covering
every quirk of /root/reference/process.go:126-169."""

from __future__ import annotations

from transaq_clickhouse_exporter_spark.ingest import candles

# (time, open, last, quantity) — single security, arrival order
TICKS = [
    ("10:00:30", 0.0, 100.0, 5),   # first tick: init open/high/low from Last
    ("10:00:45", 250.0, 101.0, 3), # open != 0 → no backfill; high 101
    ("10:01:00", 0.0, 102.0, 7),   # boundary → EMIT; tick's qty/last dropped
    ("10:01:10", 0.0, 99.0, 2),    # post-reset zero struct: low 0→99, high 99
    ("10:01:20", 98.5, 0.0, 4),    # open backfill 98.5; Last=0 drives low→0
    ("10:01:40", 0.0, 97.0, 1),    # low==0 → low:=97 (bounces back)
    ("10:02:00", 0.0, 0.0, 9),     # boundary but Last=0 → NO emit; low→0 again
    ("10:03:00", 0.0, 105.0, 2),   # boundary → EMIT
]

EXPECTED = [
    {"sec_code": "SBER", "period": 1, "date": "2024-12-20 10:01:00",
     "open": 100.0, "close": 102.0, "high": 101.0, "low": 100.0, "volume": 8},
    {"sec_code": "SBER", "period": 1, "date": "2024-12-20 10:03:00",
     "open": 98.5, "close": 105.0, "high": 99.0, "low": 0.0, "volume": 16},
]


def _rows(sec_code="SBER"):
    return [
        {"sec_code": sec_code, "time": t, "open": o, "last": l, "quantity": q}
        for t, o, l, q in TICKS
    ]


def test_fold_ticks_golden():
    out, acc = candles.fold_ticks(_rows(), "2024-12-20")
    assert out == EXPECTED
    assert acc is not None and acc.volume == 0  # reset, still present


def test_fold_no_boundary_tick_no_emit():
    rows = [r for r in _rows() if not r["time"].endswith(":00")]
    out, acc = candles.fold_ticks(rows, "2024-12-20")
    assert out == []
    assert acc is not None


def test_fold_boundary_without_state_initializes():
    # a ':00' tick with no accumulator goes down the init path (exists=False)
    out, acc = candles.fold_ticks(
        [{"sec_code": "X", "time": "10:05:00", "open": 0.0, "last": 50.0, "quantity": 3}],
        "2024-12-20",
    )
    assert out == []
    assert (acc.open, acc.high, acc.low, acc.volume) == (50.0, 50.0, 50.0, 3)


def test_batch_applyinpandas_matches_fold(spark):
    rows = [
        (1, r["sec_code"], r["time"], r["open"], r["last"], r["quantity"], i)
        for i, r in enumerate(_rows())
    ] + [
        # second security interleaved: no boundary tick → no candles
        (2, "GAZP", "11:00:10", 0.0, 7.0, 1, 100),
        (2, "GAZP", "11:00:20", 0.0, 8.0, 2, 101),
    ]
    df = spark.createDataFrame(
        rows, "sec_id int, sec_code string, time string, open double, last double, quantity long, seq long"
    )
    out = candles.quotation_candles_batch(df, "2024-12-20")
    got = sorted([r.asDict() for r in out.collect()], key=lambda r: r["date"])
    assert got == EXPECTED


def test_streaming_state_matches_fold(spark, tmp_path):
    from transaq_clickhouse_exporter_spark.sources.replay import (
        read_replay_stream,
        write_jsonl_fixture,
    )

    # split the tick sequence across two files → two micro-batches; the
    # accumulator must survive the batch boundary in GroupState
    all_rows = [
        {"sec_id": 1, "sec_code": r["sec_code"], "time": r["time"], "open": r["open"],
         "last": r["last"], "quantity": r["quantity"], "seq": i}
        for i, r in enumerate(_rows())
    ]
    write_jsonl_fixture(str(tmp_path / "replay" / "a0.json"), all_rows[:4], mtime=1_000)
    write_jsonl_fixture(str(tmp_path / "replay" / "a1.json"), all_rows[4:], mtime=2_000)
    schema = ("sec_id int, sec_code string, time string, open double, last double, "
              "quantity long, seq long")
    stream = read_replay_stream(spark, str(tmp_path / "replay"), schema, max_files_per_trigger=1)
    out = candles.quotation_candles_stream(stream, "2024-12-20")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("candles_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = sorted(
        [r.asDict() for r in spark.sql("SELECT * FROM candles_out").collect()],
        key=lambda r: r["date"],
    )
    assert got == EXPECTED


def test_candles_windowed_agg_equals_window_distinct_form(spark):
    """candles_windowed's grouped min_by/max_by aggregation (r16) must
    equal the window+DISTINCT reference form it replaced — including
    out-of-order seq arrival, several buckets and duplicate prices."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        # (sec_code, epoch_s, last, qty, seq) — seq deliberately not in
        # time order inside buckets; duplicate last values; two codes
        ("A", 60, 10.0, 1, 5), ("A", 70, 11.0, 2, 3), ("A", 110, 10.0, 1, 9),
        ("A", 121, 9.5, 4, 12), ("A", 130, 9.5, 1, 11),
        ("B", 65, 20.0, 2, 1), ("B", 66, 19.0, 3, 2), ("B", 180, 21.0, 1, 20),
    ]
    df = spark.createDataFrame(
        rows, "sec_code string, ts_s long, last double, quantity long, seq long"
    ).withColumn("ts", F.timestamp_seconds("ts_s").cast("timestamp_ntz"))

    got = candles.candles_windowed(df, minutes=1)

    step = 60
    bucket = ((F.unix_timestamp("ts") / step).cast("long") * step).alias("bucket_s")
    w = Window.partitionBy("sec_code", "bucket_s")
    by_seq = w.orderBy("seq")
    frame = by_seq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ref = (
        df.select("sec_code", bucket, "last", "quantity", "seq")
        .withColumn("open", F.first("last").over(frame))
        .withColumn("close", F.last("last").over(frame))
        .withColumn("high", F.max("last").over(w))
        .withColumn("low", F.min("last").over(w))
        .withColumn("volume", F.sum("quantity").over(w))
        .select("sec_code", "bucket_s", "open", "close", "high", "low", "volume")
        .distinct()
    )
    key = lambda r: (r["sec_code"], r["bucket_s"])
    assert sorted([r.asDict() for r in got.collect()], key=key) == sorted(
        [r.asDict() for r in ref.collect()], key=key
    )
    # plan shape: no Window/Sort left — a plain partial/final aggregate
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
