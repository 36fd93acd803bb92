"""Unit edges of the last-write-wins dedup operator."""

from __future__ import annotations

from transaq_clickhouse_exporter_spark.operators.dedup import (
    dedup_last_write_wins,
    dedup_streaming,
)


def test_versioned_keeps_latest_and_drops_seq(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "x", 5)], "k int, v string, _ingest_seq long"
    )
    out = dedup_last_write_wins(df, ["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "b", 2: "x"}
    assert "_ingest_seq" not in out.columns


def test_keep_order_col(spark):
    df = spark.createDataFrame([(1, "a", 10), (1, "b", 20)], "k int, v string, _ingest_seq long")
    out = dedup_last_write_wins(df, ["k"], keep_order_col=True)
    assert out.first()["_ingest_seq"] == 20


def test_without_seq_collapses_exact_dupes(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k int, v string")
    assert dedup_last_write_wins(df, ["k"]).count() == 2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from pyspark.sql import functions as F

    from transaq_clickhouse_exporter_spark.sources.replay import (
        read_replay_stream,
        write_jsonl_fixture,
    )

    rows = [
        {"k": 1, "ts_s": 1000, "v": "a"},
        {"k": 1, "ts_s": 1000, "v": "a"},  # duplicate within watermark
        {"k": 2, "ts_s": 1001, "v": "b"},
    ]
    write_jsonl_fixture(str(tmp_path / "s" / "a.json"), rows, mtime=1000)
    stream = read_replay_stream(spark, str(tmp_path / "s"), "k int, ts_s long, v string")
    stream = stream.withColumn("ts", F.timestamp_seconds("ts_s"))
    out = dedup_streaming(stream, ["k"], "ts", "10 seconds")
    q = (out.writeStream.outputMode("append").format("memory").queryName("dd")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) FROM dd").first()[0] == 2


def test_incremental_exact_dedup(spark):
    from transaq_clickhouse_exporter_spark.datapipe.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )

    corpus = spark.createDataFrame(
        [(1, "Seen doc."), (2, "other seen")], ["doc_id", "text"]
    )
    seen = exact_dedup(corpus).select("content_hash")
    batch = spark.createDataFrame(
        [
            (10, "seen doc"),      # dup of corpus doc 1 (normalized)
            (11, "brand new"),
            (12, "BRAND new!!"),   # in-batch dup of 11 → 11 wins (min id)
            (13, "also new"),
        ],
        ["doc_id", "text"],
    )
    out = incremental_exact_dedup(batch, seen)
    assert {r.doc_id for r in out.collect()} == {11, 13}
    # chaining: appending survivors' hashes blocks the next batch
    seen2 = seen.unionAll(out.select("content_hash"))
    batch2 = spark.createDataFrame([(20, "also NEW"), (21, "fresh")], ["doc_id", "text"])
    assert {r.doc_id for r in incremental_exact_dedup(batch2, seen2).collect()} == {21}
