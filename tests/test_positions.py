"""Positions snapshot merge (O-11, process.go:74-102): empty sub-lists
must not overwrite prior non-empty state."""

from __future__ import annotations

from transaq_clickhouse_exporter_spark.ingest.positions import (
    merge_positions,
    merge_positions_stream,
)
from transaq_clickhouse_exporter_spark.schemas import POSITIONS_SNAPSHOT_FIELDS, RAW_POSITIONS


def _snapshots(spark):
    def row(seq, client, **kw):
        return tuple([seq, client] + [kw.get(f) for f in POSITIONS_SNAPSHOT_FIELDS])

    rows = [
        row(1, "A", united_limits="a1", forts_money="m1"),
        row(2, "A", sec_positions="b2"),
        row(3, "A", united_limits="a3", forts_position="p3"),
        row(1, "B", spot_limit="s1"),
    ]
    return spark.createDataFrame(rows, schema=RAW_POSITIONS)


EXPECTED_A = {
    "united_limits": "a3",
    "sec_positions": "b2",
    "forts_money": "m1",
    "money_position": None,
    "forts_position": "p3",
    "forts_collaterals": None,
    "spot_limit": None,
}


def test_merge_positions_batch(spark):
    out = {r["client"]: r.asDict() for r in merge_positions(_snapshots(spark)).collect()}
    got_a = {k: v for k, v in out["A"].items() if k != "client"}
    assert got_a == EXPECTED_A
    assert out["B"]["spot_limit"] == "s1" and out["B"]["united_limits"] is None


def test_merge_positions_stream(spark, tmp_path):
    from transaq_clickhouse_exporter_spark.sources.replay import (
        read_replay_stream,
        write_jsonl_fixture,
    )

    fields = list(POSITIONS_SNAPSHOT_FIELDS)
    rows = [r.asDict() for r in _snapshots(spark).collect()]
    # batch 1: seqs 1-2, batch 2: seq 3 → state must carry across
    write_jsonl_fixture(
        str(tmp_path / "pos" / "b0.json"), [r for r in rows if r["seq"] <= 2], mtime=1_000
    )
    write_jsonl_fixture(
        str(tmp_path / "pos" / "b1.json"), [r for r in rows if r["seq"] == 3], mtime=2_000
    )
    stream = read_replay_stream(spark, str(tmp_path / "pos"), RAW_POSITIONS, max_files_per_trigger=1)
    out = merge_positions_stream(stream, fields)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("pos_out").option("checkpointLocation", str(tmp_path / "pos_ckpt")).start())
    q.processAllAvailable()
    q.stop()
    hist = spark.sql("SELECT * FROM pos_out").collect()
    # final state for A = emitted snapshot with the highest version
    final_a = max(
        (r.asDict() for r in hist if r["client"] == "A"), key=lambda r: r["last_seq"]
    )
    assert final_a["last_seq"] == 3
    assert {k: v for k, v in final_a.items() if k not in ("client", "last_seq")} == EXPECTED_A


def test_merge_positions_stream_cross_chunk_order(spark, tmp_path):
    """r14 10M-rehearsal find: a group's micro-batch arrives as several
    Arrow chunks in shuffle-split order, NOT seq order — the fold must
    sort the WHOLE group batch, not each chunk.  Adversarial file
    order (high seqs first) + maxRecordsPerBatch=2 forces a later-seq
    chunk to arrive before an earlier-seq one; the merged snapshot
    must still equal the batch twin (56/100k clients diverged at 10M
    before the fix)."""
    from transaq_clickhouse_exporter_spark.sources.replay import (
        read_replay_stream,
        write_jsonl_fixture,
    )

    fields = list(POSITIONS_SNAPSHOT_FIELDS)
    f0 = fields[0]

    def upd(seq, val):
        d = {"seq": seq, "client": "A", **{f: None for f in fields}}
        d[f0] = val
        return d

    # file row order: seq 4 (value), 3 (null), 1 (stale value), 2 (null)
    rows = [upd(4, "v4"), upd(3, None), upd(1, "v1"), upd(2, None)]
    write_jsonl_fixture(str(tmp_path / "pos" / "b0.json"), rows, mtime=1_000)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = read_replay_stream(
            spark, str(tmp_path / "pos"), RAW_POSITIONS, max_files_per_trigger=1
        )
        out = merge_positions_stream(stream, fields)
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName("pos_chunk_order")
             .option("checkpointLocation", str(tmp_path / "ck")).start())
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    final = max(
        (r.asDict() for r in spark.sql("SELECT * FROM pos_chunk_order").collect()),
        key=lambda r: r["last_seq"],
    )
    assert final["last_seq"] == 4
    # the seq-4 value must win over the stale seq-1 chunk
    assert final[f0] == "v4"
