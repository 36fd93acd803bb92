"""File-replay streaming source — the test stand-in for the reference's
gRPC event channels (S1, ``/root/reference/main.go:66-68``,
``process.go:15-68``).

The reference consumes six typed channels from txmlconnector; in tests
we replay JSONL event fixtures through ``readStream.json`` with an
explicit schema (no inference — schemas come from :mod:`..schemas`).
In production the same pipelines take any streaming DataFrame (Kafka
bridge or a DataSource-V2 gRPC adapter); the engine is source-agnostic
by construction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def write_jsonl_fixture(path: str, rows: list[dict], mtime: float | None = None) -> None:
    """Write one replay file.  ``mtime`` pins the file's modification
    time — Spark's file source orders micro-batches by mtime, so
    order-sensitive replays (stateful folds) must space their files'
    mtimes explicitly or same-second writes race."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def read_replay_stream(
    spark: SparkSession, directory: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replay a directory of JSONL event files as a stream, in bounded
    micro-batches (``maxFilesPerTrigger`` emulates the reference's
    channel pacing)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.json(directory)


def run_stream_to_memory(df: DataFrame, name: str, transform=None):
    """Drive a bounded stream to completion into an in-memory table
    (synchronous — for tests); returns the started-and-stopped query."""
    out = transform(df) if transform else df
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    return q
