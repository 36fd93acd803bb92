"""Custom Python Data Source for the market-event feed — the
DataSource-V2-style answer to the reference's gRPC txmlconnector client
(S1, ``/root/reference/main.go:66-68``).

PySpark 4's Python Data Source API lets the gRPC bridge live *inside*
Spark's source contract instead of beside it: offsets, partitions, and
replay/recovery come from the engine.  The transport here is a
deterministic synthetic tick generator (the container has no gRPC
upstream); a real deployment swaps :func:`_gen_ticks` for the bridge
client while keeping every offset/partition mechanic.

- batch: ``spark.read.format("transaq_ticks").option("n", ...)``
- stream: ``spark.readStream.format("transaq_ticks")`` — micro-batches
  advance a monotonically increasing tick offset; exactly-once via
  offset ranges in the checkpoint.  ``latestOffset`` persists the
  reader's pace counter to ``progressPath`` (driver-side file) so a
  RESTARTED query resumes pacing from where it stopped — see the
  ``TickStreamReader`` docstring for the restart contract (the
  reference's feed, by contrast, is fire-and-forget and
  unreplayable).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "seq long, sec_id int, sec_code string, time string, "
    "open double, last double, quantity long"
)

_SECS = 8


def _gen_tick(i: int) -> tuple:
    """Deterministic synthetic quotation tick #i (one trading morning,
    one tick/second interleaved over the securities)."""
    sec_id = i % _SECS + 1
    t = 10 * 3600 + (i // _SECS)
    hh, mm, ss = t // 3600, (t // 60) % 60, t % 60
    last = 0.0 if i % 37 == 0 else round(100 + sec_id + ((i * 7) % 100) / 10.0, 2)
    opn = round(100.0 + sec_id, 2) if i % 53 == 0 else 0.0
    return (i, sec_id, f"TICK{sec_id:03d}", f"{hh:02d}:{mm:02d}:{ss:02d}", opn, last, (i % 9) + 1)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _read_range(part: _Range):
    for i in range(part.start, part.end):
        yield _gen_tick(i)


class TickBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("numPartitions", 4))

    def partitions(self):
        step = max(1, self.n // self.parts)
        return [_Range(s, min(s + step, self.n)) for s in range(0, self.n, step)]

    def read(self, partition):
        return _read_range(partition)


class TickStreamReader(DataSourceStreamReader):
    """Offset pacing for the synthetic feed.

    RESTART CONTRACT (r10): a fresh reader instance starts its pace
    counter at 0, but Spark restores the query's start offset from
    the checkpoint — if ``latestOffset`` then reports a SMALLER
    offset, the offset log rewinds and already-folded ticks are
    re-read into streaming state (measured: candle volume
    double-counts while idempotent OHLC hides it).  With
    ``progressPath`` set the reader persists its pace counter on
    every ``latestOffset`` and resumes from it on construction.
    Restarting WITHOUT ``progressPath`` (and without a fresh
    checkpoint) is refused by ``partitions`` the moment it would
    rewind, rather than silently corrupting state.

    PROGRESS-FILE IDENTITY (r11, ADVICE r10): ``initialOffset`` is
    only called when the CHECKPOINT is fresh, but the engine may call
    it AFTER the first ``latestOffset`` poll (observed), so it cannot
    mutate the pace — instead it marks the query fresh, and
    ``partitions`` REFUSES by name when batch 0 would span a stale
    persisted HWM (a fresh checkpoint paired with an old progress
    file otherwise serves one giant 0..old-HWM first batch).  Each
    reader also stamps the file with an owner token; finding a
    FOREIGN token after having written means two running queries
    share one progressPath — refused by name (their interleaved
    bumps corrupt both queries' pacing)."""

    def __init__(self, options):
        import uuid

        self.batch = int(options.get("ticksPerBatch", 100))
        self.max = int(options.get("maxTicks", 10**9))
        self._progress = options.get("progressPath")
        self._token = uuid.uuid4().hex
        self._wrote = False
        self._saw_initial = False
        self._latest = 0
        if self._progress and os.path.exists(self._progress):
            self._latest = self._read_progress()[0]
        self._seed = self._latest  # ctor-time persisted HWM

    def _read_progress(self) -> tuple[int, str | None]:
        with open(self._progress) as f:
            raw = f.read().strip()
        if raw.startswith("{"):
            import json

            d = json.loads(raw)
            return int(d.get("i", 0)), d.get("owner")
        return int(raw or 0), None  # pre-r11 plain-int format

    def _persist(self) -> None:
        import json

        tmp = f"{self._progress}.tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"i": self._latest, "owner": self._token}))
        os.replace(tmp, self._progress)

    def initialOffset(self):
        # Spark calls this ONLY when the checkpoint has no offset log
        # — a genuinely fresh query — but possibly AFTER the first
        # latestOffset poll, so it must be PURE (an in-place pace
        # reset here capped latestOffset below an already-reported
        # offset and the query drained one batch early; observed).
        # It records freshness for the partitions() stale-seed guard.
        self._saw_initial = True
        return {"i": 0}

    def latestOffset(self):
        # persist the PACE COUNTER eagerly (not in commit, which can
        # lag a batch behind at stop time and stall the resumed query
        # at "caught up"): replay correctness never depends on it —
        # partitions(start, end) serves whatever range the offset log
        # replays — the counter only stops latestOffset from REWINDING
        # below the checkpoint after a restart
        if self._progress:
            if self._wrote and os.path.exists(self._progress):
                _, owner = self._read_progress()
                if owner is not None and owner != self._token:
                    raise RuntimeError(
                        "tx_source progressPath is being written by "
                        "another query (owner token changed under us) "
                        "— give each streaming query its own "
                        "progressPath file; sharing one corrupts both "
                        "queries' pacing")
            self._latest = min(self._latest + self.batch, self.max)
            self._persist()
            self._wrote = True
        else:
            self._latest = min(self._latest + self.batch, self.max)
        return {"i": self._latest}

    def partitions(self, start, end):
        if self._saw_initial and start["i"] == 0 and self._seed > 0:
            # No end >= seed conjunct: a maxTicks cap below the stale
            # HWM would otherwise serve the giant 0..max batch anyway
            # (ADVICE r11 #2).  And the engine WALs this offset range
            # BEFORE partitions() raises, so deleting only the progress
            # file would silently replay it on restart (initialOffset
            # is no longer called once the offset log exists) — the
            # checkpoint must go too.
            raise RuntimeError(
                "tx_source progressPath holds a persisted high-water "
                f"mark of {self._seed} but the CHECKPOINT is fresh — "
                "batch 0 would replay the stale range in one giant "
                "micro-batch.  Delete BOTH the stale progress file "
                "(or point progressPath somewhere new) AND this "
                "query's checkpoint directory before restarting: the "
                "checkpoint's offset log has already recorded the "
                "stale range, so keeping it replays that batch "
                "silently on restart")
        if end["i"] < start["i"]:
            raise RuntimeError(
                "tx_source restarted behind the checkpoint offset "
                f"({end['i']} < {start['i']}): set .option('progressPath',"
                " <file>) so the reader resumes its pace from the "
                "persisted high-water mark instead of re-reading "
                "folded ticks")
        return [_Range(start["i"], end["i"])]

    def read(self, partition):
        return _read_range(partition)

    def commit(self, end):
        pass  # deterministic generator → nothing to ack upstream

    def stop(self):
        pass


class TickDataSource(DataSource):
    """``spark.dataSource.register(TickDataSource)`` then use format
    ``transaq_ticks``."""

    @classmethod
    def name(cls):
        return "transaq_ticks"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return TickBatchReader(self.options)

    def streamReader(self, schema):
        return TickStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TickDataSource)


# keep json import referenced for offset serialization debugging hooks
_ = json
