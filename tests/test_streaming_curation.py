"""Streaming incremental curation (datapipe/streaming_curation.py):
drive the driver's documents through a 3-micro-batch file stream and
assert the persisted corpus equals an independently-computed reference
of the incremental semantics — then prove restart continuation and
batch replay idempotence (the exactly-once claim).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.datapipe import dedup as dd
from transaq_clickhouse_exporter_spark.datapipe.streaming_curation import (
    curate_document_batch,
    curate_document_stream,
    read_curated,
)
from transaq_clickhouse_exporter_spark.datapipe.text import normalize_text
from transaq_clickhouse_exporter_spark.sources.replay import write_jsonl_fixture

THRESHOLD = 0.5


def _doc_batches(spark):
    """sf0.001 documents split into 3 ranges + injected exact dups:
    9001/9002 copy doc 400's text (within-batch exact dedup in b2),
    9000 copies doc 0's text (cross-batch exact dedup b0->b2)."""
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    by_id = {r.doc_id: r.text for r in rows}
    b0 = [{"doc_id": i, "text": t} for i, t in by_id.items() if i < 170]
    b1 = [{"doc_id": i, "text": t} for i, t in by_id.items() if 170 <= i < 340]
    b2 = [{"doc_id": i, "text": t} for i, t in by_id.items() if i >= 340]
    b2 += [
        {"doc_id": 9000, "text": by_id[0]},
        {"doc_id": 9001, "text": by_id[400]},
        {"doc_id": 9002, "text": by_id[400]},
    ]
    return [sorted(b, key=lambda d: d["doc_id"]) for b in (b0, b1, b2)]


def _reference_kept(spark, batches):
    """Replay the implemented incremental semantics in plain Python from
    two global deterministic artifacts: per-doc content hashes and the
    full-corpus verified near-dup pair set (MinHash signatures depend
    only on the document, so a pair is detected in a batch/probe
    context iff it is detected on the full corpus)."""
    all_rows = [d for b in batches for d in b]
    docs = spark.createDataFrame(all_rows, "doc_id long, text string")
    hashes = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", F.md5(normalize_text("text")).alias("h")
        ).collect()
    }
    pairs = {
        frozenset((r.id_a, r.id_b))
        for r in dd.minhash_near_dups(docs, threshold=THRESHOLD).collect()
    }
    kept: list[int] = []
    seen: set[str] = set()
    for batch in batches:
        ids = [d["doc_id"] for d in batch]
        # 1. within-batch exact (min id per hash) + anti-join vs history
        first = {}
        for i in ids:  # ids ascending
            first.setdefault(hashes[i], i)
        surv = [i for h, i in first.items() if h not in seen]
        surv.sort()
        # 2. within-batch near-dup: connected components, keep min
        comp = {i: i for i in surv}

        def root(x):
            while comp[x] != x:
                comp[x] = comp[comp[x]]
                x = comp[x]
            return x

        for a in surv:
            for b in surv:
                if a < b and frozenset((a, b)) in pairs:
                    ra, rb = root(a), root(b)
                    if ra != rb:
                        comp[max(ra, rb)] = min(ra, rb)
        mins = {}
        for i in surv:
            mins.setdefault(root(i), i)  # surv ascending -> min first
        surv = sorted(mins.values())
        # 3. cross-history near-dup: drop new docs near any kept doc
        surv = [
            i for i in surv if not any(frozenset((i, k)) in pairs for k in kept)
        ]
        kept.extend(surv)
        seen.update(hashes[i] for i in surv)
    return sorted(kept)


def test_streaming_curation_matches_reference_and_restarts(spark, tmp_path):
    batches = _doc_batches(spark)
    expected = _reference_kept(spark, batches)
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: two files, drain, "kill" (availableNow terminates)
    write_jsonl_fixture(os.path.join(src, "b0.jsonl"), batches[0], mtime=1_000)
    write_jsonl_fixture(os.path.join(src, "b1.jsonl"), batches[1], mtime=2_000)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(src)
    q = curate_document_stream(stream, state, ckpt, threshold=THRESHOLD)
    q.awaitTermination(300)

    mid = {r.doc_id for r in read_curated(spark, state).collect()}
    mid_expected = set(_reference_kept(spark, batches[:2]))
    assert mid == mid_expected

    # phase 2: a third file arrives; a NEW query on the SAME checkpoint
    # resumes at the next offset (no reprocessing of b0/b1)
    write_jsonl_fixture(os.path.join(src, "b2.jsonl"), batches[2], mtime=3_000)
    stream2 = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(src)
    q2 = curate_document_stream(stream2, state, ckpt, threshold=THRESHOLD)
    q2.awaitTermination(300)

    got = sorted(r.doc_id for r in read_curated(spark, state).collect())
    assert got == expected
    # the injected duplicates were all rejected
    assert {9000, 9001, 9002}.isdisjoint(got)

    # replay idempotence: re-running a committed batch overwrites its
    # own state directories with identical content (crash-replay shape)
    b2_df = spark.createDataFrame(batches[2], "doc_id long, text string")
    curate_document_batch(b2_df, 2, state, threshold=THRESHOLD)
    again = sorted(r.doc_id for r in read_curated(spark, state).collect())
    assert again == got


def test_partial_write_crash_replay_heals_state(spark, tmp_path):
    """Simulate a crash BETWEEN a batch's state writes: after batch 1
    commits, delete its bands directory (as if the process died after
    writing curated/hashes but before bands) and replay the batch.
    Because state reads only see lower batch ids, the replay recomputes
    from the exact pre-batch state and rewrites ALL three directories —
    the corpus ends identical to the uninterrupted run."""
    import shutil

    batches = _doc_batches(spark)
    state_a = str(tmp_path / "a")  # uninterrupted reference run
    state_b = str(tmp_path / "b")  # crash-and-replay run
    for i, b in enumerate(batches[:2]):
        df = spark.createDataFrame(b, "doc_id long, text string")
        curate_document_batch(df, i, state_a, threshold=THRESHOLD)
        curate_document_batch(df, i, state_b, threshold=THRESHOLD)

    shutil.rmtree(os.path.join(state_b, "bands", "b00000001"))  # the "crash"
    df1 = spark.createDataFrame(batches[1], "doc_id long, text string")
    curate_document_batch(df1, 1, state_b, threshold=THRESHOLD)  # replay

    rd = spark.read.option("recursiveFileLookup", "true")
    for sub in ("curated", "hashes", "bands"):
        a = sorted(map(tuple, rd.parquet(f"{state_a}/{sub}").collect()))
        b = sorted(map(tuple, rd.parquet(f"{state_b}/{sub}").collect()))
        assert a == b, sub
    # and batch 2 on the healed state matches the reference run
    df2 = spark.createDataFrame(batches[2], "doc_id long, text string")
    curate_document_batch(df2, 2, state_a, threshold=THRESHOLD)
    curate_document_batch(df2, 2, state_b, threshold=THRESHOLD)
    a = {r.doc_id for r in read_curated(spark, state_a).collect()}
    b = {r.doc_id for r in read_curated(spark, state_b).collect()}
    assert a == b
