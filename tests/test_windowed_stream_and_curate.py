"""Watermarked streaming OHLCV and the composed curation pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.datapipe.pipeline import curate_corpus
from transaq_clickhouse_exporter_spark.ingest.candles import candles_windowed_stream
from transaq_clickhouse_exporter_spark.sources.replay import (
    read_replay_stream,
    write_jsonl_fixture,
)

from tests.oracle import utc_str


def test_candles_windowed_stream_watermark(spark, tmp_path):
    base = 1734688800  # 2024-12-20 10:00:00 UTC
    rows1 = [
        {"sec_code": "SBER", "ts_s": base + 10, "last": 100.0, "quantity": 1, "seq": 1},
        {"sec_code": "SBER", "ts_s": base + 40, "last": 103.0, "quantity": 2, "seq": 2},
        {"sec_code": "SBER", "ts_s": base + 70, "last": 99.0, "quantity": 4, "seq": 3},
    ]
    # second batch far in the future → watermark passes earlier windows
    rows2 = [{"sec_code": "SBER", "ts_s": base + 3600, "last": 50.0, "quantity": 1, "seq": 9}]
    write_jsonl_fixture(str(tmp_path / "t" / "a.json"), rows1, mtime=1000)
    write_jsonl_fixture(str(tmp_path / "t" / "b.json"), rows2, mtime=2000)

    stream = read_replay_stream(
        spark, str(tmp_path / "t"),
        "sec_code string, ts_s long, last double, quantity long, seq long",
        max_files_per_trigger=1,
    ).withColumn("ts", F.timestamp_seconds("ts_s"))
    out = candles_windowed_stream(stream, minutes=1, watermark="30 seconds")
    q = (out.writeStream.outputMode("append").format("memory").queryName("wc")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = {utc_str(r["bucket_start"]): r.asDict() for r in spark.sql("SELECT * FROM wc").collect()}
    first = got["2024-12-20 10:00:00"]
    assert (first["open"], first["close"], first["high"], first["low"], first["volume"]) == (
        100.0, 103.0, 103.0, 100.0, 3,
    )
    second = got["2024-12-20 10:01:00"]
    assert (second["open"], second["close"], second["volume"]) == (99.0, 99.0, 4)


def test_curate_corpus(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs far away into the deep "
        "green forest to find some food and water before the long cold night settles in"
    )
    rows = [
        (1, good),
        (2, good.upper() + "!"),                     # exact dup of 1 after normalize
        (3, good.replace("green", "dark")),          # near dup of 1
        (4, "short junk"),                           # too few tokens
        (5, "a completely different but sufficiently long document about spark catalyst "
            "optimizer rules and the shuffle exchange planning for distributed joins over "
            "columnar parquet data at petabyte scale in production clusters"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(docs, min_quality=0.5, min_tokens=5, near_dup_threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 5]
    assert {"quality", "n_tokens_ws", "fp"} <= set(out.columns)


def test_streaming_session_window(spark, tmp_path):
    """Native session_window sessionization in streaming (gap-based) —
    the structured-streaming twin of the batch lag/cumsum sessionizer
    (catalog ev03)."""
    base = 1734688800
    rows1 = [
        {"user_id": 1, "ts_s": base + 0, "v": 1.0},
        {"user_id": 1, "ts_s": base + 30, "v": 1.0},   # same session (gap 30 < 60)
        {"user_id": 1, "ts_s": base + 200, "v": 1.0},  # new session (gap 170)
    ]
    rows2 = [{"user_id": 1, "ts_s": base + 5000, "v": 1.0}]  # advances watermark
    write_jsonl_fixture(str(tmp_path / "sw" / "a.json"), rows1, mtime=1000)
    write_jsonl_fixture(str(tmp_path / "sw" / "b.json"), rows2, mtime=2000)
    stream = read_replay_stream(
        spark, str(tmp_path / "sw"), "user_id long, ts_s long, v double",
        max_files_per_trigger=1,
    ).withColumn("ts", F.timestamp_seconds("ts_s"))
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.session_window("ts", "60 seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("session_window.start").alias("start"), "n")
    )
    q = (agg.writeStream.outputMode("append").format("memory").queryName("sw")
         .option("checkpointLocation", str(tmp_path / "swck")).start())
    q.processAllAvailable()
    q.stop()
    got = {(r["user_id"], utc_str(r["start"])): r["n"] for r in spark.sql("SELECT * FROM sw").collect()}
    assert got[(1, "2024-12-20 10:00:00")] == 2
    assert got[(1, "2024-12-20 10:03:20")] == 1


def test_curate_corpus_transitive_chain(spark):
    hub = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lamda mu nu xi omicron pi rho sigma tau upsilon")
    va = hub.replace("gamma", "XXXX")   # J(va, hub) = 15/21 ≈ 0.714
    vb = hub.replace("sigma", "SSSS")   # J(vb, hub) ≈ 0.714; J(va, vb) = 0.5
    # star component {1, 2, 9} with hub 9: pairs are (1,9) and (2,9)
    # only — 1 and 2 are near-dups of each other ONLY through the hub.
    # Pairwise drops just the larger id of each pair (the hub), keeping
    # BOTH satellites; transitive keeps the component minimum alone.
    rows = [(1, va), (9, hub), (2, vb)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.0, min_tokens=1, near_dup_threshold=0.6)
    trans = {r.doc_id for r in curate_corpus(docs, transitive=True, **kw).collect()}
    pairw = {r.doc_id for r in curate_corpus(docs, transitive=False, **kw).collect()}
    assert trans == {1}
    assert pairw == {1, 2}


def test_training_data_job_end_to_end(spark, sf_smoke):
    from transaq_clickhouse_exporter_spark.datapipe.pipeline import training_data_job
    from transaq_clickhouse_exporter_spark.testdata import load_table

    docs = load_table(spark, sf_smoke, "documents")
    # synthetic corpus: no English stopwords by construction — disable
    # the natural-language prior, keep the structural rules
    gk = dict(min_stopword_hits=0)
    out = training_data_job(docs, token_budget=512, gate_kwargs=gk)
    curated = out["curated"].collect()
    n_in = docs.count()
    assert 0 < len(curated) <= n_in
    # every curated row carries split + packing coordinates
    r = curated[0]
    assert r.split in ("train", "val", "test")
    assert r.offset_in_seq < 512 and r.seq_in_bucket >= 0
    # gate accounting: kept + rejected + deduped == input
    n_rejects = out["rejects"].count()
    assert n_rejects + len(curated) <= n_in  # dedup removes the rest
    # summary totals agree with the curated table
    summary = {s.split: s for s in out["summary"].collect()}
    assert sum(s.n_docs for s in summary.values()) == len(curated)
    # split isolation: packing runs per split (partition_cols=("split",)),
    # so recomputing each split's tape independently must reproduce the
    # (seq_in_bucket, offset_in_seq) coordinates exactly — a sequence
    # spanning train/val/test would break this at its first cut
    import hashlib

    def _h(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    cum: dict[tuple, int] = {}
    for r in sorted(curated, key=lambda r: (r.split, r.bucket, _h(r.doc_id), r.doc_id)):
        c = cum.get((r.split, r.bucket), 0)
        assert (r.seq_in_bucket, r.offset_in_seq) == (c // 512, c % 512)
        cum[(r.split, r.bucket)] = c + r.n_tokens
    # per-split n_sequences now sum to the true global sequence count
    assert sum(s.n_sequences for s in summary.values()) == len(
        {(r.split, r.bucket, r.seq_in_bucket) for r in curated}
    )
    # determinism: rerun reproduces identical curated membership
    again = {r.doc_id for r in training_data_job(docs, token_budget=512, gate_kwargs=gk)["curated"].collect()}
    assert again == {r.doc_id for r in curated}

    # decontamination stage: using some of the corpus itself as the
    # "benchmark" must drop exactly those docs (self-overlap) plus any
    # doc sharing a 3-shingle with them, flagged as eval_overlap
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    out_d = training_data_job(docs, token_budget=512, gate_kwargs=gk, eval_docs=ev)
    contaminated = {
        r.doc_id for r in out_d["rejects"].filter("fail_reason = 'eval_overlap'").collect()
    }
    ev_ids = {r.doc_id for r in ev.select("doc_id").collect()}
    gated_out = {
        r.doc_id for r in out_d["rejects"].filter("fail_reason != 'eval_overlap'").collect()
    }
    # every eval doc that passed the rule gate is flagged (J(x,x)=1)
    assert (ev_ids - gated_out) <= contaminated
    curated_d = {r.doc_id for r in out_d["curated"].collect()}
    assert curated_d.isdisjoint(contaminated) and curated_d <= again


def test_export_training_run(spark, sf_smoke, tmp_path):
    """The last mile: job outputs -> shard files + manifest + telemetry
    tables; re-export reproduces the manifest bit-for-bit."""
    from transaq_clickhouse_exporter_spark.datapipe.pipeline import (
        export_training_run,
        training_data_job,
    )
    from transaq_clickhouse_exporter_spark.datapipe.shards import verify_shards
    from transaq_clickhouse_exporter_spark.testdata import load_table

    docs = load_table(spark, sf_smoke, "documents")
    gk = dict(min_stopword_hits=0)
    out = training_data_job(docs, token_budget=512, gate_kwargs=gk)
    p1 = str(tmp_path / "run1")
    m1 = sorted(map(tuple, export_training_run(out, p1, n_shards=4).collect()))

    data = spark.read.parquet(p1 + "/data")
    assert data.count() == out["curated"].count()
    # per-split counts in the manifest agree with the job's summary
    summ = {r.split: r.n_docs for r in spark.read.parquet(p1 + "/summary").collect()}
    from collections import defaultdict
    per_split = defaultdict(int)
    for row in m1:
        per_split[row[0]] += row[2]  # (split, shard, n_docs, checksum, tokens)
    assert dict(per_split) == summ
    assert verify_shards(spark, p1 + "/data", "doc_id").count() == 0
    assert spark.read.parquet(p1 + "/rejects").count() == out["rejects"].count()

    # determinism: a fresh job + export reproduces the manifest exactly
    out2 = training_data_job(docs, token_budget=512, gate_kwargs=gk)
    m2 = sorted(map(tuple, export_training_run(out2, str(tmp_path / "run2"), n_shards=4).collect()))
    assert m1 == m2
