"""Unit contracts for the two round-6 session-5 additions:

* ``datapipe.chunking.chunk_documents`` — sliding token windows with
  overlap (coverage, overlap width, stop rule, reconstruction)
* ``functions.funnel.retention_flags`` — CH retention's any-row flag
  semantics (dialect twin checked separately in
  tests/test_ch_compat_aggregates.py)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transaq_clickhouse_exporter_spark.datapipe.chunking import chunk_documents
from transaq_clickhouse_exporter_spark.functions.funnel import retention_flags


@pytest.fixture(scope="module")
def docs(spark):
    toks = [f"t{i}" for i in range(150)]
    rows = [
        (1, " ".join(toks)),          # 150 tokens → multiple chunks
        (2, " ".join(toks[:64])),     # exactly one full chunk
        (3, " ".join(toks[:65])),     # one token past a chunk boundary
        (4, "solo"),                  # single token
        (5, "   "),                   # whitespace only → no chunks
        (6, ""),                      # empty → no chunks
        (7, "  a   b\tc\nd  "),       # messy whitespace
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunks(docs, **kw):
    out = chunk_documents(docs, **kw)
    return {
        (r.doc_id, r.chunk_idx): (r.start_tok, r.n_tok, r.chunk_text)
        for r in out.collect()
    }


def test_chunk_coverage_and_overlap(docs):
    got = _chunks(docs, size=64, stride=48)
    # doc 1: 150 tokens → starts 0, 48, 96 (96+64 ≥ 150 stops the grid;
    # 144 is excluded because chunk@96 already reached the end)
    d1 = sorted(k[1] for k in got if k[0] == 1)
    assert d1 == [0, 1, 2]
    assert got[(1, 0)][0] == 0 and got[(1, 0)][1] == 64
    assert got[(1, 1)][0] == 48 and got[(1, 1)][1] == 64
    assert got[(1, 2)][0] == 96 and got[(1, 2)][1] == 54
    # consecutive chunks share exactly size - stride tokens
    c0, c1 = got[(1, 0)][2].split(" "), got[(1, 1)][2].split(" ")
    assert c0[48:] == c1[:16]
    # every token covered exactly once by the stride-aligned prefixes
    recon = c0[:48] + c1[:48] + got[(1, 2)][2].split(" ")
    assert recon == [f"t{i}" for i in range(150)]


def test_chunk_boundary_cases(docs):
    got = _chunks(docs, size=64, stride=48)
    assert sorted(k[1] for k in got if k[0] == 2) == [0]       # exact fit
    assert got[(2, 0)][1] == 64
    # 65 tokens: chunk@0 ends at 64 < 65 → second (short) chunk at 48
    assert sorted(k[1] for k in got if k[0] == 3) == [0, 1]
    assert got[(3, 1)] == (48, 17, " ".join(f"t{i}" for i in range(48, 65)))
    assert got[(4, 0)] == (0, 1, "solo")
    assert not any(k[0] in (5, 6) for k in got)                # no empty-doc chunks
    assert got[(7, 0)] == (0, 4, "a b c d")                    # whitespace folded


def test_chunk_no_overlap_mode(docs):
    got = _chunks(docs, size=50, stride=50)
    d1 = sorted((k[1], *got[k]) for k in got if k[0] == 1)
    assert [(i, s, n) for i, s, n, _ in d1] == [(0, 0, 50), (1, 50, 50), (2, 100, 50)]


def test_chunk_validates_stride():
    with pytest.raises(ValueError):
        chunk_documents(None, size=10, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(None, size=10, stride=11)


def test_retention_flags_semantics(spark):
    rows = [
        (1, "view"), (1, "click"),                  # r = 1,1,0
        (2, "click"), (2, "purchase"),              # no view → 0,0,0
        (3, "view"), (3, "purchase"), (3, "view"),  # r = 1,0,1
        (4, "signup"),                              # r = 0,0,0
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        r.user_id: (r.r1, r.r2, r.r3)
        for r in retention_flags(
            ev, [F.col("event_type") == t for t in ("view", "click", "purchase")]
        ).collect()
    }
    assert out == {1: (1, 1, 0), 2: (0, 0, 0), 3: (1, 0, 1), 4: (0, 0, 0)}
    with pytest.raises(ValueError):
        retention_flags(ev, [])


# ---- retrieval (datapipe/retrieval.py) ---------------------------------


def test_build_chunk_index_hashed_default(spark, docs):
    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        build_chunk_index,
    )

    idx = build_chunk_index(docs, size=64, stride=48, dim=16)
    rows = idx.collect()
    assert {r.doc_id for r in rows} == {1, 2, 3, 4, 7}
    for r in rows:
        assert len(r.embedding) == 17                 # dim + bias
        assert r.embedding[-1] == 1.0                 # constant bias
        # signed unit contributions: components are exact integers
        assert all(v == int(v) for v in r.embedding)
        assert sum(abs(v) for v in r.embedding[:-1]) <= r.n_tok


def test_build_chunk_index_custom_embedder(spark, docs):
    import numpy as np

    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        build_chunk_index,
    )

    def embedder(texts):
        return np.array([[float(len(t)), 1.0] for t in texts])

    idx = build_chunk_index(docs, size=64, stride=48, batch_embedder=embedder)
    got = {(r.doc_id, r.chunk_idx): r.embedding for r in idx.collect()}
    assert got[(4, 0)] == [4.0, 1.0]                  # len("solo")
    assert all(len(v) == 2 for v in got.values())


def test_doc_search_max_pools_chunks(spark):
    from transaq_clickhouse_exporter_spark.datapipe.retrieval import doc_search

    # doc 1 has two chunks: one orthogonal-ish, one identical to the
    # query; doc 2 one mediocre chunk — doc 1 must win via max-pool.
    idx = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0, 0.0]),
            (1, 1, [0.0, 1.0, 0.0]),
            (2, 0, [1.0, 1.0, 0.0]),
        ],
        "doc_id long, chunk_idx int, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(100, [0.0, 1.0, 0.0])], "query_id long, embedding array<double>"
    )
    out = {
        (r.query_id, r.doc_id): (r.best_sim, r.rank)
        for r in doc_search(idx, q, k=2).collect()
    }
    assert out[(100, 1)] == (1.0, 1)
    assert out[(100, 2)][1] == 2 and abs(out[(100, 2)][0] - 0.707107) < 1e-6


@pytest.mark.parametrize("size,stride", [(10, 7), (10, 10), (5, 3), (64, 48), (3, 1)])
def test_chunk_grid_invariants(spark, size, stride):
    """For documents of every token count 1..130: full coverage, the
    exact overlap width, prefix-closed grid, no redundant tail chunk."""
    rows = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 131)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, size=size, stride=stride)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for n in range(1, 131):
        chunks = sorted(by_doc[n], key=lambda r: r.chunk_idx)
        # prefix-closed grid: idx k starts at k*stride
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert all(c.start_tok == c.chunk_idx * stride for c in chunks)
        # coverage: last chunk reaches the end; every token in >=1 chunk
        last = chunks[-1]
        assert last.start_tok + last.n_tok == n
        assert chunks[0].start_tok == 0
        assert all(
            c.n_tok == min(size, n - c.start_tok) and c.n_tok > 0 for c in chunks
        )
        # no redundant tail: a non-first chunk must add new tokens
        for c in chunks[1:]:
            assert c.start_tok - stride + size < n
        # stop rule: had there been one more grid start, it would be
        # redundant (previous chunk already reached the end) or off-grid
        nxt = last.start_tok + stride
        assert nxt >= n or last.start_tok + size >= n
        # exact overlap text between consecutive chunks
        for a, b in zip(chunks, chunks[1:]):
            at, bt = a.chunk_text.split(" "), b.chunk_text.split(" ")
            ov = size - stride
            if ov:
                assert at[stride:stride + min(ov, a.n_tok)] == bt[: min(ov, a.n_tok - stride)]


def test_doc_search_engines_identical(spark, docs):
    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        build_chunk_index,
        doc_search,
    )

    idx = build_chunk_index(docs, size=10, stride=7, dim=8)
    q = idx.filter(F.col("chunk_idx") == 0).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, doc_search(idx, q, k=3, engine="hof").collect()), key=repr)
    b = sorted(map(tuple, doc_search(idx, q, k=3, engine="blas").collect()), key=repr)
    assert a == b and len(a) > 0
    with pytest.raises(ValueError):
        doc_search(idx, q, engine="nope")


def test_doc_search_lsh_recall(spark, sf_smoke):
    """Bucketed retrieval vs brute force on the driver corpus: rank-1
    self-hit always survives (a doc shares every bucket with itself),
    and top-5 doc recall stays above the multi-probe floor."""
    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        build_chunk_index,
        doc_search,
        doc_search_lsh,
    )

    corpus = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    idx = build_chunk_index(corpus, size=64, stride=48, dim=16)
    q = idx.filter(
        (F.col("doc_id") % 29 == 3) & (F.col("chunk_idx") == 0)
    ).select(F.col("doc_id").alias("query_id"), "embedding")
    exact = doc_search(idx, q, k=5)
    approx = doc_search_lsh(idx, q, dim=16, k=5, n_planes=6, n_probes=6)
    truth = {(r.query_id, r.doc_id) for r in exact.collect()}
    got = {(r.query_id, r.doc_id) for r in approx.collect()}
    self_hits = {r.query_id for r in approx.collect() if r.doc_id == r.query_id}
    qids = {r.query_id for r in q.select("query_id").collect()}
    assert self_hits == qids                       # rank-1 self always found
    recall = len(truth & got) / len(truth)
    # hashed embeddings make even true top-5 neighbors barely-above-
    # noise (near-orthogonal), the HARDEST case for sign-LSH — real
    # semantic embeddings cluster far tighter.  0.6 is the measured
    # conservative floor at 6 planes x 6 probes (observed 0.81).
    assert recall >= 0.6, recall


def test_incremental_index_stream_restart(spark, sf_smoke, tmp_path):
    """Stream sf0.001 documents in 3 micro-batches with a kill/restart:
    the persisted incremental index answers doc_search identically to
    an index built over the whole corpus in one shot (chunking and
    embedding are per-document pure), and replaying a committed batch
    is a no-op."""
    import os

    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        build_chunk_index,
        doc_search,
        index_stream_sink,
        read_chunk_index,
    )
    from transaq_clickhouse_exporter_spark.sources.replay import (
        write_jsonl_fixture,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = [r.asDict() for r in docs.collect()]
    batches = [rows[:170], rows[170:340], rows[340:]]
    src, root, ckpt = (str(tmp_path / d) for d in ("src", "idx", "ckpt"))

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        return (
            stream.writeStream.foreachBatch(index_stream_sink(root))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    write_jsonl_fixture(os.path.join(src, "b0.jsonl"), batches[0], mtime=1_000)
    write_jsonl_fixture(os.path.join(src, "b1.jsonl"), batches[1], mtime=2_000)
    run_stream().awaitTermination(300)
    write_jsonl_fixture(os.path.join(src, "b2.jsonl"), batches[2], mtime=3_000)
    run_stream().awaitTermination(300)

    idx_inc = read_chunk_index(spark, root)
    idx_full = build_chunk_index(docs)
    assert idx_inc.count() == idx_full.count()
    q = idx_full.filter(
        (F.col("doc_id") % 101 == 7) & (F.col("chunk_idx") == 0)
    ).select(F.col("doc_id").alias("query_id"), "embedding")
    a = sorted(map(tuple, doc_search(idx_inc, q, k=5).collect()), key=repr)
    b = sorted(map(tuple, doc_search(idx_full, q, k=5).collect()), key=repr)
    assert a == b and len(a) > 0

    # replay idempotence
    b1 = spark.createDataFrame(batches[1], "doc_id long, text string")
    index_stream_sink(root)(b1, 1)
    assert read_chunk_index(spark, root).count() == idx_full.count()


def test_prebucketed_index_identical(spark, sf_smoke):
    """A pre-bucketed index (bucket_planes=…) gives doc_search_lsh the
    same answers as on-the-fly bucketing — and a mismatched
    on-the-fly plane count cannot silently change results because the
    stored column wins."""
    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        build_chunk_index,
        doc_search_lsh,
    )

    corpus = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    plain = build_chunk_index(corpus, size=64, stride=48, dim=16)
    bucketed = build_chunk_index(
        corpus, size=64, stride=48, dim=16, bucket_planes=6
    )
    assert "bucket" in bucketed.columns
    q = plain.filter(
        (F.col("doc_id") % 29 == 3) & (F.col("chunk_idx") == 0)
    ).select(F.col("doc_id").alias("query_id"), "embedding")
    a = sorted(map(tuple, doc_search_lsh(plain, q, dim=16, k=5,
                                         n_planes=6, n_probes=3).collect()),
               key=repr)
    b = sorted(map(tuple, doc_search_lsh(bucketed, q, dim=16, k=5,
                                         n_planes=6, n_probes=3).collect()),
               key=repr)
    assert a == b and len(a) > 0
    # the metadata guard (ADVICE r16 medium): the stored column records
    # planes=6, so probing with n_planes=8 must NOT trust it — the
    # fallback re-buckets from the vectors and answers exactly like an
    # unbucketed index at 8 planes (disjoint bucket spaces would
    # otherwise produce silent near-zero recall)
    assert bucketed.schema["bucket"].metadata.get("planes") == 6
    a8 = sorted(map(tuple, doc_search_lsh(plain, q, dim=16, k=5,
                                          n_planes=8, n_probes=3).collect()),
                key=repr)
    b8 = sorted(map(tuple, doc_search_lsh(bucketed, q, dim=16, k=5,
                                          n_planes=8, n_probes=3).collect()),
                key=repr)
    assert a8 == b8 and len(a8) > 0


def test_doc_search_string_ids_both_engines(spark):
    """ADVICE r6: the default 'blas' engine must handle non-integral
    doc/query ids (string/UUID) identically to 'hof'."""
    from transaq_clickhouse_exporter_spark.datapipe.retrieval import doc_search

    idx = spark.createDataFrame(
        [
            ("doc-aa", 0, [1.0, 0.0, 0.0]),
            ("doc-aa", 1, [0.0, 1.0, 0.0]),
            ("doc-bb", 0, [1.0, 1.0, 0.0]),
        ],
        "doc_id string, chunk_idx int, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("q-1", [0.0, 1.0, 0.0]), ("q-2", [1.0, 0.0, 0.0])],
        "query_id string, embedding array<double>",
    )
    a = sorted(map(tuple, doc_search(idx, q, k=2, engine="hof").collect()), key=repr)
    b = sorted(map(tuple, doc_search(idx, q, k=2, engine="blas").collect()), key=repr)
    assert a == b and len(a) == 4
    assert {r[1] for r in a} == {"doc-aa", "doc-bb"}
    # empty-query early return keeps the string schema too
    empty = doc_search(idx, q.limit(0), k=2, engine="blas")
    assert dict(empty.dtypes)["doc_id"] == "string" and empty.count() == 0
