"""VERDICT r6 item 6: drive the ``batch_embedder`` / ``batch_scorer``
Arrow hooks with a REAL (tiny) model artifact loaded from a file —
proving the deployment path end-to-end beyond the hashed/fake
defaults: artifact on disk → lazy load inside the executor-side
callable → Arrow-batched inference → same top-k / gate contracts.

The model is a numpy linear projection (char-trigram hash features →
dense embedding; logistic head for the scorer) — the smallest thing
that is honestly "a model loaded from weights" while staying
deterministic and dependency-free.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

D_IN, D_OUT = 64, 8

def _featurize(texts: list[str]) -> np.ndarray:
    # crc32, not hash(): Python's str hash is per-process randomized,
    # and these features must agree between driver and executors
    from zlib import crc32

    out = np.zeros((len(texts), D_IN), dtype=np.float64)
    for i, t in enumerate(texts):
        for j in range(len(t) - 2):
            out[i, crc32(t[j : j + 3].encode()) % D_IN] += 1.0
    return out


# NOTE: the factories below are deliberately SELF-CONTAINED closures —
# only the artifact path (a string) and local defs ship to executors;
# weights lazy-load per process at the first batch (the standard
# model-artifact pattern, and what keeps the closure tiny).


def _make_embedder(path: str):
    d_in, cache = D_IN, {}

    def embed(texts: list[str]) -> np.ndarray:
        import numpy as np
        from zlib import crc32

        if "m" not in cache:
            cache["m"] = dict(np.load(path))
        feats = np.zeros((len(texts), d_in), dtype=np.float64)
        for i, t in enumerate(texts):
            for j in range(len(t) - 2):
                feats[i, crc32(t[j : j + 3].encode()) % d_in] += 1.0
        return feats @ cache["m"]["W"]  # (n, D_OUT)

    return embed


def _make_scorer(path: str):
    d_in, cache = D_IN, {}

    def score(texts: list[str]) -> np.ndarray:
        import numpy as np
        from zlib import crc32

        if "m" not in cache:
            cache["m"] = dict(np.load(path))
        feats = np.zeros((len(texts), d_in), dtype=np.float64)
        for i, t in enumerate(texts):
            for j in range(len(t) - 2):
                feats[i, crc32(t[j : j + 3].encode()) % d_in] += 1.0
        z = feats @ cache["m"]["w"] + cache["m"]["b"]
        return 1.0 / (1.0 + np.exp(-z))

    return score


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    rng = np.random.default_rng(42)
    p = tmp_path_factory.mktemp("model") / "tiny_linear.npz"
    np.savez(
        p,
        W=rng.standard_normal((D_IN, D_OUT)),
        w=rng.standard_normal(D_IN),
        b=np.float64(-2.0),
    )
    return str(p)


@pytest.fixture()
def docs(spark):
    rows = [
        (i, ("the quick brown fox %d " % i) * (3 + i % 4)) for i in range(20)
    ] + [(100 + i, "lorem ipsum dolor sit amet %d" % i) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_file_loaded_embedder_through_chunk_index_and_search(
    spark, docs, model_path
):
    from transaq_clickhouse_exporter_spark.datapipe.retrieval import (
        build_chunk_index,
        doc_search,
    )

    embed = _make_embedder(model_path)
    idx = build_chunk_index(
        docs, size=8, stride=8, batch_embedder=embed, keep_text=True
    ).cache()
    # plumbing: embedding column has the MODEL's dimension, one vector
    # per chunk, values equal to a driver-side numpy reference
    rows = idx.collect()
    assert rows and all(len(r.embedding) == D_OUT for r in rows)
    ref = {
        (r.doc_id, r.chunk_idx): embed([r.chunk_text])[0] for r in rows
    }
    for r in rows:
        assert np.allclose(r.embedding, ref[(r.doc_id, r.chunk_idx)])

    # same top-k contract as the hashed default, on model embeddings
    q_texts = ["the quick brown fox 3", "lorem ipsum dolor"]
    qv = embed(q_texts)
    q = spark.createDataFrame(
        [(i, [float(x) for x in qv[i]]) for i in range(len(q_texts))],
        "query_id long, embedding array<double>",
    )
    for engine in ("hof", "blas"):
        out = doc_search(idx, q, k=3, engine=engine).collect()
        per_q: dict = {}
        for r in out:
            per_q.setdefault(r.query_id, []).append(r)
        assert set(per_q) == {0, 1}
        for qid, rs in per_q.items():
            assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3]
            sims = [r.best_sim for r in sorted(rs, key=lambda r: r.rank)]
            assert sims == sorted(sims, reverse=True)
        # the fox query must retrieve a fox doc first, lorem a lorem doc
        best0 = min(per_q[0], key=lambda r: r.rank).doc_id
        best1 = min(per_q[1], key=lambda r: r.rank).doc_id
        assert best0 < 100 <= best1


def test_file_loaded_scorer_through_gate(spark, docs, model_path):
    """dp24's gate (score_documents + threshold) with file-loaded
    logistic weights: scores equal the driver-side reference, the
    keep column implements the threshold."""
    from transaq_clickhouse_exporter_spark.datapipe.scoring import (
        score_documents,
    )

    scorer = _make_scorer(model_path)
    out = score_documents(
        docs, batch_scorer=scorer, threshold=0.5
    ).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(out) == len(texts)
    for r in out:
        want = scorer([texts[r.doc_id]])[0]
        assert r.score == pytest.approx(want, abs=1e-12)
        assert r.keep == (r.score >= 0.5)
    assert {r.keep for r in out} == {True, False}  # gate discriminates
