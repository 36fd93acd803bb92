"""Model-based document scoring — the quality-classifier stage of
published pretraining pipelines (CCNet's KenLM perplexity buckets,
fastText quality classifiers in the GPT-3/Llama data work) as a
pluggable seam, the same pattern as :mod:`.multimodal`'s codec stub:
the Spark-side plumbing (Arrow batching, score schema, threshold gate,
bucket assignment, pipeline wiring) is real and tested; the model
itself is a ``batch_scorer`` callable a deployment drops in.

The built-in ``'fake'`` scorer is a deterministic md5-derived uniform
score in [0, 1) — NOT a quality model, but exactly reproducible in SQL
(the hash-sampling discipline), so the whole stage is oracle-checkable
end to end.  Swapping in a real model changes only the callable: it
receives a list of document strings per Arrow batch and returns one
float per document (model inference is embarrassingly parallel per
batch — zero shuffle, the mapInPandas scale shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fake_batch_scorer(texts: list[str]) -> np.ndarray:
    """Deterministic stand-in: first 8 md5 hex nibbles mod 1e6, scaled
    to [0, 1) with 6 decimals — bit-reproducible in any engine."""
    import hashlib

    out = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        out[i] = (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % 1_000_000) / 1e6
    return out


SCORERS = {"fake": _fake_batch_scorer}


def score_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scorer: str = "fake",
    batch_scorer=None,
    threshold: float | None = None,
) -> DataFrame:
    """Score every document: ``(id_col, score double[, keep boolean])``.

    ``batch_scorer``: ``Callable[[list[str]], np.ndarray]`` — the real
    model hook; overrides ``scorer``.  ``threshold`` adds a ``keep``
    column (``score >= threshold``) for gate-style use."""
    fn = batch_scorer if batch_scorer is not None else SCORERS[scorer]

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "score": fn(list(pdf[text_col])),
                }
            )

    out = docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} bigint, score double"
    )
    if threshold is not None:
        out = out.withColumn("keep", F.col("score") >= float(threshold))
    return out


def score_buckets(scored: DataFrame, edges: tuple[float, ...] = (0.25, 0.5, 0.75)):
    """Bucket index per document (``0..len(edges)``): the CCNet-style
    head/middle/tail split — downstream mixtures sample per bucket."""
    b = sum((F.col("score") >= float(e)).cast("int") for e in edges)
    return scored.withColumn("bucket", b.cast("int"))
