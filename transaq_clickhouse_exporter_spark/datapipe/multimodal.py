"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The Spark-side plumbing — schemas, partition-preserving batch iteration,
UDF signatures — is real and tested; the codec step is stubbed (no
image/audio libraries in this container) behind
:data:`DECODERS`: ``'fake'`` produces deterministic bytes-derived
features (testable end-to-end), ``'strict'`` raises
``NotImplementedError`` where a real libjpeg/ffmpeg call belongs.

At 100 TB: payloads stay in parquet binary columns (no driver
round-trip), ``spark.sql.files.maxPartitionBytes`` sizes scan splits,
``mapInPandas`` streams Arrow batches so one task never materializes a
partition of videos, and metadata predicates (width/duration/mime)
prune before any byte is decoded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every payload.
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: features from the payload's
    sha256 — stable, content-sensitive, library-free."""
    d = hashlib.sha256(payload).digest()
    return (np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 255.0)


def _strict_decode(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real image/audio decoding requires Pillow/ffmpeg, not present in "
        "this container; wire the codec here"
    )


DECODERS = {"fake": _fake_decode, "strict": _strict_decode}


def attach_meta(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap raw binary rows into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """media → (media_id, feature vector): the decode/feature-extract
    operator.  Batch shape: one Arrow batch in, one out; payload bytes
    never leave the executor."""
    decode = DECODERS[decoder]
    out_schema = "media_id long, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Video → sampled frames: 1→N expansion inside mapInPandas (the
    batch iterator contract allows output cardinality ≠ input).  Frame
    count derives from meta.duration_ms; each frame gets a
    deterministic sub-feature."""
    decode = DECODERS[decoder]
    out_schema = "media_id long, frame_idx int, ts_ms long, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = r["meta"]["duration_ms"] or 0
                base = decode(r["payload"])
                for i, ts in enumerate(range(0, max(int(dur), 1), every_ms)):
                    feat = np.roll(base, i).tolist()
                    rows.append((r["media_id"], i, ts, feat))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "feature"])

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int, decoder: str = "strict") -> DataFrame:
    """Image resize operator shape: payload → payload' with updated
    meta.  Left strict by default — the transform is codec work."""
    decode = DECODERS[decoder]
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            metas = []
            for _, r in pdf.iterrows():
                decode(r["payload"])  # strict → NotImplementedError
                payloads.append(r["payload"])
                m = dict(r["meta"])
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "meta": metas}
            )

    return df.mapInPandas(run, schema=out_schema)
