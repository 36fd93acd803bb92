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


def attach_meta(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    mime: str,
    duration_col: str | None = None,
) -> DataFrame:
    """Wrap raw binary rows into the canonical media schema.
    ``duration_col``: optional source column for ``meta.duration_ms``
    (video/audio rows — drives :func:`frame_sample`'s frame count)."""
    dur = (
        F.col(duration_col).cast("long")
        if duration_col
        else F.lit(None).cast("long")
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            dur.alias("duration_ms"),
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
    deterministic sub-feature.

    The expansion builds COLUMN arrays (repeat/cumsum index math + one
    fancy-indexed roll matrix), never a per-row Python loop — only the
    decode call itself is per-payload, because that is the codec seam a
    real libjpeg/ffmpeg call will occupy."""
    decode = DECODERS[decoder]
    out_schema = "media_id long, frame_idx int, ts_ms long, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            durs = np.array(
                [int(m["duration_ms"] or 0) for m in pdf["meta"]], dtype=np.int64
            )
            n_frames = -(-np.maximum(durs, 1) // every_ms)  # ceil-div, ≥1
            total = int(n_frames.sum())
            # source-row index of each output frame, and each frame's
            # ordinal within its row: arange minus the row's start offset
            src = np.repeat(np.arange(len(pdf)), n_frames)
            offsets = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_idx = np.arange(total, dtype=np.int64) - offsets
            # decode once per payload (codec seam), then roll every
            # frame's copy in one fancy-indexed gather:
            # np.roll(b, i)[j] == b[(j - i) % D]
            bases = np.stack([decode(p) for p in pdf["payload"]])[src]
            cols = (np.arange(FEATURE_DIM)[None, :] - frame_idx[:, None]) % FEATURE_DIM
            rolled = bases[np.arange(total)[:, None], cols]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[src],
                    "frame_idx": frame_idx.astype(np.int32),
                    "ts_ms": frame_idx * every_ms,
                    "feature": rolled.tolist(),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int, decoder: str = "strict") -> DataFrame:
    """Image resize operator shape: payload → payload' with updated
    meta.  Left strict by default — the transform is codec work."""
    decode = DECODERS[decoder]
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["payload"]:
                decode(p)  # strict → NotImplementedError (codec seam)
            metas = [dict(m) | {"width": width, "height": height} for m in pdf["meta"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": pdf["payload"], "meta": metas}
            )

    return df.mapInPandas(run, schema=out_schema)
