"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, partition-aware batch processing, Arrow
batch shapes, UDF signatures — is real and tested; the actual media decoding
is STUBBED (``decoder=None`` → deterministic fake) because media libraries
(Pillow/ffmpeg/torchaudio) are not available in this environment. Swapping in
a real decoder is a one-argument change; everything around it (the expensive
part to get right at 100 TB) stays identical:

- media rides as a ``binary`` column next to a metadata struct — never
  exploded into Python objects row-by-row,
- decode/feature-extract runs via ``mapInPandas`` so one Arrow batch of
  binary blobs crosses the boundary at a time (bounded memory per task,
  controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``),
- outputs are fixed-size float arrays / scalars, so downstream operators
  (ANN, dedup) compose directly.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)


def _fake_decode(blob: bytes, feature_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive a unit-norm feature
    vector from the content hash. Same input → same output, so tests and
    dedup semantics are exercisable without media libraries."""
    if blob is None:
        raise ValueError("null media content")
    digest = hashlib.sha256(blob).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(feature_dim)
    return v / (np.linalg.norm(v) + 1e-12)


def extract_features(
    df: DataFrame,
    feature_dim: int = 64,
    content_col: str = "content",
    decoder: Callable[[bytes, int], np.ndarray] | None = None,
) -> DataFrame:
    """media rows → ``(…, features array<float>, decode_ok boolean)``.

    ``decoder(blob, feature_dim) -> np.ndarray`` plugs in the real model;
    decode failures null the feature column instead of killing the task.
    """
    decode = decoder or _fake_decode
    in_fields = df.schema.fields
    out_schema = T.StructType(
        [*in_fields,
         T.StructField("features", T.ArrayType(T.FloatType()), True),
         T.StructField("decode_ok", T.BooleanType(), False)]
    )
    names = [f.name for f in in_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for blob in pdf[content_col]:
                try:
                    feats.append([float(x) for x in decode(blob, feature_dim)])
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            out = pdf[names].copy()
            out["features"] = feats
            out["decode_ok"] = oks
            yield out

    return df.mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize pass: binary in → binary out, metadata updated.

    Without a real ``resizer`` the content passes through unchanged except
    for a deterministic marker header, and the metadata struct is updated —
    the plumbing (schema evolution + batch shape) is what's under test.
    """
    if resizer is None:
        def resizer(blob: bytes, w: int, h: int) -> bytes:  # noqa: ANN001
            raise NotImplementedError(
                "real image resize requires an imaging library; supply "
                "resizer=... (stub applies a marker header instead)"
            )

        def stub(blob: bytes, w: int, h: int) -> bytes:
            return b"RESIZED:%dx%d:" % (w, h) + (blob or b"")

        resizer = stub

    out_schema = df.schema
    names = [f.name for f in df.schema.fields]
    meta_idx = "meta" in names

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[names].copy()
            out[content_col] = [resizer(b, width, height) for b in pdf[content_col]]
            if meta_idx:
                def upd(m):
                    if m is None:
                        return None
                    m = dict(m)
                    m["width"], m["height"] = width, height
                    return m
                out["meta"] = [upd(m) for m in pdf["meta"]]
            yield out

    return df.mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int,
    content_col: str = "content",
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """1 video → N frame rows (``frame_idx``, ``frame`` binary).

    The stub emits deterministic placeholder frames derived from duration
    metadata; a real ``sampler(blob, every_ms) -> [frame_bytes]`` slots in
    unchanged.
    """
    in_fields = [f for f in df.schema.fields]
    out_schema = T.StructType(
        [*in_fields,
         T.StructField("frame_idx", T.IntegerType(), False),
         T.StructField("frame", T.BinaryType(), True)]
    )
    names = [f.name for f in in_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[content_col]
                if sampler is not None:
                    frames = sampler(blob, every_ms)
                else:
                    duration = (row.get("meta") or {}).get("duration_ms") or 0
                    n = max(1, int(duration // every_ms))
                    frames = [
                        hashlib.sha256((blob or b"") + bytes([i % 256])).digest()
                        for i in range(min(n, 64))
                    ]
                for i, frame in enumerate(frames):
                    rows.append([*(row[n] for n in names), i, frame])
            yield pd.DataFrame(rows, columns=[*names, "frame_idx", "frame"])

    return df.mapInPandas(run, out_schema)


def synthetic_media_df(spark, n: int = 20, media_type: str = "image") -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA (for tests
    and benchmarks; the driver testdata has no binary tables)."""
    rows = []
    for i in range(n):
        blob = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                blob,
                {
                    "media_type": media_type,
                    "format": "png" if media_type == "image" else "wav",
                    "width": 64,
                    "height": 48,
                    "duration_ms": 4000 + i * 500,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
