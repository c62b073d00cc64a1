"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, partition-aware batch processing, Arrow
batch shapes, UDF signatures — is real and tested. Decoding is REAL for two
containers parseable with the standard library alone: uncompressed BMP
images (``struct``-parsed headers + raw pixel rows → pixel-statistic
features, nearest-neighbor resize) and PCM WAV audio (``wave`` module →
RMS/zero-crossing/envelope features). Other formats (png/jpeg/mp4/...)
need media libraries absent from this environment and fall back to a
clearly-marked deterministic fake; swapping in a real decoder is a
one-argument change. Everything around the decoder (the expensive part to
get right at 100 TB) is identical for real and fake paths:

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
import struct
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


# --- real stdlib decoders: BMP (struct) and WAV (wave) --------------------


def decode_bmp(blob: bytes) -> np.ndarray:
    """Parse an uncompressed 24/32-bit BI_RGB BMP into an ``(h, w, 3)``
    uint8 RGB array, standard library only: BITMAPFILEHEADER (14 bytes) +
    BITMAPINFOHEADER via ``struct``, then raw BGR(A) pixel rows with
    4-byte row padding; positive heights are bottom-up per the spec."""
    if blob is None or len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", blob, 14)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP variant (header={hdr_size}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24/32-bit"
        )
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        raise ValueError("invalid BMP dimensions")
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    need = pixel_off + stride * height
    if len(blob) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB, drop alpha


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_bmp`: ``(h, w, 3)`` uint8 RGB → a minimal
    bottom-up 24-bit BI_RGB BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) array")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV (8/16/32-bit int) via the stdlib ``wave`` module into
    ``(mono float samples in [-1, 1], sample_rate)``."""
    import io
    import wave

    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF":
        raise ValueError("not a WAV file")
    with wave.open(io.BytesIO(blob)) as wf:
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # unsigned 8-bit
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        samples = (samples - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


def _pad_unit(parts: list[np.ndarray], feature_dim: int) -> np.ndarray:
    """Concatenate feature blocks, then cycle-pad/truncate to
    ``feature_dim`` and L2-normalize — fixed-size output regardless of
    which blocks a format produced."""
    v = np.concatenate([np.atleast_1d(np.asarray(p, dtype=np.float64)) for p in parts])
    if len(v) < feature_dim:
        v = np.resize(v, feature_dim)  # cycles the existing values
    else:
        v = v[:feature_dim]
    return v / (np.linalg.norm(v) + 1e-12)


def _image_features(px: np.ndarray, feature_dim: int) -> np.ndarray:
    """Pixel-statistic embedding: per-channel mean/std, a 16-bin luminance
    histogram, aspect ratio, and a coarse 4×4 downsampled luminance grid —
    deterministic, content-derived, comparable across sizes."""
    flat = px.reshape(-1, 3).astype(np.float64)
    lum = flat @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=16, range=(0.0, 255.0))[0]
    hist = hist / max(1, lum.size)
    h, w, _ = px.shape
    ys = (np.arange(4) * h) // 4
    xs = (np.arange(4) * w) // 4
    grid = px[ys][:, xs].astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    return _pad_unit(
        [flat.mean(0) / 255.0, flat.std(0) / 255.0, hist, [w / (w + h)],
         grid.ravel() / 255.0],
        feature_dim,
    )


def _audio_features(samples: np.ndarray, rate: int, feature_dim: int) -> np.ndarray:
    """Waveform-statistic embedding: RMS, zero-crossing rate, peak, and a
    16-segment RMS envelope."""
    if samples.size == 0:
        samples = np.zeros(1)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    segs = np.array_split(samples, 16)
    envelope = np.array([float(np.sqrt(np.mean(s**2))) if s.size else 0.0 for s in segs])
    return _pad_unit(
        [[float(np.sqrt(np.mean(samples**2))), zcr, float(np.abs(samples).max()),
          min(1.0, samples.size / max(rate, 1) / 60.0)], envelope],
        feature_dim,
    )


def default_decode(blob: bytes, feature_dim: int) -> np.ndarray:
    """Format-sniffing decoder: REAL pixel/sample-derived features for BMP
    (``BM`` magic) and WAV (``RIFF....WAVE``); every other format falls
    back to the deterministic content-hash fake (no media libraries in
    this environment — the fallback is the documented stub)."""
    if blob is not None and blob[:2] == b"BM":
        return _image_features(decode_bmp(blob), feature_dim)
    if blob is not None and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _audio_features(*decode_wav(blob), feature_dim)
    return _fake_decode(blob, feature_dim)


def extract_features(
    df: DataFrame,
    feature_dim: int = 64,
    content_col: str = "content",
    decoder: Callable[[bytes, int], np.ndarray] | None = None,
) -> DataFrame:
    """media rows → ``(…, features array<float>, decode_ok boolean)``.

    The default decoder extracts REAL content-derived features for BMP and
    WAV blobs (see :func:`default_decode`) and hash-fake ones elsewhere;
    ``decoder(blob, feature_dim) -> np.ndarray`` plugs in a real model.
    Decode failures null the feature column instead of killing the task.
    """
    decode = decoder or default_decode
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

    The default resizer REALLY resizes BMP content (decode → nearest-
    neighbor index remap → re-encode, all numpy/stdlib); other formats get
    a deterministic marker header (a real imaging library would slot in as
    ``resizer=...``) — the plumbing (schema evolution + batch shape) is
    identical either way.
    """
    if resizer is None:
        def resizer(blob: bytes, w: int, h: int) -> bytes:  # noqa: ANN001
            if blob is not None and blob[:2] == b"BM":
                try:
                    px = decode_bmp(blob)
                except ValueError:
                    # malformed / unsupported BMP variant: fall through to
                    # the marker stub instead of failing the whole task
                    # (one bad blob must not abort a corpus-wide pass)
                    pass
                else:
                    src_h, src_w, _ = px.shape
                    ys = (np.arange(h) * src_h) // h
                    xs = (np.arange(w) * src_w) // w
                    return encode_bmp(px[ys][:, xs])
            return b"RESIZED:%dx%d:" % (w, h) + (blob or b"")

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
