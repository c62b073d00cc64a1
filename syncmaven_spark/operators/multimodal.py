"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, partition-aware batch processing, Arrow
batch shapes, UDF signatures — is real and tested. Decoding is REAL for
three containers parseable with the standard library alone: uncompressed
BMP images (``struct``-parsed headers + raw pixel rows), 8-bit
non-interlaced PNG (``zlib`` inflate + scanline unfiltering, filters 0-4)
— both feeding pixel-statistic features and nearest-neighbor resize — and
PCM WAV audio (``wave`` module → RMS/zero-crossing/envelope features).
Other formats (jpeg/mp4/...) need media libraries absent from this
environment and fall back to a clearly-marked deterministic fake;
swapping in a real decoder is a one-argument change. Everything around the decoder (the expensive part to
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(blob: bytes) -> np.ndarray:
    """Parse an 8-bit non-interlaced PNG (grayscale / gray+alpha / RGB /
    RGBA, color types 0/4/2/6) into an ``(h, w, 3)`` uint8 RGB array,
    standard library only: chunk walk via ``struct``, ``zlib`` inflate of
    the concatenated IDAT stream, then scanline unfiltering (filters
    0-4: None/Sub/Up/Average/Paeth per the PNG spec §9). Palette,
    16-bit, and Adam7-interlaced images raise (no media libs here; a
    real decoder slots in as the ``decoder=`` argument upstream).

    Sub/Up unfilter vectorized (cumsum-mod-256 / row add); Average and
    Paeth fall back to a per-byte loop — fine for fixture-sized images,
    the documented bound of this stdlib decoder.
    """
    import zlib

    if blob is None or len(blob) < 8 or blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(blob):
        (length,), ctype = struct.unpack_from(">I", blob, pos), blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(data) != 13:
                # wrong-length IHDR would raise struct.error, which escapes
                # the callers' (ValueError, zlib.error) malformed-blob catch
                raise ValueError("malformed PNG IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}); only 8-bit non-interlaced 0/2/4/6"
        )
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("invalid PNG dimensions")
    stride = w * channels
    need = h * (stride + 1)
    # bounded inflate: a decompression-bomb IDAT must not allocate past the
    # declared image size (the dims cap above bounds `need` itself)
    raw = zlib.decompressobj().decompress(b"".join(idat), need)
    if len(raw) < need:
        raise ValueError("truncated PNG pixel data")
    recon = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        )
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: per-channel-offset cumsum, uint8 wraps mod 256
            cur = line.copy().reshape(-1, bpp)
            np.cumsum(cur, axis=0, dtype=np.uint8, out=cur)
            cur = cur.reshape(-1)
        elif f == 2:  # Up
            cur = line + prior
        elif f in (3, 4):  # Average / Paeth: sequential by definition
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prior[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        recon[y] = cur
        prior = cur
    px = recon.reshape(h, w, channels)
    if color == 0:  # grayscale → replicate
        return np.repeat(px, 3, axis=2)
    if color == 4:  # gray+alpha → replicate luminance, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGB / RGBA (alpha dropped, as decode_bmp)


def encode_png(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_png`: ``(h, w, 3)`` uint8 RGB → a minimal
    8-bit color-type-2 PNG (filter 0 scanlines, one zlib IDAT)."""
    import binascii
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) array")
    h, w, _ = px.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", binascii.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


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
    # a 0/1-sample clip has no sign transitions: np.diff is empty and
    # np.mean([]) is NaN, which would poison the whole unit-normalized
    # vector (and NaN compares greater-than-everything in Spark, making the
    # clip a "near-duplicate" of every row downstream)
    if samples.size < 2:
        zcr = 0.0
    else:
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
    (``BM`` magic), PNG (8-byte signature), and WAV (``RIFF....WAVE``);
    every other format falls back to the deterministic content-hash fake
    (no media libraries in this environment — the fallback is the
    documented stub)."""
    if blob is not None and blob[:2] == b"BM":
        return _image_features(decode_bmp(blob), feature_dim)
    if blob is not None and blob[:8] == _PNG_SIG:
        return _image_features(decode_png(blob), feature_dim)
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
                if blob is None:
                    # NULL content is a data condition, not a decoder bug —
                    # handled before the call so the programming-error
                    # re-raise below can't misfire on it
                    feats.append(None)
                    oks.append(False)
                    continue
                try:
                    feats.append([float(x) for x in decode(blob, feature_dim)])
                    oks.append(True)
                except (TypeError, NameError, AttributeError):
                    # PROGRAMMING errors (wrong decoder arity, bad import)
                    # must surface, not convert a systematically broken
                    # decoder into a "successful" run of 100% decode_ok=
                    # False rows (round-5 max review). Decoders signal
                    # malformed INPUT with ValueError/struct.error/
                    # zlib.error etc., which stay per-row tolerant below.
                    raise
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
            is_bmp = blob is not None and blob[:2] == b"BM"
            is_png = blob is not None and blob[:8] == _PNG_SIG
            if is_bmp or is_png:
                import zlib

                try:
                    px = decode_bmp(blob) if is_bmp else decode_png(blob)
                except (ValueError, zlib.error, struct.error):
                    # malformed / unsupported variant: fall through to the
                    # marker stub instead of failing the whole task (one
                    # bad blob must not abort a corpus-wide pass)
                    pass
                else:
                    src_h, src_w, _ = px.shape
                    ys = (np.arange(h) * src_h) // h
                    xs = (np.arange(w) * src_w) // w
                    resized = px[ys][:, xs]
                    return (
                        encode_bmp(resized) if is_bmp else encode_png(resized)
                    )
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
    if every_ms <= 0:
        # fail on the driver with the misuse, not with a ZeroDivisionError
        # buried in an executor traceback after shuffle work
        raise ValueError(f"every_ms must be positive, got {every_ms}")
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
    and benchmarks; the driver testdata has no binary tables).

    Since round 5 the blobs are REAL containers wherever a real stdlib
    codec exists, so the default pipeline exercises actual decoding:
    images alternate PNG / BMP (seeded random 12×16 RGB pixels), audio is
    16-bit PCM WAV (seeded random samples); video has no stdlib container
    and stays a content-hash blob feeding the deterministic fake decoder.
    """
    rows = []
    for i in range(n):
        rng = np.random.RandomState(1000 + i)
        if media_type == "image":
            px = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
            fmt = "png" if i % 2 == 0 else "bmp"
            blob = encode_png(px) if fmt == "png" else encode_bmp(px)
            meta = {"media_type": "image", "format": fmt, "width": 12,
                    "height": 16, "duration_ms": None}
        elif media_type == "audio":
            import io
            import wave

            samples = (rng.standard_normal(800) * 8000).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(8000)
                wf.writeframes(samples.tobytes())
            blob = buf.getvalue()
            meta = {"media_type": "audio", "format": "wav", "width": None,
                    "height": None, "duration_ms": 100}
        else:
            blob = hashlib.sha256(f"media-{i}".encode()).digest() * 8
            meta = {"media_type": media_type, "format": "mp4", "width": 64,
                    "height": 48, "duration_ms": 4000 + i * 500}
        rows.append((i, blob, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
