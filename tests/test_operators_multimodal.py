"""Multimodal plumbing tests (decode stubbed; schemas/batching real)."""

import pytest

from syncmaven_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_video_frames,
    synthetic_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media_df(spark, n=10)


def test_extract_features_deterministic_and_unit_norm(media):
    out1 = extract_features(media, feature_dim=16).collect()
    out2 = extract_features(media, feature_dim=16).collect()
    by_id1 = {r.media_id: r.features for r in out1}
    by_id2 = {r.media_id: r.features for r in out2}
    assert by_id1 == by_id2  # deterministic fake decoder
    for feats in by_id1.values():
        assert len(feats) == 16
        norm = sum(x * x for x in feats) ** 0.5
        assert abs(norm - 1.0) < 1e-5
    assert all(r.decode_ok for r in out1)


def test_extract_features_decode_failure_nulls_row(spark, media):
    def flaky_decoder(blob, dim):
        if blob[0] % 2 == 0:
            raise ValueError("corrupt media")
        from syncmaven_spark.operators.multimodal import _fake_decode

        return _fake_decode(blob, dim)

    out = extract_features(media, feature_dim=8, decoder=flaky_decoder).collect()
    failed = [r for r in out if not r.decode_ok]
    ok = [r for r in out if r.decode_ok]
    assert failed and ok  # both paths exercised
    assert all(r.features is None for r in failed)
    assert all(r.features is not None for r in ok)


def test_resize_updates_meta_and_content(media):
    out = resize_images(media, 32, 24).collect()
    for r in out:
        assert r.meta.width == 32 and r.meta.height == 24
        assert bytes(r.content).startswith(b"RESIZED:32x24:")


def test_sample_video_frames_expands_rows(spark):
    media = synthetic_media_df(spark, n=4, media_type="video")
    out = sample_video_frames(media, every_ms=1000).collect()
    # duration 4000+i*500 → 4..5 frames per video (int division)
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert {mid: len(rows) for mid, rows in by_id.items()} == {0: 4, 1: 4, 2: 5, 3: 5}
    for rows in by_id.values():
        assert sorted(r.frame_idx for r in rows) == list(range(len(rows)))
        assert all(r.frame is not None for r in rows)


def test_bmp_codec_roundtrip():
    """decode_bmp/encode_bmp are real stdlib parsers: odd widths exercise
    the 4-byte row padding, and both bottom-up and top-down layouts read
    back to the same RGB array."""
    import numpy as np

    from syncmaven_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (13, 7, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    assert (decode_bmp(blob) == px).all()
    # top-down variant (negative height) decodes identically
    import struct

    hdr = bytearray(blob)
    height = struct.unpack_from("<i", hdr, 22)[0]
    struct.pack_into("<i", hdr, 22, -height)
    data = np.frombuffer(blob, np.uint8, offset=54).reshape(13, -1)[::-1].tobytes()
    assert (decode_bmp(bytes(hdr[:54]) + data) == px).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 60)  # zero dimensions
    with _pytest.raises(ValueError):
        decode_bmp(blob[:40])  # truncated


def test_extract_features_real_bmp_and_wav(spark):
    """The default decoder produces CONTENT-derived features for BMP/WAV:
    identical pixels ⇒ identical features even from different byte
    encodings, and a brighter image shifts the luminance stats."""
    import io
    import wave

    import numpy as np

    from syncmaven_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_bmp,
        extract_features,
    )

    rng = np.random.RandomState(1)
    dark = rng.randint(0, 100, (16, 16, 3), dtype=np.uint8)
    bright = np.clip(dark.astype(int) + 120, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        t = np.arange(4000)
        wf.writeframes((np.sin(t) * 20000).astype("<i2").tobytes())
    rows = [
        (0, encode_bmp(dark), {"media_type": "image", "format": "bmp",
                               "width": 16, "height": 16, "duration_ms": None}),
        (1, encode_bmp(bright), {"media_type": "image", "format": "bmp",
                                 "width": 16, "height": 16, "duration_ms": None}),
        (2, buf.getvalue(), {"media_type": "audio", "format": "wav",
                             "width": None, "height": None, "duration_ms": 500}),
        (3, b"\x89PNG fake", {"media_type": "image", "format": "png",
                              "width": 1, "height": 1, "duration_ms": None}),
    ]
    out = {
        r.media_id: r
        for r in extract_features(
            spark.createDataFrame(rows, MEDIA_SCHEMA), feature_dim=32
        ).collect()
    }
    assert all(out[i].decode_ok for i in range(4))
    f_dark, f_bright = np.array(out[0].features), np.array(out[1].features)
    assert not np.allclose(f_dark, f_bright)  # content-derived, not hash
    # same pixels in a DIFFERENT byte encoding (top-down row order) must
    # feature identically — content-derived, not blob-hash-derived
    import struct

    from syncmaven_spark.operators.multimodal import default_decode

    blob = encode_bmp(dark)
    hdr = bytearray(blob[:54])
    struct.pack_into("<i", hdr, 22, -struct.unpack_from("<i", hdr, 22)[0])
    flipped = np.frombuffer(blob, np.uint8, offset=54).reshape(16, -1)[::-1]
    top_down = bytes(hdr) + flipped.tobytes()
    assert top_down != blob
    assert np.allclose(
        f_dark, default_decode(top_down, 32).astype(np.float32), atol=1e-6
    )
    for i in range(4):
        assert abs(np.linalg.norm(np.array(out[i].features)) - 1.0) < 1e-5


def test_resize_really_resizes_bmp(media, spark):
    """BMP content is actually resized (decoded dims change), metadata
    follows; non-BMP content still gets the marker stub."""
    import numpy as np

    from syncmaven_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_bmp,
        resize_images,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (48, 64, 3), dtype=np.uint8)
    rows = [(0, encode_bmp(px), {"media_type": "image", "format": "bmp",
                                 "width": 64, "height": 48, "duration_ms": None})]
    out = resize_images(
        spark.createDataFrame(rows, MEDIA_SCHEMA), 32, 24
    ).collect()[0]
    resized = decode_bmp(bytes(out.content))
    assert resized.shape == (24, 32, 3)
    assert out.meta.width == 32 and out.meta.height == 24
    # nearest-neighbor: every output pixel exists in the source
    assert resized[0, 0] in px.reshape(-1, 3)
