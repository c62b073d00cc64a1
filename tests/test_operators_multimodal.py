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
