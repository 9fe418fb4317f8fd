"""Multimodal plumbing tests: schema, determinism, batch shape."""

from __future__ import annotations

import pytest

from borsa_spark import schemas
from borsa_spark.functions.multimodal import (
    audio_features,
    image_features,
    media_batch_conf,
    resize_images,
    sample_video_frames,
)


@pytest.fixture()
def assets(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-bytes-1", None, None, None, None, None),
        (2, "image", "image/png", b"\x89PNG-fake-bytes-2", None, None, None, None, None),
        (3, "audio", "audio/wav", b"RIFF-fake", None, None, 2500, 44100, None),
        (4, "video", "video/mp4", b"mp4-fake", None, None, 3500, None, None),
        (5, "image", "image/png", None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)


class TestMultimodal:
    def test_image_features_deterministic(self, assets):
        out1 = {r.asset_id: r for r in image_features(assets).collect()}
        out2 = {r.asset_id: r for r in image_features(assets).collect()}
        assert set(out1) == {1, 2, 3, 4, 5}
        for k in out1:
            assert out1[k] == out2[k]  # decode is deterministic
        assert out1[1].sha256 != out1[2].sha256
        assert 16 <= out1[1].width < 256
        assert out1[1].decoder == "fake-deterministic"

    def test_audio_features_window_count(self, assets):
        out = {r.asset_id: r for r in audio_features(assets).collect()}
        assert out[3].n_windows == 100  # 2500ms / 25ms
        assert out[3].sample_rate == 44100
        assert 0.0 <= out[3].rms <= 1.0

    def test_resize_emits_fixed_size_thumbs(self, assets):
        out = resize_images(assets.filter("modality = 'image'"), 8, 8).collect()
        assert all(len(r.thumb) == 64 for r in out)
        assert {r.asset_id for r in out} == {1, 2, 5}

    def test_video_frame_sampling_metadata_only(self, assets):
        out = sample_video_frames(assets, every_ms=1000).collect()
        # 3500ms -> frames at 0,1000,2000 (n = 3500//1000 = 3)
        assert [(r.frame_idx, r.frame_ts_ms) for r in sorted(out, key=lambda r: r.frame_idx)] == [
            (0, 0), (1, 1000), (2, 2000),
        ]

    def test_batch_conf_sizing(self):
        assert media_batch_conf(10 * 1 << 20) == 25  # 10MB payloads -> 25/batch
        assert media_batch_conf(1) == 1 << 28
        assert media_batch_conf(1 << 40) == 1  # never zero
