"""Property-based fuzzing of the round-6 codecs (hypothesis): every
decode(encode(x)) must be bit-exact for the lossless formats across
arbitrary shapes/values, and quantization-bounded for JPEG. These
complement the hand-picked cases in test_multimodal.py with
machine-chosen edge shapes (1-pixel strips, single frames, extreme
values)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestPngProperties:
    @SET
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ch=st.integers(1, 4),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_any_shape(self, h, w, ch, ft, seed):
        from borsa_spark.functions.multimodal import (
            _png_pixels,
            encode_png_pixels,
        )

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        assert np.array_equal(
            _png_pixels(encode_png_pixels(px, filter_type=ft)), px
        )


class TestWavProperties:
    @SET
    @given(
        n=st.integers(1, 2000),
        chans=st.integers(1, 3),
        sr=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_rms_matches_numpy(self, n, chans, sr, seed):
        from borsa_spark.functions.multimodal import decode_wav, encode_wav

        rng = np.random.default_rng(seed)
        x = rng.uniform(-1, 1, size=(n, chans))
        got_sr, got_ch, got_fr, got_dur, got_rms = decode_wav(
            encode_wav(x, sr)
        )
        assert (got_sr, got_ch, got_fr) == (sr, chans, n)
        # reference rms over the same quantization the encoder applies
        q = (np.clip(x, -1.0, 1.0 - 1.0 / 32768) * 32768.0).astype(
            "<i2"
        ).astype(np.float64) / 32768.0
        assert got_rms == pytest.approx(
            float(np.sqrt(np.mean(q * q))), abs=1e-12
        )


class TestFlacProperties:
    @SET
    @given(
        n=st.integers(1, 3000),
        chans=st.integers(1, 2),
        blocksize=st.sampled_from([64, 333, 1024]),
        mode=st.sampled_from(["noise", "ramp", "const", "sine"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_bit_exact_roundtrip(self, n, chans, blocksize, mode, seed):
        from borsa_spark.functions.flac import decode_flac, encode_flac

        rng = np.random.default_rng(seed)
        if mode == "noise":
            x = rng.integers(-32768, 32768, size=(n, chans))
        elif mode == "ramp":
            base = (np.arange(n) * 7 % 5000 - 2500)
            x = np.stack([base + c for c in range(chans)], axis=1)
        elif mode == "const":
            x = np.full((n, chans), int(rng.integers(-32768, 32768)))
        else:
            t = np.arange(n)
            x = np.stack(
                [
                    (10_000 * np.sin(2 * np.pi * (50 + 10 * c) * t / 8000))
                    .astype(np.int64)
                    for c in range(chans)
                ],
                axis=1,
            )
        dec, sr, bps = decode_flac(encode_flac(x, 8000, blocksize))
        assert np.array_equal(dec, x)


class TestAviProperties:
    @SET
    @given(
        n=st.integers(1, 6),
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_lossless_roundtrip_any_shape(self, n, h, w, seed):
        from borsa_spark.functions.multimodal import decode_avi, encode_avi

        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        back, fps = decode_avi(encode_avi(frames, fps=10))
        assert fps == 10
        assert np.array_equal(back, frames)


class TestJpegProperties:
    @SET
    @given(
        h=st.integers(8, 40),
        w=st.integers(8, 40),
        sub=st.sampled_from(["444", "420"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_smooth_images_bounded_error(self, h, w, sub, seed):
        from borsa_spark.functions.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        # smooth low-frequency field: quantization error stays small
        fy, fx = rng.uniform(0.05, 0.3, 2)
        gy, gx = np.mgrid[0:h, 0:w]
        base = 128 + 100 * np.sin(fy * gy) * np.cos(fx * gx)
        img = np.stack(
            [base, base * 0.8 + 20, 255 - base], axis=2
        ).clip(0, 255).astype(np.uint8)
        back = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert back.shape == img.shape
        err = np.abs(back.astype(int) - img.astype(int))
        # 4:2:0 halves chroma resolution, and the generated images have
        # strong chroma gradients (the 255-base channel opposes base),
        # so its bound is legitimately looser than 4:4:4's
        mean_bound, max_bound = (4.0, 48) if sub == "444" else (9.0, 80)
        assert err.mean() < mean_bound
        assert err.max() < max_bound


class TestGifProperties:
    @SET
    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        levels=st.integers(2, 16),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_any_shape(self, h, w, levels, interlace, seed):
        from borsa_spark.functions.gif import decode_gif, encode_gif

        rng = np.random.default_rng(seed)
        # quantized palette keeps unique colors <= levels^... well under 256
        px = (rng.integers(0, levels, size=(h, w, 3)) * (255 // levels)).astype(
            np.uint8
        )
        assert np.array_equal(decode_gif(encode_gif(px, interlace=interlace)), px)

    @SET
    @given(
        n=st.integers(1, 3000),
        alphabet=st.integers(2, 255),
        mcs=st.integers(2, 8),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_lzw_roundtrip(self, n, alphabet, mcs, seed):
        from borsa_spark.functions.gif import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(seed)
        s = bytes(rng.integers(0, min(alphabet, 1 << mcs), n, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(s, mcs), mcs, n) == s

    @SET
    @given(
        sw=st.integers(3, 10),
        sh=st.integers(3, 10),
        n_frames=st.integers(1, 5),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_animation_model_equivalence(self, sw, sh, n_frames, seed):
        """decode_gif_frames vs an INDEPENDENT pixel-loop compositor:
        random sub-rect frames, random disposal 0-3, random transparency
        masks — the codec (palette, LZW, GCE wire format) and the
        compositing rules must agree with the naive model exactly."""
        from borsa_spark.functions.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        rng = np.random.default_rng(seed)
        bg = tuple(int(v) for v in rng.integers(0, 256, 3))
        frames = []
        for _ in range(n_frames):
            fw = int(rng.integers(1, sw + 1))
            fh = int(rng.integers(1, sh + 1))
            left = int(rng.integers(0, sw - fw + 1))
            top = int(rng.integers(0, sh - fh + 1))
            # few quantized levels keeps the global palette small
            px = (rng.integers(0, 4, (fh, fw, 3)) * 80).astype(np.uint8)
            mask = rng.random((fh, fw)) < 0.7 if rng.random() < 0.5 else None
            frames.append({
                "px": px, "left": left, "top": top,
                "disposal": int(rng.integers(0, 4)), "mask": mask,
            })
        data = encode_gif_animation(frames, screen=(sw, sh), background=bg)
        got = decode_gif_frames(data)

        # naive model: per-pixel loops, no numpy vector tricks
        canvas = np.empty((sh, sw, 3), np.uint8)
        canvas[:, :] = bg
        want = []
        for f in frames:
            fh, fw = f["px"].shape[:2]
            saved = canvas.copy()
            for y in range(fh):
                for x in range(fw):
                    if f["mask"] is None or f["mask"][y, x]:
                        canvas[f["top"] + y, f["left"] + x] = f["px"][y, x]
            want.append(canvas.copy())
            if f["disposal"] == 2:
                for y in range(fh):
                    for x in range(fw):
                        canvas[f["top"] + y, f["left"] + x] = bg
            elif f["disposal"] == 3:
                canvas = saved
        assert len(got) == len(want)
        for g, m in zip(got, want):
            assert np.array_equal(g, m)
