"""Multimodal plumbing tests: schema, determinism, batch shape."""

from __future__ import annotations

import pytest

from borsa_spark import schemas
from borsa_spark.functions.multimodal import (
    audio_features,
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_features,
    media_batch_conf,
    resize_images,
    sample_video_frames,
)


class TestRealCodecs:
    """Pure-Python BMP/PPM decode — golden bytes, padding, header comments,
    round-trips with the fixture encoders, and error paths."""

    def test_bmp_golden_2x2_with_padding(self):
        # 2x2 24-bit BMP: width*3 = 6 bytes/row, stride pads to 8. Pixels
        # bottom-up, BGR: row0(bottom) = red,green; row1(top) = blue,white.
        import struct

        red, green, blue, white = (
            b"\x00\x00\xff", b"\x00\xff\x00", b"\xff\x00\x00", b"\xff\xff\xff",
        )
        pad = b"\x00\x00"
        pixels = red + green + pad + blue + white + pad
        hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0
        )
        w, h, ch, luma = decode_bmp(hdr + dib + pixels)
        assert (w, h, ch) == (2, 2, 3)
        # channel sum = 255*(1+1+1+3) = 1530 over 12 samples
        assert luma == pytest.approx(1530 / 12 / 255.0)

    def test_ppm_golden_with_comment(self):
        data = b"P6\n# a comment\n3 1\n255\n" + bytes([10, 20, 30] * 3)
        w, h, ch, luma = decode_ppm(data)
        assert (w, h, ch) == (3, 1, 3)
        assert luma == pytest.approx(20 / 255.0)

    @pytest.mark.parametrize("width,height,rgb", [
        (1, 1, (0, 0, 0)),
        (5, 3, (255, 0, 128)),   # 5*3=15 bytes/row -> stride 16 (padding)
        (4, 7, (17, 34, 51)),    # 12 bytes/row -> no padding
        (13, 2, (200, 100, 50)),
    ])
    def test_encode_decode_round_trip(self, width, height, rgb):
        expect_luma = sum(rgb) / 3.0 / 255.0
        for enc, dec in ((encode_bmp, decode_bmp), (encode_ppm, decode_ppm)):
            w, h, ch, luma = dec(enc(width, height, rgb))
            assert (w, h, ch) == (width, height, 3)
            assert luma == pytest.approx(expect_luma, abs=1e-12)

    def test_error_paths(self):
        with pytest.raises(ValueError):
            decode_bmp(b"BMxx")  # truncated
        with pytest.raises(ValueError):
            decode_bmp(b"NOPE" + b"\x00" * 60)
        with pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")  # grayscale PGM, not P6
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n2 2\n255\n\x00\x01")  # short pixel data


class TestPngCodec:
    """Stdlib-only PNG decode: golden bytes (hand-filtered scanlines,
    expected pixels derived independently from the RFC 2083 recurrences),
    every filter type round-tripped, cross-codec invariance, error paths."""

    # 3x2 RGB, row 0 filtered with Sub(1), row 1 with Paeth(4). The
    # filtered bytes were hand-authored; the expected pixels below were
    # computed with a from-the-spec decoder written independently of
    # borsa_spark (see commit message), so this is a true golden.
    GOLDEN_PNG = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000030000000208020000001216"
        "f14d0000001c49444154789c63e4129163fdc57e8291938599e3578a11939c"
        "860d0029d40439f671055f0000000049454e44ae426082"
    )
    GOLDEN_PIXELS = [
        [[10, 20, 30], [15, 14, 37], [215, 15, 46]],
        [[13, 28, 24], [115, 70, 32], [245, 110, 97]],
    ]

    def test_golden_pixels_byte_for_byte(self):
        import numpy as np

        from borsa_spark.functions.multimodal import _png_pixels, decode_png

        px = _png_pixels(self.GOLDEN_PNG)
        assert px.tolist() == self.GOLDEN_PIXELS
        w, h, ch, luma = decode_png(self.GOLDEN_PNG)
        assert (w, h, ch) == (3, 2, 3)
        flat = np.array(self.GOLDEN_PIXELS, dtype=float)
        assert luma == pytest.approx(flat.mean() / 255.0, abs=1e-12)

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_every_filter_type_round_trips(self, filter_type):
        import numpy as np

        from borsa_spark.functions.multimodal import (
            _png_pixels,
            encode_png_pixels,
        )

        rng = np.random.default_rng(41 + filter_type)
        px = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
        back = _png_pixels(encode_png_pixels(px, filter_type=filter_type))
        assert np.array_equal(back, px)

    def test_solid_color_parity_with_bmp_and_ppm(self):
        from borsa_spark.functions.multimodal import decode_png, encode_png

        for rgb in [(0, 0, 0), (255, 255, 255), (10, 200, 30)]:
            w, h, ch, luma = decode_png(encode_png(9, 5, rgb))
            bw, bh, bch, bluma = decode_bmp(encode_bmp(9, 5, rgb))
            assert (w, h, ch) == (bw, bh, bch) == (9, 5, 3)
            assert luma == pytest.approx(bluma, abs=1e-12)

    def test_phash_cross_codec_invariance(self):
        # The same pixel grid through the PNG and PPM pixel paths must
        # produce the SAME 64-bit pHash — the natural oracle for "the
        # PNG decode returns real pixels, not plausible ones".
        import numpy as np

        from borsa_spark.functions.multimodal import (
            _gray_png,
            _gray_ppm,
            encode_png_pixels,
            phash64,
        )

        gy, gx = np.mgrid[0:24, 0:32]
        grad = np.stack(
            [(gy * 7) % 256, (gx * 11) % 256, ((gx + gy) * 5) % 256], axis=2
        ).astype(np.uint8)
        png = encode_png_pixels(grad, filter_type=4)
        ppm = b"P6\n32 24\n255\n" + grad.tobytes()
        assert phash64(_gray_png(png)) == phash64(_gray_ppm(ppm))

    def test_error_paths(self):
        from borsa_spark.functions.multimodal import _png_pixels

        golden = self.GOLDEN_PNG
        with pytest.raises(ValueError):  # bad signature
            _png_pixels(b"\x89PNG-fake-bytes-1")
        with pytest.raises(ValueError):  # truncated mid-chunk
            _png_pixels(golden[:30])
        corrupt = bytearray(golden)
        corrupt[45] ^= 0xFF  # flip an IDAT byte -> CRC mismatch
        with pytest.raises(ValueError):
            _png_pixels(bytes(corrupt))
        # 16-bit depth rejected loudly (never a silently wrong grid)
        import struct as _s
        import zlib as _z

        ihdr = _s.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        chunk = (
            _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + _s.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        iend = _s.pack(">I", 0) + b"IEND" + _s.pack(
            ">I", _z.crc32(b"IEND") & 0xFFFFFFFF
        )
        with pytest.raises(ValueError):
            _png_pixels(b"\x89PNG\r\n\x1a\n" + chunk + iend)

    def test_image_features_dispatches_png(self, spark):
        from borsa_spark.functions.multimodal import encode_png

        rows = [
            (20, "image", "image/png", encode_png(6, 4, (30, 60, 90)),
             None, None, None, None, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = {r.asset_id: r for r in image_features(assets).collect()}
        assert (out[20].width, out[20].height, out[20].decoder) == (6, 4, "png")
        assert out[20].mean_luma == pytest.approx(60 / 255.0)

    def test_image_phash_corrupt_png_degrades(self, spark):
        from borsa_spark.functions.multimodal import image_phash

        corrupt = bytearray(self.GOLDEN_PNG)
        corrupt[45] ^= 0xFF
        rows = [
            (30, "image", "image/png", bytes(corrupt),
             None, None, None, None, None),
            (31, "image", "image/png", self.GOLDEN_PNG,
             None, None, None, None, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = {r.asset_id: r for r in image_phash(assets).collect()}
        assert out[30].decoder == "corrupt-fallback"
        assert out[31].decoder == "png"


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

    def test_image_features_real_codecs_in_pipeline(self, spark):
        rows = [
            (10, "image", "image/bmp", encode_bmp(5, 3, (255, 0, 128)),
             None, None, None, None, None),
            (11, "image", "image/x-portable-pixmap",
             encode_ppm(4, 2, (30, 60, 90)), None, None, None, None, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = {r.asset_id: r for r in image_features(assets).collect()}
        assert (out[10].width, out[10].height, out[10].decoder) == (5, 3, "bmp")
        assert out[10].mean_luma == pytest.approx((255 + 0 + 128) / 3 / 255.0)
        assert (out[11].width, out[11].height, out[11].decoder) == (4, 2, "ppm")
        assert out[11].mean_luma == pytest.approx(60 / 255.0)

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

    def test_autotune_probes_and_sets_conf(self, spark):
        from borsa_spark.functions.multimodal import (
            ARROW_BATCH_KEY,
            autotune_arrow_batch,
        )

        prev = spark.conf.get(ARROW_BATCH_KEY, None)
        try:
            # ~1 MB payloads -> 256MB/1MB = 256 rows per batch
            big = spark.createDataFrame(
                [(i, bytes([i % 251]) * (1 << 20)) for i in range(4)],
                "asset_id long, payload binary",
            )
            assert autotune_arrow_batch(big) == 256
            assert spark.conf.get(ARROW_BATCH_KEY) == "256"
            # tiny payloads RATCHET DOWN only: execution is lazy and the
            # conf is session-wide, so a later small-payload pipeline must
            # never raise the setting back up under an earlier big-payload
            # pipeline that hasn't executed yet
            small = spark.createDataFrame(
                [(1, b"x")], "asset_id long, payload binary"
            )
            assert autotune_arrow_batch(small) == 256
            # a fresh session value above default still caps at 10k
            spark.conf.set(ARROW_BATCH_KEY, "50000")
            assert autotune_arrow_batch(small) == 10_000
        finally:
            if prev is not None:
                spark.conf.set(ARROW_BATCH_KEY, prev)
            else:
                spark.conf.unset(ARROW_BATCH_KEY)

    def test_image_features_autotunes_by_default(self, spark, assets):
        from borsa_spark.functions.multimodal import ARROW_BATCH_KEY

        prev = spark.conf.get(ARROW_BATCH_KEY, None)
        try:
            spark.conf.unset(ARROW_BATCH_KEY)
            image_features(assets)  # plan construction runs the probe
            assert spark.conf.get(ARROW_BATCH_KEY) is not None
            spark.conf.unset(ARROW_BATCH_KEY)
            image_features(assets, auto_batch=False)
            assert spark.conf.get(ARROW_BATCH_KEY, None) is None
        finally:
            if prev is not None:
                spark.conf.set(ARROW_BATCH_KEY, prev)


class TestPerceptualHash:
    """pHash image near-dup: real PPM pixels -> DCT hash -> band-paired
    hamming. Textured fixtures (noise-perturbed copies vs an independent
    image) pin the robustness contract end-to-end through Spark."""

    @staticmethod
    def _ppm(gray):
        import numpy as np

        h, w = gray.shape
        rgb = np.repeat((gray * 255).astype("uint8")[:, :, None], 3, axis=2)
        return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()

    @staticmethod
    def _textured(seed, h=48, w=64, n=12):
        import numpy as np

        rs = np.random.RandomState(seed)
        y, x = np.mgrid[0:h, 0:w]
        g = sum(
            rs.rand()
            * np.sin(2 * np.pi * (rs.rand() * 3 * x / w + rs.rand() * 3 * y / h + rs.rand()))
            for _ in range(n)
        )
        return (g - g.min()) / (g.max() - g.min())

    def test_noise_robust_and_discriminative(self, spark):
        import numpy as np

        from borsa_spark.functions.multimodal import image_phash, phash_near_pairs

        base = self._textured(7)
        rs = np.random.RandomState(1)
        near = np.clip(base + rs.normal(0, 0.02, base.shape), 0, 1)
        other = self._textured(8)
        assets = spark.createDataFrame(
            [
                (1, bytearray(self._ppm(base))),
                (2, bytearray(self._ppm(near))),
                (3, bytearray(self._ppm(other))),
                (4, bytearray(b"not an image")),
            ],
            "asset_id long, payload binary",
        )
        ph = image_phash(assets, auto_batch=False)
        rows = {r["asset_id"]: r for r in ph.collect()}
        assert rows[1]["decoder"] == "ppm"
        assert rows[4]["decoder"] == "fake-deterministic"

        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        assert ham(rows[1]["phash"], rows[2]["phash"]) <= 6
        assert ham(rows[1]["phash"], rows[3]["phash"]) > 10

        pairs = {
            (r["id_a"], r["id_b"])
            for r in phash_near_pairs(ph, max_hamming=6,
                                      profile="exhaustive").collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_identical_payloads_hash_equal(self, spark):
        from borsa_spark.functions.multimodal import image_phash

        img = bytearray(self._ppm(self._textured(3)))
        assets = spark.createDataFrame(
            [(1, img), (2, bytearray(bytes(img)))],
            "asset_id long, payload binary",
        )
        got = {r["asset_id"]: r["phash"] for r in image_phash(assets, auto_batch=False).collect()}
        assert got[1] == got[2]

    def test_band_guarantee_covers_all_64_bits(self, spark):
        # two hashes differing by 4 bits spread across the four LOW bytes
        # (the case a 32-bit band reuse would miss) and by bits in the
        # HIGH bytes only — both must pair under the 8-band pigeonhole
        from borsa_spark.functions.multimodal import phash_near_pairs

        low_spread = 0x01010101            # one bit in each low byte
        high_only = 0x0303 << 48           # 4 bits, high bytes only
        ph = spark.createDataFrame(
            [(1, 12345), (2, 12345 ^ low_spread),
             (3, 54321 << 32), (4, (54321 << 32) ^ high_only)],
            "asset_id long, phash long",
        )
        pairs = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in phash_near_pairs(ph, max_hamming=6,
                                      profile="exhaustive").collect()
        }
        assert (1, 2, 4) in pairs
        assert (3, 4, 4) in pairs

    def test_corrupt_magic_payloads_degrade_not_crash(self, spark):
        # magic-matching but truncated/unsupported payloads must take the
        # fallback path with an audit tag, never abort the Spark job
        from borsa_spark.functions.multimodal import image_phash

        assets = spark.createDataFrame(
            [
                (1, bytearray(b"BM" + b"\x00" * 10)),        # truncated BMP
                (2, bytearray(b"P6\n2 2\n65535\n" + b"\x00" * 24)),  # 16-bit PPM
                (3, bytearray(self._ppm(self._textured(5)))),  # healthy
            ],
            "asset_id long, payload binary",
        )
        rows = {r["asset_id"]: r for r in image_phash(assets, auto_batch=False).collect()}
        assert rows[1]["decoder"] == "corrupt-fallback"
        assert rows[2]["decoder"] == "corrupt-fallback"
        assert rows[3]["decoder"] == "ppm"

    def test_autotune_treats_nonpositive_conf_as_uncapped(self, spark):
        from borsa_spark.functions.multimodal import (
            ARROW_BATCH_KEY,
            autotune_arrow_batch,
        )

        prev = spark.conf.get(ARROW_BATCH_KEY, None)
        try:
            spark.conf.set(ARROW_BATCH_KEY, "0")  # Spark's unlimited sentinel
            big = spark.createDataFrame(
                [(1, bytes(1 << 20))], "asset_id long, payload binary"
            )
            assert autotune_arrow_batch(big) == 256  # guard still engages
        finally:
            if prev is not None:
                spark.conf.set(ARROW_BATCH_KEY, prev)
            else:
                spark.conf.unset(ARROW_BATCH_KEY)


class TestWavCodec:
    """Stdlib-only RIFF/WAVE PCM decode: hand-built golden bytes with
    spec-derived expected values, known-signal RMS, round-trips, error
    paths, and the audio_features dispatch."""

    @staticmethod
    def _wav_8bit_golden():
        import struct

        # 4 unsigned 8-bit samples: 128, 255, 0, 128 -> 0.0, 127/128,
        # -1.0, 0.0 per the (x-128)/128 rule
        pcm = bytes([128, 255, 0, 128])
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + pcm
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_golden_8bit_rms_by_hand(self):
        import math

        from borsa_spark.functions.multimodal import decode_wav

        sr, ch, fr, dur, rms = decode_wav(self._wav_8bit_golden())
        assert (sr, ch, fr, dur) == (8000, 1, 4, 0)
        want = math.sqrt((0.0 + (127 / 128) ** 2 + 1.0 + 0.0) / 4)
        assert rms == pytest.approx(want, abs=1e-12)

    def test_known_signal_rms(self):
        import numpy as np

        from borsa_spark.functions.multimodal import decode_wav, encode_wav

        t = np.arange(16000)
        sine = 0.5 * np.sin(2 * np.pi * 440 * t / 16000)
        sr, ch, fr, dur, rms = decode_wav(encode_wav(sine, 16000))
        assert (sr, ch, fr, dur) == (16000, 1, 16000, 1000)
        # amplitude a sine -> rms a/sqrt(2); 16-bit quantization ~1e-4
        assert rms == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)
        # stereo: per-channel mirrored signal, same rms, 2 channels
        st = np.stack([sine, -sine], axis=1)
        sr, ch, fr, dur, rms2 = decode_wav(encode_wav(st, 16000))
        assert (ch, fr, dur) == (2, 16000, 1000)
        assert rms2 == pytest.approx(rms, abs=1e-6)

    def test_error_paths(self):
        import struct as _s

        from borsa_spark.functions.multimodal import decode_wav

        with pytest.raises(ValueError):
            decode_wav(b"RIFF-fake")  # RIFF magic but not WAVE
        with pytest.raises(ValueError):
            decode_wav(self._wav_8bit_golden()[:30])  # truncated chunk
        # float format (3) rejected, never silent noise
        fmt = _s.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        body = (
            b"WAVE" + b"fmt " + _s.pack("<I", 16) + fmt
            + b"data" + _s.pack("<I", 4) + b"\x00" * 4
        )
        with pytest.raises(ValueError):
            decode_wav(b"RIFF" + _s.pack("<I", len(body)) + body)

    def test_audio_features_dispatches_wav(self, spark):
        import numpy as np

        from borsa_spark.functions.multimodal import encode_wav

        t = np.arange(8000)
        wav = encode_wav(0.25 * np.sin(2 * np.pi * 100 * t / 8000), 8000)
        rows = [
            # metadata columns LIE (2500 ms, 44100 Hz): the real decode
            # must override them from the bytes
            (40, "audio", "audio/wav", wav, None, None, 2500, 44100, None),
            (41, "audio", "audio/mpeg", b"ID3-fake-mp3", None, None,
             1000, 22050, None),
            (42, "audio", "audio/wav", wav[:20], None, None, 100, 8000,
             None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = {r.asset_id: r for r in audio_features(assets).collect()}
        assert out[40].decoder == "wav"
        assert (out[40].sample_rate, out[40].duration_ms) == (8000, 1000)
        assert out[40].rms == pytest.approx(0.25 / np.sqrt(2), abs=1e-3)
        assert out[40].n_windows == 1000 // 25
        # real mp3 bytes are NEVER summarized with fabricated features
        assert out[41].decoder == "unsupported-lossy"
        assert out[41].sample_rate is None and out[41].duration_ms is None
        assert out[42].decoder == "corrupt-fallback"

    def test_audio_lossy_formats_get_unsupported_marker(self, spark):
        """mp3 (ID3 tag or bare MPEG frame sync) and ogg payloads emit a
        NULL-feature marker row — sha256 stays real for dedup/provenance —
        instead of digest-derived fake numbers. The stub survives ONLY
        behind the opt-in fixture flag."""
        rows = [
            # ID3 magic but a nonsense synchsafe size -> headers do NOT
            # parse -> pure marker row
            (50, "audio", "audio/mpeg", b"ID3\x04\x00tag-then-frames",
             None, None, 1000, 44100, None),
            # a bare VALID MPEG1-L3 sync now yields honest header
            # metadata (see test_lossy_header_metadata); this row's ogg
            # magic with a truncated page stays a marker
            (52, "audio", "audio/ogg", b"OggS\x00vorbis-ish",
             None, None, 3000, 48000, None),
            (53, "audio", "application/octet-stream", b"not-any-audio",
             None, None, 4000, 16000, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = {r.asset_id: r for r in audio_features(assets).collect()}
        for k in (50, 52):
            assert out[k].decoder == "unsupported-lossy"
            assert out[k].sample_rate is None
            assert out[k].duration_ms is None
            assert out[k].rms is None
            assert out[k].n_windows is None
            assert len(out[k].sha256) == 64  # provenance digest stays real
        # unrecognized bytes (synthetic fixtures) keep the documented stub
        assert out[53].decoder == "fake-deterministic"
        # opt-in fixture flag restores deterministic features everywhere
        fake = {
            r.asset_id: r
            for r in audio_features(assets, fake_features=True).collect()
        }
        for k in (50, 52, 53):
            assert fake[k].decoder == "fake-deterministic"
            assert fake[k].rms is not None

    def test_lossy_header_metadata(self, spark):
        """mp3/ogg payloads whose CONTAINER HEADERS parse report the
        real metadata those headers carry (sample rate; CBR/granule
        duration estimate) — signal features stay NULL, since nothing
        was decoded."""
        from borsa_spark.functions.multimodal import (
            encode_mp3_header_stub,
            encode_ogg_header_stub,
        )

        rows = [
            # metadata columns LIE; header parse must override from bytes
            (60, "audio", "audio/mpeg", encode_mp3_header_stub(1596),
             None, None, 9, 8000, None),
            (61, "audio", "audio/ogg",
             encode_ogg_header_stub("vorbis", 22050, 44100),
             None, None, 9, 8000, None),
            (62, "audio", "audio/ogg",
             encode_ogg_header_stub("opus", 16000, 96000),
             None, None, 9, 8000, None),
            (63, "audio", "audio/mpeg", b"\xff\xfb\x90\x00" + b"\x00" * 60,
             None, None, 9, 8000, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = {r.asset_id: r for r in audio_features(assets).collect()}
        # mp3: ID3(10) + frame(4) + pad(1596) -> 1600 audio bytes at
        # 128 kbps -> 100 ms
        assert (out[60].decoder, out[60].sample_rate,
                out[60].duration_ms) == ("mp3-header", 44100, 100)
        # vorbis: granule is PCM samples at the id-header rate
        assert (out[61].decoder, out[61].sample_rate,
                out[61].duration_ms) == ("ogg-header", 22050, 2000)
        # opus: granule is 48 kHz units regardless of input rate
        assert (out[62].decoder, out[62].sample_rate,
                out[62].duration_ms) == ("ogg-header", 16000, 2000)
        # tagless bare sync: 64 bytes at 128 kbps -> 4 ms
        assert (out[63].decoder, out[63].sample_rate,
                out[63].duration_ms) == ("mp3-header", 44100, 4)
        for k in (60, 61, 62, 63):
            assert out[k].rms is None and out[k].n_windows is None
        # opt-in fixture flag bypasses even the header path
        fake = {
            r.asset_id: r
            for r in audio_features(assets, fake_features=True).collect()
        }
        for k in (60, 61, 62, 63):
            assert fake[k].decoder == "fake-deterministic"
            assert fake[k].rms is not None


class TestJpegCodec:
    """Pure-Python baseline JPEG (functions/jpeg.py): quantization-bounded
    round-trips across quality/subsampling/restart settings, exact flat
    color, pHash cross-codec invariance vs the lossless PNG path, and
    loud rejection of unsupported modes."""

    @staticmethod
    def _gradient(h=24, w=32):
        import numpy as np

        gy, gx = np.mgrid[0:h, 0:w]
        sm = 128 + 100 * np.sin(gy / 6.0) * np.cos(gx / 8.0)
        return np.stack(
            [sm, sm * 0.8 + 20, sm * 0.5 + 60], axis=2
        ).astype(np.uint8)

    @staticmethod
    def _textured(n=64):
        # multi-frequency 64x64 image: its DCT coefficients sit far from
        # the pHash median, so hash bits are stable under q90 loss (a
        # tiny smooth gradient has many knife-edge coefficients and is
        # NOT a fair robustness probe)
        import numpy as np

        gy, gx = np.mgrid[0:n, 0:n]
        sm = (128 + 90 * np.sin(gy / 5.0) * np.cos(gx / 7.0)
              + 30 * np.sin((gx + gy) / 3.0))
        return np.stack(
            [sm, sm * 0.7 + 30, 255 - sm], axis=2
        ).clip(0, 255).astype(np.uint8)

    def test_flat_color_round_trips_exactly(self):
        import numpy as np

        from borsa_spark.functions.jpeg import decode_jpeg, encode_jpeg

        img = np.full((16, 24, 3), [40, 180, 90], dtype=np.uint8)
        back = decode_jpeg(encode_jpeg(img, quality=90))
        assert back.shape == (16, 24, 3)
        assert int(np.abs(back.astype(int) - img.astype(int)).max()) == 0

    @pytest.mark.parametrize("kwargs,mean_bound,max_bound", [
        ({"quality": 95}, 1.5, 16),
        ({"quality": 90, "subsampling": "420"}, 3.0, 24),
        ({"quality": 90, "restart_interval": 2}, 2.0, 16),
        ({"quality": 85, "subsampling": "420", "restart_interval": 1},
         3.5, 24),
    ])
    def test_roundtrip_within_quant_error(self, kwargs, mean_bound,
                                          max_bound):
        import numpy as np

        from borsa_spark.functions.jpeg import decode_jpeg, encode_jpeg

        img = self._gradient()
        back = decode_jpeg(encode_jpeg(img, **kwargs))
        err = np.abs(back.astype(int) - img.astype(int))
        assert back.shape == img.shape
        assert err.mean() < mean_bound, err.mean()
        assert err.max() < max_bound, err.max()

    def test_odd_dimensions_and_grayscale(self):
        import numpy as np

        from borsa_spark.functions.jpeg import decode_jpeg, encode_jpeg

        odd = self._gradient()[:17, :19]
        back = decode_jpeg(
            encode_jpeg(odd, quality=85, subsampling="420")
        )
        assert back.shape == (17, 19, 3)
        g = self._gradient()[:, :, 0]
        back = decode_jpeg(encode_jpeg(g, quality=90))
        assert back.shape == (24, 32, 1)
        assert np.abs(
            back[:, :, 0].astype(int) - g.astype(int)
        ).mean() < 1.5

    def test_phash_cross_codec_vs_png(self):
        # JPEG is lossy, but pHash is DESIGNED to survive that: the same
        # pixels through the lossless PNG path and a q90 JPEG must land
        # within the near-dup pairing distance (<= 6 of 64 bits).
        from borsa_spark.functions.jpeg import decode_jpeg, encode_jpeg
        from borsa_spark.functions.multimodal import (
            _gray_png,
            encode_png_pixels,
            phash64,
        )

        img = self._textured()
        ph_png = phash64(_gray_png(encode_png_pixels(img)))
        import numpy as np

        jp = decode_jpeg(encode_jpeg(img, quality=90))
        ph_jpeg = phash64(jp.astype(np.float64).mean(axis=2) / 255.0)
        assert bin(ph_png ^ ph_jpeg).count("1") <= 6

    def test_unsupported_modes_reject(self):
        import struct as _s

        from borsa_spark.functions.jpeg import decode_jpeg, encode_jpeg

        with pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01not a jpeg")
        good = encode_jpeg(self._gradient(), quality=90)
        with pytest.raises(ValueError):
            decode_jpeg(good[:40])  # truncated in the tables
        # flip SOF0 -> SOF2 (progressive): loud reject, not garbage
        idx = good.find(b"\xff\xc0")
        assert idx > 0
        prog = good[:idx] + b"\xff\xc2" + good[idx + 2 :]
        with pytest.raises(ValueError, match="unsupported JPEG mode"):
            decode_jpeg(prog)
        # corrupt entropy data -> ValueError from the Huffman decoder
        bad = bytearray(good)
        sos = good.find(b"\xff\xda")
        for i in range(sos + 20, min(sos + 60, len(bad) - 2)):
            bad[i] ^= 0xA5
        try:
            decode_jpeg(bytes(bad))  # either decodes to junk pixels...
        except ValueError:
            pass  # ...or rejects; both are acceptable, crashing is not

    def test_image_features_and_phash_dispatch_jpeg(self, spark):
        import numpy as np

        from borsa_spark.functions.jpeg import encode_jpeg
        from borsa_spark.functions.multimodal import image_phash

        img = self._gradient()
        rows = [
            (50, "image", "image/jpeg", encode_jpeg(img, quality=90),
             None, None, None, None, None),
            (51, "image", "image/jpeg", b"\xff\xd8garbage" * 4,
             None, None, None, None, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        feats = {r.asset_id: r for r in image_features(assets).collect()}
        assert (feats[50].width, feats[50].height, feats[50].decoder) == (
            32, 24, "jpeg",
        )
        assert feats[51].decoder == "corrupt-fallback"
        want_luma = img.astype(float).mean() / 255.0
        assert abs(feats[50].mean_luma - want_luma) < 0.02
        ph = {r.asset_id: r for r in image_phash(assets).collect()}
        assert ph[50].decoder == "jpeg"
        assert ph[51].decoder == "corrupt-fallback"


class TestAviCodec:
    """Uncompressed-AVI decode (RIFF walker + DIB frame math): lossless
    round-trips, frame sampling, video near-dup via frame pHashes,
    error paths, and Spark dispatch."""

    @staticmethod
    def _frames(n=4, h=9, w=13, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)

    def test_lossless_round_trip(self):
        import numpy as np

        from borsa_spark.functions.multimodal import decode_avi, encode_avi

        frames = self._frames()
        back, fps = decode_avi(encode_avi(frames, fps=12))
        assert fps == 12
        assert np.array_equal(back, frames)

    def test_error_paths(self):
        from borsa_spark.functions.multimodal import decode_avi, encode_avi

        enc = encode_avi(self._frames())
        with pytest.raises(ValueError):
            decode_avi(enc[:100])  # truncated
        with pytest.raises(ValueError):
            decode_avi(b"RIFF\x00\x00\x00\x00WAVE")  # wrong RIFF kind

    def test_video_frame_features_sampling_and_dispatch(self, spark):
        from borsa_spark.functions.multimodal import (
            encode_avi,
            video_frame_features,
        )

        frames = self._frames(n=6)
        rows = [
            (60, "video", "video/avi", encode_avi(frames), None, None,
             None, None, None),
            (61, "video", "video/mp4", b"mp4-fake-bytes", None, None,
             3500, None, None),
            (62, "video", "video/avi", encode_avi(frames)[:80], None,
             None, None, None, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = video_frame_features(assets, every_n=2).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.asset_id, []).append(r)
        # every_n=2 over 6 frames -> frames 0, 2, 4
        got = sorted(r.frame_idx for r in by_id[60])
        assert got == [0, 2, 4]
        assert all(r.decoder == "avi" for r in by_id[60])
        assert all(
            (r.width, r.height) == (13, 9) for r in by_id[60]
        )
        assert by_id[61][0].decoder == "fake-deterministic"
        assert by_id[62][0].decoder == "corrupt-fallback"

    def test_video_near_dup_by_frame_phash(self, spark):
        # the pipeline claim: two AVIs sharing frames pair via the
        # existing pHash band join over their frame hashes
        import numpy as np

        import pyspark.sql.functions as F
        from borsa_spark.functions.multimodal import (
            encode_avi,
            phash_near_pairs,
            video_frame_features,
        )

        gy, gx = np.mgrid[0:24, 0:32]
        base = np.stack([
            (128 + 90 * np.sin(gy / 5.0) * np.cos(gx / (7.0 + k)))
            for k in range(3)
        ], axis=2).clip(0, 255).astype(np.uint8)
        clip_a = np.stack([np.roll(base, s, axis=0) for s in (0, 3, 6)])
        # clip B shares A's frames plus 2% noise (a re-encode analog)
        rng = np.random.default_rng(9)
        noise = rng.integers(-5, 6, clip_a.shape)
        clip_b = np.clip(clip_a.astype(int) + noise, 0, 255).astype(
            np.uint8
        )
        # clip C is unrelated
        clip_c = self._frames(n=3, h=24, w=32, seed=77)
        rows = [
            (70, "video", "video/avi", encode_avi(clip_a), None, None,
             None, None, None),
            (71, "video", "video/avi", encode_avi(clip_b), None, None,
             None, None, None),
            (72, "video", "video/avi", encode_avi(clip_c), None, None,
             None, None, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        frames = video_frame_features(assets)
        # frame-level ids: asset*10 + frame so the band join's id
        # tie-break never collides across assets
        ph = frames.select(
            (F.col("asset_id") * 10 + F.col("frame_idx")).alias(
                "asset_id"
            ),
            "phash",
        )
        pairs = phash_near_pairs(ph, max_hamming=6,
                                 profile="exhaustive").collect()
        cross = {
            (min(r.id_a // 10, r.id_b // 10), max(r.id_a // 10, r.id_b // 10))
            for r in pairs
            if r.id_a // 10 != r.id_b // 10
        }
        assert (70, 71) in cross        # noisy re-encode pairs
        assert (70, 72) not in cross    # unrelated does not
        assert (71, 72) not in cross


class TestFlacCodec:
    """FLAC (functions/flac.py): bit-exact round-trips across subframe
    types and channel counts, CRC detection, LPC rejection, dispatch."""

    def test_roundtrip_sine_exact_and_compressed(self):
        import numpy as np

        from borsa_spark.functions.flac import decode_flac, encode_flac

        t = np.arange(10_000)
        sine = (0.4 * np.sin(2 * np.pi * 220 * t / 16000) * 32767)
        sine = sine.astype(np.int64)
        enc = encode_flac(sine, 16000, blocksize=4096)
        dec, sr, bps = decode_flac(enc)
        assert sr == 16000 and bps == 16
        assert np.array_equal(dec[:, 0], sine)
        # a smooth signal must actually compress (fixed predictors +
        # rice at work, not verbatim passthrough)
        assert len(enc) < 0.7 * len(sine) * 2

    def test_roundtrip_constant_ramp_noise(self):
        import numpy as np

        from borsa_spark.functions.flac import decode_flac, encode_flac

        left = np.full(5000, 1234, dtype=np.int64)      # CONSTANT
        right = (np.arange(5000) % 2000 - 1000)         # FIXED order 1+
        st = np.stack([left, right], axis=1)
        dec, sr, _ = decode_flac(encode_flac(st, 8000, blocksize=1000))
        assert np.array_equal(dec, st)
        rng = np.random.default_rng(3)
        noise = rng.integers(-32768, 32768, 3000)       # high rice param
        dec, _, _ = decode_flac(encode_flac(noise, 44100, blocksize=777))
        assert np.array_equal(dec[:, 0], noise)

    def test_crc_and_truncation_detected(self):
        import numpy as np

        from borsa_spark.functions.flac import decode_flac, encode_flac

        enc = encode_flac(np.arange(2000) % 500, 8000, blocksize=512)
        with pytest.raises(ValueError):
            decode_flac(enc[:50])
        bad = bytearray(enc)
        bad[60] ^= 0xFF
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))
        with pytest.raises(ValueError):
            decode_flac(b"fLaX" + enc[4:])

    def test_audio_features_dispatches_flac(self, spark):
        import numpy as np

        from borsa_spark.functions.flac import encode_flac
        from borsa_spark.functions.multimodal import encode_wav

        # identical samples through WAV and FLAC: identical rms, both
        # real decodes — the compression-transparency check
        t = np.arange(8000)
        f = 0.25 * np.sin(2 * np.pi * 100 * t / 8000)
        ints = (np.clip(f, -1, 1 - 1 / 32768) * 32768).astype(np.int64)
        rows = [
            (80, "audio", "audio/wav", encode_wav(f, 8000), None, None,
             None, None, None),
            (81, "audio", "audio/flac", encode_flac(ints, 8000), None,
             None, None, None, None),
            (82, "audio", "audio/flac", b"fLaC-corrupt", None, None,
             500, 8000, None),
        ]
        assets = spark.createDataFrame(rows, schema=schemas.MEDIA_ASSETS)
        out = {r.asset_id: r for r in audio_features(assets).collect()}
        assert out[80].decoder == "wav"
        assert out[81].decoder == "flac"
        assert out[81].rms == pytest.approx(out[80].rms, abs=1e-12)
        assert (out[81].sample_rate, out[81].duration_ms) == (8000, 1000)
        assert out[82].decoder == "corrupt-fallback"


class TestPngColorTypes:
    """Round-6 follow-up: the decoder's gray / gray+alpha / RGBA branches
    are drivable now that the fixture encoder maps 1-4 channels to PNG
    color types 0/4/2/6 — every (color type, filter) combination
    round-trips bit-exactly."""

    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_roundtrip_every_color_type_and_filter(
        self, channels, filter_type
    ):
        import numpy as np

        from borsa_spark.functions.multimodal import (
            _png_pixels,
            encode_png_pixels,
        )

        rng = np.random.default_rng(channels * 10 + filter_type)
        px = rng.integers(
            0, 256, size=(9, 11, channels), dtype=np.uint8
        )
        back = _png_pixels(encode_png_pixels(px, filter_type=filter_type))
        assert np.array_equal(back, px)

    def test_alpha_excluded_from_luma(self):
        import numpy as np

        from borsa_spark.functions.multimodal import (
            decode_png,
            encode_png_pixels,
        )

        # RGB + varying alpha: luma must match the alpha-free image
        rng = np.random.default_rng(8)
        rgb = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
        alpha = rng.integers(0, 256, size=(7, 9, 1), dtype=np.uint8)
        rgba = np.concatenate([rgb, alpha], axis=2)
        _, _, ch3, luma3 = decode_png(encode_png_pixels(rgb))
        _, _, ch4, luma4 = decode_png(encode_png_pixels(rgba))
        assert (ch3, ch4) == (3, 4)
        assert luma4 == pytest.approx(luma3, abs=1e-12)


class TestGifCodec:
    """functions/gif.py: pure-Python GIF87a/89a with real LZW both ways."""

    def test_hand_built_literal_stream_golden(self):
        # "Uncompressed GIF" built byte-by-byte from the spec, NOT via
        # encode_gif: a clear code before every literal keeps the
        # dictionary empty, so this pins LSB-first bit packing, clear
        # semantics, sub-block framing, and palette lookup independently
        # of the encoder's arithmetic.
        import struct

        import numpy as np

        from borsa_spark.functions.gif import decode_gif

        m, w = 2, 3
        clear, end = 4, 5
        pixels = [1, 0, 3, 2, 1, 1]
        bits = []

        def put(code, width):
            for i in range(width):
                bits.append((code >> i) & 1)

        put(clear, w)
        for p in pixels:
            put(p, w)
            put(clear, w)
        put(end, w)
        stream = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for j, bit in enumerate(bits[i : i + 8]):
                v |= bit << j
            stream.append(v)
        palette = bytes(
            [0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255]
        )  # black, R, G, B
        gif = (
            b"GIF89a"
            + struct.pack("<HHBBB", 3, 2, 0x81, 0, 0)
            + palette
            + struct.pack("<BHHHHB", 0x2C, 0, 0, 3, 2, 0)
            + bytes([m, len(stream)])
            + bytes(stream)
            + b"\x00\x3b"
        )
        px = decode_gif(gif)
        assert px.shape == (2, 3, 3)
        # pixels [1,0,3 / 2,1,1] -> [R, black, B / G, R, R]
        assert np.array_equal(
            px[0], np.array([[255, 0, 0], [0, 0, 0], [0, 0, 255]], np.uint8)
        )
        assert np.array_equal(
            px[1], np.array([[0, 255, 0], [255, 0, 0], [255, 0, 0]], np.uint8)
        )

    def test_roundtrip_shapes_and_interlace(self):
        import numpy as np

        from borsa_spark.functions.gif import decode_gif, encode_gif

        rng = np.random.default_rng(11)
        cases = [
            np.zeros((1, 1, 3), np.uint8),
            np.full((5, 7, 3), 200, np.uint8),
            (rng.integers(0, 4, (33, 9, 3)) * 60).astype(np.uint8),
            (rng.integers(0, 4, (1, 50, 3)) * 60).astype(np.uint8),
        ]
        for px in cases:
            for interlace in (False, True):
                out = decode_gif(encode_gif(px, interlace=interlace))
                assert np.array_equal(out, px)

    def test_dictionary_full_roundtrip_and_compression(self):
        # 256-color noise forces the dictionary toward 4096 and the
        # clear-on-full path; low-entropy input must genuinely compress
        import numpy as np

        from borsa_spark.functions.gif import decode_gif, encode_gif

        rng = np.random.default_rng(11)
        colors = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        noise = colors[rng.integers(0, 256, (80, 90)).astype(np.uint8)]
        assert np.array_equal(decode_gif(encode_gif(noise)), noise)
        flat = np.full((64, 64, 3), 9, np.uint8)
        enc = encode_gif(flat)
        assert len(enc) < 64 * 64 // 4  # real compression, no pass-through
        assert np.array_equal(decode_gif(enc), flat)

    def test_phash_cross_codec_invariance(self):
        # identical pixels through GIF and PPM must hash identically —
        # the cross-codec oracle every image decoder here satisfies
        import numpy as np

        from borsa_spark.functions.gif import encode_gif
        from borsa_spark.functions.multimodal import (
            _gray_gif,
            _gray_ppm,
            phash64,
        )

        rng = np.random.default_rng(11)
        px = (rng.integers(0, 4, (24, 31, 3)) * 80).astype(np.uint8)
        ppm = b"P6\n31 24\n255\n" + px.tobytes()
        assert phash64(_gray_gif(encode_gif(px))) == phash64(_gray_ppm(ppm))

    def test_error_paths(self):
        import numpy as np

        from borsa_spark.functions.gif import decode_gif, encode_gif

        with pytest.raises(ValueError):
            decode_gif(b"")
        with pytest.raises(ValueError):
            decode_gif(b"GIF90a" + b"\x00" * 20)
        good = encode_gif(np.full((4, 4, 3), 7, np.uint8))
        with pytest.raises(ValueError):
            decode_gif(good[:-6])  # truncated inside pixel data
        rng = np.random.default_rng(11)
        with pytest.raises(ValueError):
            encode_gif(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))

    def test_feature_and_phash_dispatch(self, spark):
        import numpy as np

        from borsa_spark.functions.gif import encode_gif
        from borsa_spark.functions.multimodal import image_phash

        px = np.full((6, 8, 3), 120, np.uint8)
        good = encode_gif(px)
        corrupt = good[: len(good) // 2]
        assets = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(corrupt))],
            "asset_id long, payload binary",
        )
        feats = {r.asset_id: r for r in image_features(assets).collect()}
        assert feats[1].decoder == "gif"
        assert (feats[1].width, feats[1].height) == (8, 6)
        assert abs(feats[1].mean_luma - 120 / 255) < 1e-9
        assert feats[2].decoder == "corrupt-fallback"
        ph = {r.asset_id: r for r in image_phash(assets).collect()}
        assert ph[1].decoder == "gif"
        assert ph[2].decoder == "corrupt-fallback"


class TestGifAnimation:
    """Round-7 stretch: animation compositing (decode_gif_frames) — the
    GCE disposal methods and transparency against a hand-computed
    compositing oracle, and animated GIFs flowing through
    video_frame_features as a real multi-frame video format."""

    @staticmethod
    def _animation_and_oracle():
        import numpy as np

        from borsa_spark.functions.gif import encode_gif_animation

        f0 = np.zeros((4, 6, 3), np.uint8)
        f0[:, :3] = (255, 0, 0)
        f0[:, 3:] = (0, 0, 255)
        f1 = np.full((2, 2, 3), (0, 255, 0), np.uint8)
        m1 = np.array([[True, False], [False, True]])
        f2 = np.full((2, 3, 3), (255, 255, 0), np.uint8)
        f3 = np.full((4, 6, 3), (128, 128, 128), np.uint8)
        data = encode_gif_animation(
            [
                {"px": f0, "disposal": 1},            # leave as drawn
                {"px": f1, "left": 2, "top": 1,
                 "mask": m1, "disposal": 3},          # restore-to-previous
                {"px": f2, "left": 3, "top": 2,
                 "disposal": 2},                      # restore-to-background
                {"px": f3},
            ],
            background=(10, 20, 30),
        )
        # hand compositing: what a viewer shows after each frame
        c0 = f0.copy()
        c1 = c0.copy()
        for y in range(2):
            for x in range(2):
                if m1[y, x]:
                    c1[1 + y, 2 + x] = f1[y, x]
        c2 = c0.copy()          # disposal 3 restored c1's frame
        c2[2:4, 3:6] = f2
        c3 = f3                 # disposal 2 cleared the rect, then full draw
        return data, [c0, c1, c2, c3]

    def test_disposal_and_transparency_golden(self):
        import numpy as np

        from borsa_spark.functions.gif import decode_gif, decode_gif_frames

        data, want = self._animation_and_oracle()
        frames = decode_gif_frames(data)
        assert len(frames) == 4
        for got, exp in zip(frames, want):
            assert np.array_equal(got, exp)
        # the still-image path still returns the raw first frame
        assert np.array_equal(decode_gif(data), want[0])
        # max_frames bounds hostile inputs
        assert len(decode_gif_frames(data, max_frames=2)) == 2

    def test_frame_rect_outside_screen_rejected(self):
        import numpy as np

        from borsa_spark.functions.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        data = encode_gif_animation(
            [
                {"px": np.zeros((2, 2, 3), np.uint8)},
                {"px": np.full((2, 2, 3), 9, np.uint8), "left": 1, "top": 1},
            ],
            screen=(3, 3),
        )
        # second frame rect [1:3, 1:3] fits a 3x3 screen: fine
        assert len(decode_gif_frames(data)) == 2
        # corrupt the second descriptor's left to 200 -> loud reject
        bad = bytearray(data)
        idx = bad.rindex(b"\x2c")
        bad[idx + 1 : idx + 3] = (200).to_bytes(2, "little")
        with pytest.raises(ValueError):
            decode_gif_frames(bytes(bad))

    def test_video_frame_features_animated_gif(self, spark):
        import numpy as np

        from borsa_spark.functions.multimodal import video_frame_features

        data, want = self._animation_and_oracle()
        assets = spark.createDataFrame(
            [(70, bytearray(data)), (71, bytearray(data[: len(data) // 2]))],
            "asset_id long, payload binary",
        )
        out = video_frame_features(assets, every_n=2).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.asset_id, []).append(r)
        got = sorted(r.frame_idx for r in by_id[70])
        assert got == [0, 2]  # every_n=2 over 4 composited frames
        assert all(r.decoder == "gif" for r in by_id[70])
        assert all((r.width, r.height) == (6, 4) for r in by_id[70])
        lumas = {r.frame_idx: r.frame_luma for r in by_id[70]}
        for i in (0, 2):
            exp = want[i].astype(np.float64).mean() / 255.0
            assert abs(lumas[i] - exp) < 1e-9
        assert by_id[71][0].decoder == "corrupt-fallback"


class TestRealThumbnails:
    """resize_images round 6: real block-mean thumbs for decodable
    payloads, hash-fake only for undecodable ones."""

    def test_flat_image_exact_thumb(self, spark):
        import numpy as np

        from borsa_spark.functions.multimodal import encode_bmp

        assets = spark.createDataFrame(
            [(1, bytearray(encode_bmp(10, 6, (120, 120, 120))))],
            "asset_id long, payload binary",
        )
        row = resize_images(assets, 4, 3).collect()[0]
        assert row.decoder == "bmp"
        assert len(row.thumb) == 12
        assert set(bytes(row.thumb)) == {120}

    def test_checkerboard_block_means(self, spark):
        import numpy as np

        from borsa_spark.functions.gif import encode_gif

        # 4x4 checkerboard of 0/255 -> every 2x2 block means 127.5 -> 128
        px = np.zeros((4, 4, 3), np.uint8)
        px[::2, 1::2] = 255
        px[1::2, ::2] = 255
        assets = spark.createDataFrame(
            [(1, bytearray(encode_gif(px)))],
            "asset_id long, payload binary",
        )
        row = resize_images(assets, 2, 2).collect()[0]
        assert row.decoder == "gif"
        assert list(bytes(row.thumb)) == [128, 128, 128, 128]

    def test_cross_codec_thumb_equality(self, spark):
        import numpy as np

        from borsa_spark.functions.gif import encode_gif

        rng = np.random.default_rng(5)
        px = (rng.integers(0, 4, (12, 17, 3)) * 80).astype(np.uint8)
        ppm = b"P6\n17 12\n255\n" + px.tobytes()
        assets = spark.createDataFrame(
            [(1, bytearray(encode_gif(px))), (2, bytearray(ppm))],
            "asset_id long, payload binary",
        )
        rows = {r.asset_id: r for r in resize_images(assets, 5, 5).collect()}
        assert rows[1].decoder == "gif" and rows[2].decoder == "ppm"
        assert bytes(rows[1].thumb) == bytes(rows[2].thumb)

    def test_undecodable_keeps_fake_path(self, spark):
        assets = spark.createDataFrame(
            [(1, bytearray(b"mp3-not-an-image")),
             (2, bytearray(b"BM" + b"\x00" * 8))],
            "asset_id long, payload binary",
        )
        rows = {r.asset_id: r for r in resize_images(assets, 8, 8).collect()}
        assert rows[1].decoder == "fake-deterministic"
        assert rows[2].decoder == "corrupt-fallback"
        assert all(len(r.thumb) == 64 for r in rows.values())


class TestImageDhash:
    """Exact-arithmetic perceptual hash (multimodal.image_dhash): the
    SQL-replayable sibling of the DCT pHash."""

    def _assets(self, spark, rows):
        return spark.createDataFrame(
            rows, "asset_id long, payload binary"
        )

    def test_constant_image_hashes_to_zero(self, spark):
        # the round-8 float-noise pin: _block_mean's integral image
        # carries ~1-ulp noise; without 8-bit requantization a CONSTANT
        # image emitted spurious bits through the strict >
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        px = np.full((8, 9, 1), 32, dtype=np.uint8)
        out = mm.image_dhash(
            self._assets(
                spark, [(1, mm.encode_png_pixels(px, filter_type=4))]
            )
        ).collect()[0]
        assert list(out.bands) == [0] * 8 and out.decoder == "png"

    def test_perturbed_copy_is_near(self, spark):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(8, 9, 1)).astype(np.uint8)
        px2 = px.copy()
        px2[0, 0, 0] = (int(px2[0, 0, 0]) + 7) % 256
        dh = mm.image_dhash(self._assets(spark, [
            (1, mm.encode_png_pixels(px)),
            (2, mm.encode_png_pixels(px2)),
        ]))
        pairs = mm.dhash_near_pairs(dh).collect()  # crawl-profile default
        assert len(pairs) == 1
        assert (pairs[0].id_a, pairs[0].id_b) == (1, 2)
        assert pairs[0].hamming <= 1

    def test_corrupt_payload_degrades(self, spark):
        from borsa_spark.functions import multimodal as mm

        out = mm.image_dhash(
            self._assets(spark, [(1, b"\x89PNG\r\n\x1a\ntruncated")])
        ).collect()[0]
        assert out.decoder == "corrupt-fallback"
        assert len(out.bands) == 8

    def test_no_magic_payload_is_fake_deterministic(self, spark):
        # the module-wide tag contract: unknown formats are
        # 'fake-deterministic', NOT 'corrupt-fallback' (round-8 review:
        # this copy of the dispatch had dropped the distinction)
        from borsa_spark.functions import multimodal as mm

        out = mm.image_dhash(
            self._assets(spark, [(1, b"<html>not an image</html>")])
        ).collect()[0]
        assert out.decoder == "fake-deterministic"

    def test_max_hamming_beyond_pigeonhole_refused(self, spark):
        import pytest

        from borsa_spark.functions import multimodal as mm

        dh = mm.image_dhash(
            self._assets(spark, [(1, b"x")])
        )
        with pytest.raises(ValueError, match="max_hamming"):
            mm.dhash_near_pairs(dh, max_hamming=8)

    def test_ppm_and_png_same_pixels_same_hash(self, spark):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        rng = np.random.default_rng(11)
        gray = rng.integers(0, 256, size=(8, 9)).astype(np.uint8)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        png = mm.encode_png_pixels(gray[:, :, None])
        # cross-format pin via PPM raster (P6 carries the same rgb
        # grid; encode_bmp is solid-color only, so the BMP branch is
        # covered by its own decode tests, not cross-format here)
        header = f"P6\n9 8\n255\n".encode()
        ppm = header + rgb.tobytes()
        dh = {r.asset_id: (list(r.bands), r.decoder)
              for r in mm.image_dhash(self._assets(spark, [
                  (1, png), (2, ppm)])).collect()}
        assert dh[1][1] == "png" and dh[2][1] == "ppm"
        assert dh[1][0] == dh[2][0]

class TestBandHotBucketGuard:
    """The crawl-scale degenerate case: constant-color images all hash
    to the SAME bands (dHash rows are 0 by construction — pinned above
    by test_constant_image_hashes_to_zero), so one band bucket holds the
    whole flat cohort and the candidate self-join goes O(n²) exactly on
    production inputs. `max_bucket_size` must bound emission, account
    for what it skipped, and NOT cost the planted pair among normal
    images."""

    N_FLAT = 40

    def _fixture(self, spark):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        rows = []
        flat = np.full((8, 9, 1), 77, dtype=np.uint8)
        flat_png = mm.encode_png_pixels(flat, filter_type=4)
        for i in range(self.N_FLAT):
            rows.append((i, flat_png))
        rng = np.random.default_rng(23)
        px = rng.integers(0, 256, size=(8, 9, 1)).astype(np.uint8)
        px2 = px.copy()
        px2[0, 0, 0] = (int(px2[0, 0, 0]) + 9) % 256
        rows.append((1000, mm.encode_png_pixels(px)))
        rows.append((1001, mm.encode_png_pixels(px2)))
        return spark.createDataFrame(
            rows, "asset_id long, payload binary"
        )

    def test_unguarded_flat_cohort_is_quadratic(self, spark):
        from borsa_spark.functions import multimodal as mm

        dh = mm.image_dhash(self._fixture(spark))
        n = mm.dhash_near_pairs(dh, max_hamming=6,
                                profile="exhaustive").count()
        # C(40,2) flat pairs + 1 planted — the blowup the guard exists for
        assert n == self.N_FLAT * (self.N_FLAT - 1) // 2 + 1

    def test_guard_bounds_emission_keeps_planted_pair(self, spark):
        from borsa_spark.functions import multimodal as mm

        dh = mm.image_dhash(self._fixture(spark))
        pairs = mm.dhash_near_pairs(
            dh, max_hamming=6, max_bucket_size=10, profile="exhaustive"
        ).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1000, 1001)]

    def test_oversized_accounting_names_the_flat_bucket(self, spark):
        from borsa_spark.functions import multimodal as mm

        dh = mm.image_dhash(self._fixture(spark))
        over = mm.band_oversized_buckets(
            mm.dhash_band_keys(dh), max_bucket_size=10
        ).collect()
        # all 8 bands of the flat cohort (key 0) are oversized
        assert len(over) == 8
        assert all(r.band_key == 0 and r.n_assets == self.N_FLAT
                   for r in over)
        assert sorted(r.band for r in over) == list(range(8))

    def test_phash_guard_same_contract(self, spark):
        from borsa_spark.functions import multimodal as mm

        ph = mm.image_phash(self._fixture(spark))
        pairs = mm.phash_near_pairs(
            ph, max_hamming=6, max_bucket_size=10, profile="exhaustive"
        ).collect()
        # identical flat images share every phash band -> all excluded;
        # the planted near-identical pair survives the cap
        assert (1000, 1001) in [(p.id_a, p.id_b) for p in pairs]
        assert all(p.id_a >= 1000 for p in pairs)
        over = mm.band_oversized_buckets(
            mm.phash_band_keys(ph), max_bucket_size=10
        ).collect()
        assert len(over) == 8
        assert all(r.n_assets == self.N_FLAT for r in over)

    def test_wide_bands_keep_planted_pair_tighter_pigeonhole(self, spark):
        import pytest

        from borsa_spark.functions import multimodal as mm

        dh = mm.image_dhash(self._fixture(spark))
        # 16-bit bands: 4 bands recall-guarantee hamming <= 3; the
        # planted one-pixel bump flips <= 1 bit, so it must survive
        pairs = mm.dhash_near_pairs(
            dh, max_hamming=3, max_bucket_size=10, rows_per_band=2
        ).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1000, 1001)]
        # pigeonhole bound moves with the band count
        with pytest.raises(ValueError, match="max_hamming <= 3"):
            mm.dhash_near_pairs(dh, max_hamming=4, rows_per_band=2)
        with pytest.raises(ValueError, match="divide"):
            mm.dhash_near_pairs(dh, max_hamming=1, rows_per_band=3)

    def test_wide_band_keys_compose_bytes(self, spark):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        rng = np.random.default_rng(31)
        px = rng.integers(0, 256, size=(8, 9, 1)).astype(np.uint8)
        dh = mm.image_dhash(spark.createDataFrame(
            [(1, mm.encode_png_pixels(px))],
            "asset_id long, payload binary",
        ))
        narrow = {r.band: r.band_key
                  for r in mm.dhash_band_keys(dh, 1).collect()}
        wide = {r.band: r.band_key
                for r in mm.dhash_band_keys(dh, 2).collect()}
        assert len(wide) == 4
        for i in range(4):
            assert wide[i] == narrow[2 * i] + 256 * narrow[2 * i + 1]


class TestAudioDhash:
    """Envelope dHash (multimodal.audio_dhash): image_dhash's contract
    over waveforms — exact integer block sums, shared band machinery."""

    def _assets(self, spark, rows):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in rows],
            "asset_id long, payload binary",
        )

    def _wave(self, amps, q=25):
        import numpy as np

        sign = np.where(np.arange(len(amps) * q) % 2 == 0, 1.0, -1.0)
        return sign * (np.repeat(np.asarray(amps, dtype=np.int64), q)
                       / 256.0)

    def test_constant_tone_hashes_to_zero(self, spark):
        from borsa_spark.functions import multimodal as mm

        wav = mm.encode_wav(self._wave([77] * 72), 8000)
        out = mm.audio_dhash(self._assets(spark, [(1, wav)])).collect()[0]
        assert list(out.bands) == [0] * 8 and out.decoder == "wav"

    def test_perturbed_copy_is_near(self, spark):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        amps = (np.random.default_rng(3).integers(0, 256, 72)
                .astype(np.int64))
        amps2 = amps.copy()
        amps2[0] = (int(amps2[0]) + 7) % 256
        dh = mm.audio_dhash(self._assets(spark, [
            (1, mm.encode_wav(self._wave(amps), 8000)),
            (2, mm.encode_wav(self._wave(amps2), 8000)),
        ]))
        pairs = mm.dhash_near_pairs(dh, max_hamming=3,
                                    rows_per_band=2).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
        assert pairs[0].hamming <= 1

    def test_stereo_hashes_first_channel(self, spark):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        amps = (np.random.default_rng(5).integers(0, 256, 72)
                .astype(np.int64))
        mono = self._wave(amps)
        # identical channel 0; channel 1 is a constant tone — the hash
        # must read the interleave correctly and ignore channel 1
        stereo = np.stack([mono, self._wave([50] * 72)], axis=1)
        dh = {r.asset_id: list(r.bands)
              for r in mm.audio_dhash(self._assets(spark, [
                  (1, mm.encode_wav(mono, 8000)),
                  (2, mm.encode_wav(stereo, 8000)),
              ])).collect()}
        assert dh[1] == dh[2]

    def test_short_and_corrupt_payloads_degrade(self, spark):
        from borsa_spark.functions import multimodal as mm

        short = mm.encode_wav(self._wave([10] * 71, q=1), 8000)  # 71 < 72
        rows = {r.asset_id: r.decoder
                for r in mm.audio_dhash(self._assets(spark, [
                    (1, short),
                    (2, b"RIFF1234WAVEtruncated"),
                    (3, b"not audio at all"),
                ])).collect()}
        assert rows[1] == "corrupt-fallback"   # valid WAV, too short
        assert rows[2] == "corrupt-fallback"
        assert rows[3] == "fake-deterministic"


class TestPhashWideBands:
    """pHash side of the wide-band density lever (borrows the flat+
    planted image fixture builder — not a subclass, which would
    re-collect the guard tests)."""

    N_FLAT = TestBandHotBucketGuard.N_FLAT
    _fixture = TestBandHotBucketGuard._fixture

    def test_phash_wide_bands_compose_and_bound(self, spark):
        import numpy as np
        import pytest

        from borsa_spark.functions import multimodal as mm

        ph = mm.image_phash(self._fixture(spark))
        pairs = mm.phash_near_pairs(
            ph, max_hamming=3, max_bucket_size=10, bytes_per_band=2
        ).collect()
        assert (1000, 1001) in [(p.id_a, p.id_b) for p in pairs]
        # key composition: wide key i == byte key 2i + 256 * byte key 2i+1
        narrow = {(r.id, r.band): r.band_key
                  for r in mm.phash_band_keys(ph, 1).collect()}
        wide = {(r.id, r.band): r.band_key
                for r in mm.phash_band_keys(ph, 2).collect()}
        ids = {i for i, _ in narrow}
        for i in ids:
            for w in range(4):
                assert wide[(i, w)] == (
                    narrow[(i, 2 * w)] + 256 * narrow[(i, 2 * w + 1)]
                )
        with pytest.raises(ValueError, match="max_hamming <= 3"):
            mm.phash_near_pairs(ph, max_hamming=4, bytes_per_band=2)
        with pytest.raises(ValueError, match="divide"):
            mm.phash_band_keys(ph, 3)
