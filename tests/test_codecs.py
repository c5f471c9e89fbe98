"""Real media codecs: PNG/BMP/WAV/RWV roundtrips + real decode stages.

The codecs are spec re-derivations (W3C PNG, BITMAPINFOHEADER, RIFF
PCM) in pure numpy + stdlib zlib — reference parity target is GDAL's
frmts/png + frmts/bmp + RasterIO band contract.
"""

import numpy as np
import pyarrow as pa
import pytest

from lib_gdal_ray.codecs import decode_media, sniff
from lib_gdal_ray.codecs.jpeg import decode_jpeg, encode_jpeg
from lib_gdal_ray.codecs.bmp import decode_bmp, encode_bmp
from lib_gdal_ray.codecs.container import decode_frames, encode_frames
from lib_gdal_ray.codecs.png import decode_png, encode_png
from lib_gdal_ray.codecs.wav import decode_wav, encode_wav


class TestPng:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "adaptive"])
    def test_roundtrip_all_filters(self, channels, filter_type):
        rng = np.random.default_rng(channels * 10 + hash(str(filter_type)) % 97)
        a = rng.integers(0, 256, (11, 23, channels), dtype=np.uint8)
        if channels == 1:
            a = a[:, :, 0]
        out = decode_png(encode_png(a, filter_type=filter_type))
        np.testing.assert_array_equal(out, a)

    def test_gradient_and_flat(self):
        y, x = np.mgrid[0:17, 0:31]
        grad = ((x + 3 * y) % 256).astype(np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(grad, "adaptive")), grad)
        flat = np.full((5, 5), 200, np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(flat)), flat)

    def test_crc_is_checked(self):
        buf = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
        buf[40] ^= 0xFF  # corrupt inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(buf))

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            decode_png(b"GIF89a" + b"\x00" * 20)

    def test_single_pixel_and_single_row(self):
        one = np.array([[137]], dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(one, 4)), one)
        row = np.arange(256, dtype=np.uint8)[None, :]
        np.testing.assert_array_equal(decode_png(encode_png(row, 1)), row)


class TestBmp:
    def test_roundtrip_gray_with_odd_width(self):
        rng = np.random.default_rng(1)
        for w in (5, 6, 7, 8):  # exercise all 4-byte paddings
            a = rng.integers(0, 256, (9, w), dtype=np.uint8)
            np.testing.assert_array_equal(decode_bmp(encode_bmp(a)), a)

    def test_roundtrip_rgb(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(a)), a)


class TestWav:
    def test_roundtrip_int16_mono_stereo(self):
        rng = np.random.default_rng(3)
        mono = rng.integers(-32768, 32768, 777).astype(np.int16)
        d, rate = decode_wav(encode_wav(mono, 22050))
        assert rate == 22050
        np.testing.assert_array_equal(d, mono)
        stereo = rng.integers(-32768, 32768, (400, 2)).astype(np.int16)
        d2, _ = decode_wav(encode_wav(stereo))
        np.testing.assert_array_equal(d2, stereo)

    def test_roundtrip_uint8(self):
        a = np.arange(256, dtype=np.uint8)
        d, _ = decode_wav(encode_wav(a))
        np.testing.assert_array_equal(d, a)

    def test_odd_length_data_chunk_is_word_aligned(self):
        a = np.array([1, 2, 3], dtype=np.uint8)  # 3-byte data chunk
        d, _ = decode_wav(encode_wav(a))
        np.testing.assert_array_equal(d, a)


class TestContainerAndSniff:
    def test_frames_roundtrip(self):
        rng = np.random.default_rng(4)
        frames = [rng.integers(0, 256, (8, 8), dtype=np.uint8) for _ in range(5)]
        out = decode_frames(encode_frames(frames))
        assert len(out) == 5
        for a, b in zip(frames, out):
            np.testing.assert_array_equal(a, b)

    def test_sniff_dispatch(self):
        g = np.zeros((4, 4), np.uint8)
        assert sniff(encode_png(g)) == "png"
        assert sniff(encode_bmp(g)) == "bmp"
        assert sniff(encode_wav(np.zeros(4, np.int16))) == "wav"
        assert sniff(encode_frames([g])) == "rwv"
        assert sniff(b"nonsense") == "unknown"
        kind, arr, meta = decode_media(encode_bmp(g))
        assert kind == "image" and meta["width"] == 4


class TestRealStages:
    def test_decode_stats_match_closed_form(self, ray_session):
        from lib_gdal_ray.sources.synth import interleaved_docs
        from lib_gdal_ray.stages.media import (media_decode_stats,
                                               synth_audio, synth_image,
                                               synth_video_frames)

        out = media_decode_stats(interleaved_docs(40)).to_pandas()
        assert len(out) > 0
        for _, r in out.iterrows():
            d = int(r["doc_id"].split("-")[1])
            s = int(r["span_idx"])
            if r["kind"] == "image":
                vals = synth_image(d, s).astype(np.int64)
            elif r["kind"] == "audio":
                vals = synth_audio(d, s).astype(np.int64)
            else:
                vals = np.stack(synth_video_frames(d, s)).astype(np.int64)
            assert r["n_values"] == vals.size
            assert r["val_sum"] == vals.sum()
            assert r["val_min"] == vals.min()
            assert r["val_max"] == vals.max()

    def test_resize_nearest_and_bilinear_kernels(self):
        from lib_gdal_ray.stages.media import resize_bilinear, resize_nearest

        y, x = np.mgrid[0:8, 0:8]
        img = ((x + y) % 256).astype(np.uint8)
        # identity resize
        np.testing.assert_array_equal(resize_nearest(img, 8, 8), img)
        np.testing.assert_array_equal(resize_bilinear(img, 8, 8), img)
        # 2x downscale nearest picks pixel centers: src = floor((t+.5)*2)
        down = resize_nearest(img, 4, 4)
        np.testing.assert_array_equal(down, img[1::2, 1::2])
        # bilinear on a linear ramp stays linear (interior, integer grid)
        ramp = (np.arange(16, dtype=np.uint8) * 4)[None, :].repeat(4, axis=0)
        up = resize_bilinear(ramp, 32, 4).astype(np.int32)
        diffs = np.diff(up[0, 2:-2])
        assert diffs.min() >= 1 and diffs.max() <= 3  # ~2/step on a 4/step ramp

    def test_frame_sample_real(self, ray_session):
        import ray.data

        from lib_gdal_ray.codecs.png import decode_png as dec
        from lib_gdal_ray.stages.media import FrameSampleStage, synth_video_frames

        frames = synth_video_frames(7, 1)
        t = pa.table({"media_ref": pa.array(["s3://media/video/007/7_1.bin"]),
                      "payload": pa.array([encode_frames(frames)], type=pa.binary())})
        out = (ray.data.from_arrow(t)
               .map_batches(FrameSampleStage(every_n=2, real=True),
                            batch_format="pyarrow").to_pandas())
        assert list(out["frame_idx"]) == list(range(0, len(frames), 2))
        for _, r in out.iterrows():
            np.testing.assert_array_equal(dec(r["frame"]), frames[r["frame_idx"]])
            assert r["frame_sum"] == frames[r["frame_idx"]].astype(np.int64).sum()


class TestAdam7:
    @pytest.mark.parametrize("shape", [(13, 17), (8, 8), (1, 1), (7, 3),
                                       (33, 47, 3), (9, 9, 4), (16, 1)])
    @pytest.mark.parametrize("filter_type", [0, 2, 4, "adaptive"])
    def test_interlaced_roundtrip(self, shape, filter_type):
        rng = np.random.default_rng(hash(shape) % 1000)
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(a, filter_type=filter_type, interlace=True))
        np.testing.assert_array_equal(out, a)

    def test_interlaced_differs_then_matches(self):
        # interlaced file is a different byte stream but same pixels
        a = np.arange(64, dtype=np.uint8).reshape(8, 8)
        plain = encode_png(a)
        inter = encode_png(a, interlace=True)
        assert plain != inter
        np.testing.assert_array_equal(decode_png(inter), decode_png(plain))


class TestJpeg:
    """Baseline JPEG (ITU-T T.81) — lossy, so parity is bounded-error,
    unlike the bit-exact codecs."""

    def _smooth(self, h=32, w=48):
        y, x = np.mgrid[0:h, 0:w]
        return (127 + 100 * np.sin(x / 8.0) * np.cos(y / 9.0)).astype(np.uint8)

    def test_flat_is_exact(self):
        a = np.full((16, 16), 128, np.uint8)
        out = decode_jpeg(encode_jpeg(a, 90))
        np.testing.assert_array_equal(out, a)

    def test_smooth_gray_bounded_error(self):
        img = self._smooth()
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 4 and err.mean() < 1.0

    @pytest.mark.parametrize("subsample", ["444", "420"])
    def test_rgb_roundtrip(self, subsample):
        img = self._smooth()
        rgb = np.stack([img, np.flipud(img), np.fliplr(img)], axis=-1)
        out = decode_jpeg(encode_jpeg(rgb, 90, subsample=subsample))
        assert out.shape == rgb.shape
        err = np.abs(out.astype(int) - rgb.astype(int))
        assert err.mean() < (1.5 if subsample == "444" else 4.0)

    def test_odd_dimensions(self):
        img = self._smooth(17, 23)
        assert decode_jpeg(encode_jpeg(img, 95)).shape == (17, 23)
        rgb = np.stack([img] * 3, axis=-1)
        assert decode_jpeg(encode_jpeg(rgb, 90, subsample="420")).shape \
            == (17, 23, 3)

    def test_restart_markers(self):
        img = self._smooth()
        out = decode_jpeg(encode_jpeg(img, 90, restart_interval=2))
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 4

    def test_quality_monotonic_size(self):
        img = self._smooth()
        sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_sniff_and_dispatch(self):
        img = self._smooth(8, 8)
        buf = encode_jpeg(img, 90)
        assert sniff(buf) == "jpeg"
        kind, arr, meta = decode_media(buf)
        assert kind == "image" and meta["width"] == 8

    def test_rejects_progressive_and_garbage(self):
        buf = bytearray(encode_jpeg(self._smooth(8, 8)))
        i = buf.find(bytes([0xFF, 0xC0]))
        buf[i + 1] = 0xC2  # pretend SOF2 progressive
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(bytes(buf))
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"garbage")


class TestDspFeatures:
    def test_audio_features_vs_reference(self, ray_session):
        from lib_gdal_ray.sources.synth import interleaved_docs
        from lib_gdal_ray.stages.media import media_dsp_features, synth_audio

        out = media_dsp_features(interleaved_docs(30), "audio").to_pandas()
        assert len(out) > 0
        for _, r in out.head(20).iterrows():
            d = int(r["doc_id"].split("-")[1])
            s = int(synth_audio(d, int(r["span_idx"]))[0] * 0 + r["span_idx"])
            v = synth_audio(d, s).astype(np.int64)
            assert r["energy"] == int((v * v).sum())
            sign = np.where(v >= 0, 1, -1)
            assert r["zero_crossings"] == int((sign[1:] != sign[:-1]).sum())
            mag = np.abs(np.fft.rfft(v.astype(np.float64)))
            want = (np.arange(len(mag)) * mag).sum() / mag.sum()
            np.testing.assert_allclose(r["spectral_centroid"], want, rtol=1e-12)

    def test_image_features_sobel_reference(self, ray_session):
        from lib_gdal_ray.sources.synth import interleaved_docs
        from lib_gdal_ray.stages.media import media_dsp_features, synth_image

        out = media_dsp_features(interleaved_docs(30), "image").to_pandas()
        assert len(out) > 0
        for _, r in out.head(10).iterrows():
            d = int(r["doc_id"].split("-")[1])
            v = synth_image(d, int(r["span_idx"])).astype(np.float64)
            gx = (v[:-2, 2:] + 2 * v[1:-1, 2:] + v[2:, 2:]
                  - v[:-2, :-2] - 2 * v[1:-1, :-2] - v[2:, :-2])
            gy = (v[2:, :-2] + 2 * v[2:, 1:-1] + v[2:, 2:]
                  - v[:-2, :-2] - 2 * v[:-2, 1:-1] - v[:-2, 2:])
            want = np.sqrt(gx * gx + gy * gy).mean()
            np.testing.assert_allclose(r["sobel_mean"], want, rtol=1e-12)

    def test_wrong_kind_rejected(self):
        from lib_gdal_ray.codecs.png import encode_png
        from lib_gdal_ray.stages.media import AudioFeatureStage

        t = pa.table({"payload": pa.array(
            [encode_png(np.zeros((4, 4), np.uint8))], type=pa.binary())})
        with pytest.raises(ValueError, match="image payload"):
            AudioFeatureStage()(t)


class TestPalettedPNG:
    """Color type 3 + sub-8-bit depths (frmts/png GetColorTable path),
    pinned against the reference's own fixtures."""

    REF = "/root/reference/autotest"

    def test_reference_fixture_checksums(self):
        from lib_gdal_ray.codecs.png import decode_png, decode_png_indexed
        from lib_gdal_ray.pipelines.rasterize import gdal_checksum

        buf = open(f"{self.REF}/gdrivers/data/png/test.png", "rb").read()
        idx, plte, trns = decode_png_indexed(buf)
        # GDAL pins the index band at 57921 (autotest/gdrivers/png.py:38)
        assert int(gdal_checksum(idx)) == 57921
        assert plte.shape == (16, 3) and trns is not None
        rgba = decode_png(buf)          # expanded RGBA (tRNS present)
        assert rgba.shape == (400, 400, 4)
        import numpy as np

        np.testing.assert_array_equal(rgba[:, :, :3],
                                      plte[idx])

    def test_palette_roundtrip(self):
        import numpy as np

        from lib_gdal_ray.codecs.png import (decode_png_indexed,
                                             encode_png_palette)

        rng = np.random.RandomState(0)
        idx = rng.randint(0, 12, size=(33, 17)).astype(np.uint8)
        pal = rng.randint(0, 256, size=(12, 3)).astype(np.uint8)
        trns = rng.randint(0, 256, size=5).astype(np.uint8)
        i2, p2, t2 = decode_png_indexed(encode_png_palette(idx, pal, trns))
        np.testing.assert_array_equal(i2, idx)
        np.testing.assert_array_equal(p2, pal)
        np.testing.assert_array_equal(t2, trns)

    def test_sub_byte_gray(self):
        # synthesize 1/2/4-bit grayscale PNGs and decode raw samples
        import struct
        import zlib

        import numpy as np

        from lib_gdal_ray.codecs.png import _SIG, _chunk, decode_png

        for depth in (1, 2, 4):
            w, h = 13, 5
            vals = (np.arange(w * h).reshape(h, w) % (1 << depth)).astype(
                np.uint8)
            # pack rows MSB-first
            rows = []
            for y in range(h):
                bits = np.zeros(w * depth, dtype=np.uint8)
                for i, v in enumerate(vals[y]):
                    for b in range(depth):
                        bits[i * depth + b] = (v >> (depth - 1 - b)) & 1
                rows.append(b"\x00" + np.packbits(bits).tobytes())
            ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
            png = b"".join([_SIG, _chunk(b"IHDR", ihdr),
                            _chunk(b"IDAT", zlib.compress(b"".join(rows))),
                            _chunk(b"IEND", b"")])
            np.testing.assert_array_equal(decode_png(png), vals)
