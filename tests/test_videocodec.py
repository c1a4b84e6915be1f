"""Dependency-free video codecs: Y4M / uncompressed-AVI round trips,
container walking, malformed payloads, and the video_features /
video_frames / synth_videos Spark surface."""

import numpy as np
import pytest

from cuspatial_spark.videocodec import (
    VideoDecodeError,
    decode_avi,
    decode_video,
    decode_y4m,
    encode_avi,
    encode_y4m,
    video_stats,
)


def _clip(n, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, c), dtype=np.uint8)


class TestY4M:
    def test_mono_round_trip(self):
        f = _clip(3, 6, 8, 1, 1)
        fps, out = decode_y4m(encode_y4m(f, 25, 1))
        assert fps == 25.0
        np.testing.assert_array_equal(out, f)

    def test_c444_round_trip(self):
        f = _clip(4, 5, 7, 3, 2)
        fps, out = decode_y4m(encode_y4m(f, 30000, 1001))
        assert fps == pytest.approx(30000 / 1001)
        np.testing.assert_array_equal(out, f)

    def test_c420_nearest_upsample(self):
        h, w = 4, 6
        rng = np.random.default_rng(3)
        y = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
        cb = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
        cr = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
        buf = [b"YUV4MPEG2 W6 H4 F10:1 Ip A1:1 C420jpeg\n"]
        for t in range(2):
            buf += [b"FRAME\n", y[t].tobytes(), cb[t].tobytes(), cr[t].tobytes()]
        fps, out = decode_y4m(b"".join(buf))
        assert fps == 10.0 and out.shape == (2, 4, 6, 3)
        np.testing.assert_array_equal(out[:, :, :, 0], y)
        np.testing.assert_array_equal(
            out[1, :, :, 2], cr[1].repeat(2, axis=0).repeat(2, axis=1)
        )

    def test_frame_param_on_frame_line_ok(self):
        f = _clip(2, 3, 4, 1, 4)
        payload = encode_y4m(f, 25, 1).replace(b"FRAME\n", b"FRAME Xsome\n")
        _, out = decode_y4m(payload)
        np.testing.assert_array_equal(out, f)

    @pytest.mark.parametrize(
        "payload",
        [
            b"",
            b"JUNK",
            b"YUV4MPEG2 W0 H4 F25:1\nFRAME\n",
            b"YUV4MPEG2 W4 H4 F25:1 C999\nFRAME\n",
            b"YUV4MPEG2 W5 H4 F25:1 C420\nFRAME\n",  # odd width for 420
            b"YUV4MPEG2 W4 H4 F25:1 Cmono\n",  # no frames
            b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME\n\x00\x01",  # truncated
        ],
    )
    def test_malformed_raises(self, payload):
        with pytest.raises(VideoDecodeError):
            decode_y4m(payload)


class TestAVI:
    def test_rgb24_round_trip(self):
        f = _clip(3, 5, 7, 3, 5)  # stride padding exercised (7*3=21 -> 24)
        fps, out = decode_avi(encode_avi(f, 20.0))
        assert fps == 20.0
        np.testing.assert_array_equal(out, f)

    def test_gray8_round_trip(self):
        f = _clip(2, 4, 6, 1, 6)
        fps, out = decode_avi(encode_avi(f, 50.0))
        assert fps == 50.0
        np.testing.assert_array_equal(out, f)

    def test_width_multiple_of_4_no_padding(self):
        f = _clip(2, 3, 4, 3, 7)
        np.testing.assert_array_equal(decode_avi(encode_avi(f, 25.0))[1], f)

    def test_malformed_raises(self):
        good = encode_avi(_clip(2, 3, 4, 3, 8), 25.0)
        for payload in [b"", b"RIFF\x00\x00\x00\x00AVI ", good[:60], good[:120]]:
            with pytest.raises(VideoDecodeError):
                decode_avi(payload)

    def test_compressed_rejected(self):
        good = bytearray(encode_avi(_clip(1, 2, 2, 3, 9), 25.0))
        # biCompression lives 16 bytes into the BITMAPINFOHEADER
        strf = bytes(good).find(b"strf") + 8
        good[strf + 16 : strf + 20] = (1).to_bytes(4, "little")
        with pytest.raises(VideoDecodeError, match="biCompression"):
            decode_avi(bytes(good))


class TestSniffAndStats:
    def test_decode_video_dispatch(self):
        f = _clip(2, 3, 4, 1, 10)
        assert decode_video(encode_y4m(f))[0] == "y4m"
        assert decode_video(encode_avi(f))[0] == "avi"
        with pytest.raises(VideoDecodeError):
            decode_video(b"\x89PNG\r\n\x1a\n")

    def test_video_stats_exact(self):
        f = _clip(3, 4, 5, 3, 11)
        s = video_stats(f)
        flat = f.astype(np.int64)
        assert s["px_mean"] == flat.sum() / flat.size
        assert s["px_min"] == flat.min() and s["px_max"] == flat.max()
        d = np.abs(flat[1:] - flat[:-1])
        assert s["motion_mean"] == d.sum() / d.size

    def test_single_frame_motion_zero(self):
        assert video_stats(_clip(1, 2, 2, 1, 12))["motion_mean"] == 0.0


class TestSparkSurface:
    def test_video_features_matches_law(self, spark):
        from cuspatial_spark.multimodal import synth_videos, video_features

        ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
        out = (
            video_features(synth_videos(ids), id_cols=("doc_id",))
            .orderBy("doc_id")
            .toPandas()
        )
        assert len(out) == 24
        for _, r in out.iterrows():
            g = int(r.doc_id)
            n, w, h = 2 + g % 5, 4 + g % 9, 3 + g % 7
            c = 1 if g % 3 == 0 else 3
            assert (r.n_frames, r.width, r.height, r.channels) == (n, w, h, c)
            assert r.video_format == ("avi" if g % 3 == 2 else "y4m")
            assert r.fps == float((10, 20, 25, 50)[g % 4])
            i = np.arange(n * h * w * c, dtype=np.int64)
            v = (g * 29 + i * 13) % 247
            assert r.px_mean == v.sum() / v.size
            hwc = h * w * c
            d = np.abs(v[hwc:] - v[:-hwc])
            assert r.motion_mean == d.sum() / d.size

    def test_video_frames_fanout(self, spark):
        from cuspatial_spark.multimodal import synth_videos, video_frames

        ids = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        out = video_frames(synth_videos(ids), id_cols=("doc_id",)).toPandas()
        expected = sum(2 + g % 5 for g in range(10))
        assert len(out) == expected
        # stride sampling halves (ceil) the fan-out
        out2 = video_frames(
            synth_videos(ids), id_cols=("doc_id",), stride=2
        ).toPandas()
        assert len(out2) == sum(-(-(2 + g % 5) // 2) for g in range(10))
