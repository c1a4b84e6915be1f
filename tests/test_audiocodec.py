"""Dependency-free WAV codec: round trips, chunk walking, malformed
containers, and the audio_features Spark surface."""

import struct

import numpy as np
import pytest

from cuspatial_spark.audiocodec import (
    AudioDecodeError,
    audio_stats,
    decode_wav,
    encode_wav,
)


def _sig(n, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-30000, 30000, size=(n, ch)).astype(np.int16)


class TestRoundTrip:
    def test_pcm16_mono(self):
        s = _sig(240, 1, 1)
        rate, out = decode_wav(encode_wav(s, 16000))
        assert rate == 16000
        assert out.shape == (240, 1)
        np.testing.assert_array_equal(out.ravel(), s.ravel())

    def test_pcm16_stereo_interleave(self):
        s = _sig(100, 2, 2)
        rate, out = decode_wav(encode_wav(s, 44100))
        assert out.shape == (100, 2)
        np.testing.assert_array_equal(out, s)

    def test_pcm8_centered(self):
        s = np.array([[-128], [-1], [0], [1], [127]], np.int16)
        _, out = decode_wav(encode_wav(s, 8000, bits=8))
        np.testing.assert_array_equal(out.ravel(), s.ravel())

    def test_odd_data_length_padding(self):
        # 3 frames of 8-bit mono = 3 bytes: data chunk needs a pad byte
        s = np.array([[1], [2], [3]], np.int16)
        payload = encode_wav(s, 8000, bits=8)
        assert len(payload) % 2 == 0
        _, out = decode_wav(payload)
        np.testing.assert_array_equal(out.ravel(), [1, 2, 3])


class TestChunkWalk:
    def test_junk_chunks_skipped(self):
        s = _sig(50, 1, 3)
        payload = encode_wav(
            s, 8000,
            extra_chunks=[(b"LIST", b"INFOsoftware"), (b"fact", b"\x32\x00\x00\x00")],
        )
        rate, out = decode_wav(payload)
        assert rate == 8000
        np.testing.assert_array_equal(out.ravel(), s.ravel())

    def test_odd_sized_junk_chunk_stays_aligned(self):
        s = _sig(10, 1, 4)
        payload = encode_wav(s, 8000, extra_chunks=[(b"LIST", b"junk!")])
        _, out = decode_wav(payload)
        np.testing.assert_array_equal(out.ravel(), s.ravel())


class TestFormats:
    def test_pcm24(self):
        vals = np.array([-(2**23), -1, 0, 1, 2**23 - 1], np.int64)
        raw = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw + b"\x00"
        )
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        _, out = decode_wav(payload)
        np.testing.assert_array_equal(out.ravel(), vals)

    def test_float32(self):
        vals = np.array([-1.0, -0.5, 0.0, 0.25, 1.0], np.float32)
        raw = vals.tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        _, out = decode_wav(payload)
        np.testing.assert_allclose(out.ravel(), vals.astype(np.float64))

    def test_extensible_header_resolves_subformat(self):
        s = _sig(20, 1, 5)
        raw = s.astype("<i2").tobytes()
        # 40-byte WAVE_FORMAT_EXTENSIBLE fmt chunk, subformat PCM
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 4) + struct.pack("<H", 1) + b"\x00" * 14
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        _, out = decode_wav(payload)
        np.testing.assert_array_equal(out.ravel(), s.ravel())


class TestMalformed:
    CASES = [
        b"",
        b"RIFF\x00\x00\x00\x00WAVE",                      # no chunks
        b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 8,          # not WAVE
        b"RIFF\xff\x00\x00\x00WAVEdata\xff\xff\xff\xff",    # truncated chunk
        b"RIFF\x14\x00\x00\x00WAVEfmt \x04\x00\x00\x00abcd",  # short fmt
    ]

    def test_all_raise_audiodecodeerror(self):
        for payload in self.CASES:
            with pytest.raises(AudioDecodeError):
                decode_wav(payload)

    def test_partial_trailing_frame_rejected(self):
        s = _sig(10, 2, 6)
        payload = bytearray(encode_wav(s, 8000))
        # shrink the declared data size by one byte -> not whole frames
        off = payload.rindex(b"data") + 4
        (size,) = struct.unpack_from("<I", payload, off)
        struct.pack_into("<I", payload, off, size - 1)
        with pytest.raises(AudioDecodeError):
            decode_wav(bytes(payload))

    def test_unsupported_format_code(self):
        fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)  # mp3-in-wav
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(AudioDecodeError):
            decode_wav(payload)


class TestStats:
    def test_closed_form(self):
        s = np.array([[3], [-3], [3], [-3]], np.int16)
        st = audio_stats(s)
        assert st["amp_mean"] == 0.0
        assert st["amp_min"] == -3 and st["amp_max"] == 3
        assert st["rms"] == 3.0
        assert st["zero_crossings"] == 3

    def test_stereo_lanes_independent(self):
        # L flips sign every frame, R stays positive
        s = np.array([[1, 5], [-1, 5], [1, 5]], np.int16)
        assert audio_stats(s)["zero_crossings"] == 2

    def test_zero_sample_not_a_crossing(self):
        s = np.array([[1], [0], [-1]], np.int16)
        assert audio_stats(s)["zero_crossings"] == 0


class TestSparkSurface:
    def test_audio_features_end_to_end(self, spark):
        from cuspatial_spark.multimodal import audio_features, synth_audio

        docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
        clips = synth_audio(docs, id_col="doc_id")
        out = audio_features(clips, id_cols=("doc_id",)).orderBy("doc_id").collect()
        assert len(out) == 30
        for r in out:
            g = r.doc_id
            assert r.n_frames == 40 + g % 97
            assert r.channels == 1 + g % 2
            assert r.sample_rate == 8000 * (1 + g % 3)
            assert r.duration_s == r.n_frames / r.sample_rate
            # closed-form spot check of the sample law
            i = np.arange(r.n_frames * r.channels, dtype=np.int64)
            flat = ((g * 37 + i * 11) % 65521) - 32760
            assert r.amp_min == flat.min() and r.amp_max == flat.max()
            assert r.amp_mean == flat.astype(np.float64).sum() / flat.size

    def test_single_mapinpandas_stage(self, spark):
        from cuspatial_spark.multimodal import audio_features, synth_audio

        docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
        plan = audio_features(
            synth_audio(docs, id_col="doc_id"), id_cols=("doc_id",)
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # map-only: no shuffle at any scale
