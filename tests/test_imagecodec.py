"""Real image codec (netpbm/BMP/PNG) + Spark multimodal decode path.

Reference parity anchor: cuspatial has no image codec — this covers the
builder-brief multimodal requirement (decode / feature-extract as
Arrow-batched mapInPandas).  The codec itself is dependency-free
(numpy + stdlib zlib), so decode(encode(px)) == px is exact.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cuspatial_spark.imagecodec import (
    ImageDecodeError,
    average_hash,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    encode_bmp,
    encode_png,
    encode_pnm,
)


def _px(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("c", [1, 3])
    def test_pnm(self, c):
        px = _px(7, 5, c)
        fmt, out = decode_pnm(encode_pnm(px))
        assert fmt == ("pgm" if c == 1 else "ppm")
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("c", [1, 3])
    def test_bmp(self, c):
        # Odd width exercises the 4-byte row padding.
        px = _px(6, 5, c, seed=1)
        fmt, out = decode_bmp(encode_bmp(px))
        assert fmt == "bmp"
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("c", [1, 3])
    def test_png(self, c):
        px = _px(9, 4, c, seed=2)
        fmt, out = decode_png(encode_png(px))
        assert fmt == "png"
        np.testing.assert_array_equal(out, px)

    def test_dispatch(self):
        px = _px(3, 3, 3, seed=3)
        for enc in (encode_pnm, encode_bmp, encode_png):
            _, out = decode_image(enc(px))
            np.testing.assert_array_equal(out, px)


class TestPnmHeader:
    def test_comments_and_whitespace(self):
        px = _px(2, 3, 1, seed=4)
        payload = b"P5 # c1\n# full comment line\n 3\t2 # c2\n255\n" + px.tobytes()
        fmt, out = decode_pnm(payload)
        assert fmt == "pgm"
        np.testing.assert_array_equal(out, px)

    def test_truncated_raster(self):
        with pytest.raises(ImageDecodeError, match="truncated"):
            decode_pnm(b"P5\n4 4\n255\n\x00\x01")

    def test_16bit_rejected(self):
        with pytest.raises(ImageDecodeError, match="16-bit"):
            decode_pnm(b"P5\n1 1\n65535\n\x00\x00")


class TestBmpVariants:
    def test_topdown(self):
        px = _px(4, 4, 3, seed=5)
        payload = bytearray(encode_bmp(px))
        # Flip to top-down: negative height + re-order raster rows.
        h = struct.unpack_from("<i", payload, 22)[0]
        struct.pack_into("<i", payload, 22, -h)
        data_off = struct.unpack_from("<I", payload, 10)[0]
        stride = (4 * 3 + 3) & ~3
        rows = [
            bytes(payload[data_off + r * stride : data_off + (r + 1) * stride])
            for r in range(h)
        ]
        payload[data_off:] = b"".join(reversed(rows))
        _, out = decode_bmp(bytes(payload))
        np.testing.assert_array_equal(out, px)

    def test_compressed_rejected(self):
        payload = bytearray(encode_bmp(_px(2, 2, 3)))
        struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
        with pytest.raises(ImageDecodeError, match="compressed"):
            decode_bmp(bytes(payload))


class TestPngFilters:
    """The encoder only emits filter 0; hand-build rasters using each
    filter type so the decoder's unfilter paths are all exercised."""

    @staticmethod
    def _build(px, filter_types):
        h, w, c = px.shape
        color = {1: 0, 3: 2}[c]
        stride = w * c
        flat = px.reshape(h, stride).astype(np.int64)
        raw = bytearray()
        prev = np.zeros(stride, np.int64)
        for r in range(h):
            ft = filter_types[r % len(filter_types)]
            cur = flat[r]
            line = np.empty(stride, np.int64)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[i] = (cur[i] - pred) & 0xFF
            raw.append(ft)
            raw.extend(line.astype(np.uint8).tobytes())
            prev = cur

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_single_filter(self, ft):
        px = _px(6, 5, 3, seed=10 + ft)
        _, out = decode_png(self._build(px, [ft]))
        np.testing.assert_array_equal(out, px)

    def test_mixed_filters_gray(self):
        px = _px(10, 7, 1, seed=20)
        _, out = decode_png(self._build(px, [0, 1, 2, 3, 4]))
        np.testing.assert_array_equal(out, px)

    def test_interlace_rejected(self):
        px = _px(2, 2, 1)
        payload = bytearray(self._build(px, [0]))
        payload[8 + 8 + 12] = 1  # IHDR interlace byte
        # fix the CRC so the parser reaches the interlace check
        body = bytes(payload[16 : 16 + 13])
        struct.pack_into(
            ">I", payload, 16 + 13, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
        )
        with pytest.raises(ImageDecodeError, match="interlaced"):
            decode_png(bytes(payload))


class TestMalformedContainers:
    """Payloads that PASS the magic sniff but are corrupt must raise
    ImageDecodeError (never struct.error/IndexError/ValueError) so
    decode_features can degrade per-row instead of failing the task."""

    CASES = [
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00",          # truncated IHDR
        b"BM" + b"\x00" * 60,                          # zeroed BMP header
        b"P5\n-3 4\n255\n" + b"\x00" * 16,             # negative pnm width
        b"P5\n4 4\n999999\n" + b"\x00" * 32,           # absurd maxval
    ]

    def test_all_raise_imagedecodeerror(self):
        for payload in self.CASES:
            with pytest.raises(ImageDecodeError):
                decode_image(payload)

    def test_negative_width_bmp(self):
        payload = bytearray(encode_bmp(_px(2, 2, 3)))
        struct.pack_into("<i", payload, 18, -2)  # width = -2
        with pytest.raises(ImageDecodeError):
            decode_image(bytes(payload))

    def test_decode_features_degrades_not_crashes(self, spark):
        from cuspatial_spark.multimodal import decode_features

        rows = [
            (0, bytearray(encode_pnm(_px(3, 3, 1, seed=1)))),
            (1, bytearray(self.CASES[0])),  # corrupt PNG
            (2, bytearray(b"plain bytes, no image")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = decode_features(df).collect()
        assert len(out) == 3  # nothing crashed; corrupt rows degraded


class TestAverageHash:
    def test_deterministic_and_64bit(self):
        px = _px(32, 32, 3, seed=7)
        h1, h2 = average_hash(px), average_hash(px)
        assert h1 == h2
        assert 0 <= h1 < 1 << 64

    def test_invariant_to_uniform_brightness(self):
        px = _px(16, 16, 1, seed=8)
        shifted = np.clip(px.astype(np.int64) + 10, 0, 255).astype(np.uint8)
        # clip-free region only: use mid-range pixels
        px = (px % 200) + 20
        shifted = px + 10
        assert average_hash(px) == average_hash(shifted)

    def test_unrecognized_raises(self):
        with pytest.raises(ImageDecodeError):
            decode_image(b"\x00\x01\x02not an image")
        with pytest.raises(ImageDecodeError):
            decode_image(b"")


class TestSparkImageFeatures:
    def test_synth_images_end_to_end(self, spark):
        from cuspatial_spark.multimodal import image_features, synth_images

        df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        imgs = synth_images(df, id_col="doc_id")
        feats = image_features(imgs, id_cols=("doc_id",)).orderBy("doc_id")
        rows = feats.collect()
        assert len(rows) == 40
        for r in rows:
            g = r.doc_id
            w, h = 4 + g % 13, 3 + g % 11
            c = 1 if g % 6 in (0, 3, 4) else 3
            assert (r.width, r.height, r.channels) == (w, h, c)
            flat = (g * 31 + np.arange(w * h * c, dtype=np.int64) * 7) % 251
            assert r.px_min == int(flat.min())
            assert r.px_max == int(flat.max())
            assert r.px_mean == pytest.approx(float(flat.mean()), abs=0, rel=0)
            exp_fmt = {0: "pgm", 1: "ppm", 2: "bmp", 3: "bmp", 4: "png", 5: "png"}
            assert r.image_format == exp_fmt[g % 6]
            px = flat.astype(np.uint8).reshape(h, w, c)
            assert r.phash == f"{average_hash(px):016x}"

    def test_image_thumbnail_exact_block_means(self, spark):
        from cuspatial_spark.multimodal import image_thumbnail, synth_images

        df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        imgs = synth_images(df, id_col="doc_id")
        out = {
            r.doc_id: np.asarray(r.thumb)
            for r in image_thumbnail(imgs, id_cols=("doc_id",), grid=4).collect()
        }
        for g in range(10):
            w, h = 4 + g % 13, 3 + g % 11
            c = 1 if g % 6 in (0, 3, 4) else 3
            flat = (g * 31 + np.arange(w * h * c, dtype=np.int64) * 7) % 251
            gray = flat.astype(np.uint8).reshape(h, w, c).astype(np.float64).mean(axis=2)
            # reference block means via explicit slicing
            re_ = [(k * h) // 4 for k in range(4)] + [h]
            ce_ = [(k * w) // 4 for k in range(4)] + [w]
            exp = np.array(
                [
                    [
                        gray[re_[i]:re_[i + 1], ce_[j]:ce_[j + 1]].mean()
                        if re_[i] < re_[i + 1] and ce_[j] < ce_[j + 1]
                        else np.nan
                        for j in range(4)
                    ]
                    for i in range(4)
                ]
            )
            # tiny dims (<4) repeat edge blocks; build expectation the
            # same way the kernel documents
            if np.isnan(exp).any():
                g_r, g_c = min(4, h), min(4, w)
                re2 = [(k * h) // g_r for k in range(g_r)] + [h]
                ce2 = [(k * w) // g_c for k in range(g_c)] + [w]
                base = np.array(
                    [
                        [
                            gray[re2[i]:re2[i + 1], ce2[j]:ce2[j + 1]].mean()
                            for j in range(g_c)
                        ]
                        for i in range(g_r)
                    ]
                )
                exp = base[
                    np.minimum(np.arange(4), g_r - 1)[:, None],
                    np.minimum(np.arange(4), g_c - 1)[None, :],
                ]
            np.testing.assert_allclose(
                out[g].reshape(4, 4), exp, rtol=0, atol=1e-12
            )

    def test_decode_features_real_path(self, spark):
        """decode_features on real encoded bytes: features come from the
        DECODED pixels, not the raw container bytes."""
        from cuspatial_spark.multimodal import decode_features, synth_images

        df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
        imgs = synth_images(df, id_col="doc_id")
        out = decode_features(imgs).collect()
        assert len(out) == 12
        by_md5 = {r.payload_md5: r for r in out}
        import hashlib

        for g, payload in [(r.doc_id, bytes(r.payload)) for r in imgs.collect()]:
            w, h = 4 + g % 13, 3 + g % 11
            c = 1 if g % 6 in (0, 3, 4) else 3
            flat = ((g * 31 + np.arange(w * h * c, dtype=np.int64) * 7) % 251).astype(
                np.uint8
            )
            r = by_md5[hashlib.md5(payload).hexdigest()]
            assert r.feat_mean == pytest.approx(float(flat.mean()))
            # for decodable images, n_bytes counts DECODED pixels
            assert r.n_bytes == flat.size
