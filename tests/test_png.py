"""PNG codec: spec-level structure, all five filters, CRC enforcement,
and integration with the decode/verify kernels."""

import struct
import zlib

import numpy as np
import pytest

from osm2garmin_spark.operators.png import encode_png, decode_png
from osm2garmin_spark.operators.raster import decode_image, encode_image


def test_roundtrip_random_images():
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (2, 3), (16, 16), (37, 61), (64, 64)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_roundtrip_structured_images_exercise_filters():
    """Gradient/constant/noise images push the MSAD heuristic to different
    filters; every one must roundtrip exactly."""
    imgs = [
        np.zeros((8, 8), dtype=np.uint8),                       # None/Up
        np.tile(np.arange(32, dtype=np.uint8), (8, 1)),         # Sub
        np.tile(np.arange(32, dtype=np.uint8)[:, None], (1, 8)),  # Up
        (np.add.outer(np.arange(16), np.arange(16)) * 7 % 256).astype(np.uint8),
        np.full((5, 5), 255, dtype=np.uint8),
    ]
    used = set()
    for img in imgs:
        b = encode_png(img)
        assert np.array_equal(decode_png(b), img)
        # collect the filter types actually chosen
        pos = 8
        while pos < len(b):
            (length,) = struct.unpack(">I", b[pos:pos + 4])
            tag = b[pos + 4:pos + 8]
            if tag == b"IDAT":
                raw = zlib.decompress(b[pos + 8:pos + 8 + length])
                w = img.shape[1]
                used |= set(raw[:: w + 1])
            pos += 12 + length
    assert len(used) >= 3  # heuristic picks several filter types


def test_all_decoder_filters_via_forced_scanlines():
    """Hand-build a PNG whose rows use filter types 0..4 explicitly."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    w = 7
    rows = []
    prev = np.zeros(w, dtype=np.int16)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].astype(np.int16)
        left = np.zeros(w, dtype=np.int16)
        left[1:] = cur[:-1]
        up = prev.copy()
        upleft = np.zeros(w, dtype=np.int16)
        upleft[1:] = up[:-1]
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - up
        elif ft == 3:
            filt = cur - ((left + up) >> 1)
        else:
            p = left + up - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, upleft))
            filt = cur - pred
        rows.append(bytes([ft]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", struct.pack(">IIBBBBB", w, 5, 8, 0, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(b"".join(rows)))
         + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(b), img)


def test_crc_corruption_rejected():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    b = bytearray(encode_png(img))
    b[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(b))


def test_unsupported_color_type_disclosed():
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)))
    with pytest.raises(NotImplementedError):
        decode_png(b)


def test_raster_integration_png_fmt():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    b = encode_image(img, "png")
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(decode_image(b, 16, 16, "png"), img)
    with pytest.raises(ValueError, match="metadata"):
        decode_image(b, 8, 8, "png")


def test_synth_corpus_includes_real_png(spark):
    from osm2garmin_spark.pipeline.synth import synth_images
    from osm2garmin_spark.operators.raster import decode_stats
    import math

    imgs = synth_images(spark, 90, partitions=2)
    fmts = {r["fmt"] for r in imgs.select("fmt").distinct().collect()}
    assert fmts == {"raw", "png", "q6"}
    stats = decode_stats(imgs).collect()
    assert len(stats) == 90
    for r in stats:
        assert math.isinf(r["psnr_vs_roundtrip"]) or r["psnr_vs_roundtrip"] >= 40.0
