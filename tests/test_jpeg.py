"""Baseline JPEG codec conformance + roundtrip invariants + the mixed
raw/png/q6/jpeg corpus through the verify stage (reference analogue:
Srtm.java:143-156 decodes stored raster bytes before use — the verify
stage must genuinely decode every format it claims)."""

import numpy as np
import pytest

from osm2garmin_spark.operators.jpeg import (
    encode_jpeg, decode_jpeg, quant_table, ZIGZAG, QTABLE_LUMA)
from osm2garmin_spark.operators.raster import psnr


def _pattern(i, size=16):
    x, y = np.arange(size), np.arange(size)
    return ((x[None, :] * (i % 7 + 1) + y[:, None] * (i % 11 + 3) + i)
            % 256).astype(np.uint8)


def test_roundtrip_psnr_by_content_class():
    rng = np.random.default_rng(7)
    imgs = {
        "gradient": (np.add.outer(np.arange(64), np.arange(64)) * 2
                     % 256).astype(np.uint8),
        "pattern": _pattern(5),
        "noise": rng.integers(0, 256, (40, 56), dtype=np.uint8),
    }
    for name, img in imgs.items():
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        assert psnr(img, dec) >= 40.0, name
    # quality=100 -> all-ones table -> near-lossless on everything
    for name, img in imgs.items():
        dec = decode_jpeg(encode_jpeg(img, quality=100))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1, name


def test_non_multiple_of_8_dimensions():
    rng = np.random.default_rng(11)
    for shape in [(1, 1), (3, 5), (8, 9), (17, 23), (15, 8)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=100))
        assert dec.shape == shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_quality_ladder_monotone():
    img = _pattern(9, 32)
    prev = -1.0
    for q in (50, 75, 90, 100):
        p = psnr(img, decode_jpeg(encode_jpeg(img, q)))
        assert p >= prev - 1e-9, (q, p, prev)
        prev = p


def test_quant_table_quality_mapping():
    assert (quant_table(100) == 1).all()
    assert (quant_table(50) == QTABLE_LUMA).all()
    assert (quant_table(25) >= QTABLE_LUMA).all()
    with pytest.raises(ValueError):
        quant_table(0)


def test_marker_structure():
    b = encode_jpeg(_pattern(3), quality=90)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    # exactly one SOF0 with 1 component / 8-bit precision
    i = b.find(b"\xff\xc0")
    assert i > 0 and b[i + 4] == 8 and b[i + 9] == 1
    # the entropy segment never contains a bare FF (stuffing works):
    # every FF inside is followed by 00 (stuffed) or D9 (the final EOI)
    sos = b.find(b"\xff\xda")
    ent = b[sos + 2 + int.from_bytes(b[sos + 2:sos + 4], "big"):]
    j = 0
    while j < len(ent) - 1:
        if ent[j] == 0xFF:
            assert ent[j + 1] in (0x00, 0xD9)
            j += 2
        else:
            j += 1


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


def test_decoder_reads_foreign_tables():
    """The decoder must honor DQT/DHT from the stream, not assume its own:
    streams at different qualities carry different quant tables and must
    each decode against theirs."""
    img = _pattern(2, 24)
    d90 = decode_jpeg(encode_jpeg(img, 90))
    d100 = decode_jpeg(encode_jpeg(img, 100))
    assert psnr(img, d100) > psnr(img, d90)


def test_rejects_out_of_subset_streams():
    good = bytearray(encode_jpeg(_pattern(1), quality=90))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00")
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:i + 1]) + b"\xc2" + bytes(good[i + 2:])
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(prog)
    # truncate inside the entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[:len(good) // 2]))


def test_dc_differential_across_blocks():
    """Blocks with very different means exercise multi-category DC codes."""
    img = np.zeros((8, 32), np.uint8)
    img[:, 8:16] = 255
    img[:, 16:24] = 64
    img[:, 24:] = 192
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_verify_tiles_mixed_corpus(spark):
    """VERDICT r2 #6 'done' criterion: the tile-verify stage passes on a
    corpus mixing all four codecs, decoding each for real."""
    from osm2garmin_spark.operators.raster import encode_image
    from osm2garmin_spark.pipeline.verify_tiles import verify_assigned_tiles
    from osm2garmin_spark.pipeline.vocab import CAPTION_WORDS

    fmts = ["raw", "png", "q6", "jpeg"]
    rows = []
    for i in range(20):
        img = _pattern(i)
        fmt = fmts[i % 4]
        cap = (f"photo of {CAPTION_WORDS[i % len(CAPTION_WORDS)]} "
               f"{CAPTION_WORDS[(i // 7) % len(CAPTION_WORDS)]}")
        rows.append((1, f"img{i}", encode_image(img, fmt), 16, 16, fmt, cap))
    df = spark.createDataFrame(
        rows, "tile_id int, image_id string, bytes binary, w int, h int, "
        "fmt string, caption string")
    out = verify_assigned_tiles(df).collect()
    assert len(out) == 20
    assert all(r["pixel_ok"] for r in out)
    assert all(r["caption_ok"] for r in out)
    jpeg_rows = [r for r in out if int(r["image_id"][3:]) % 4 == 3]
    assert jpeg_rows and all(r["psnr"] >= 40.0 for r in jpeg_rows)


# --- restart intervals (DRI/RSTn, round 5) ---------------------------------

def _terrain(h, w, seed=3):
    x = np.linspace(0, 6, w)
    y = np.linspace(0, 5, h)
    base = np.sin(y[:, None] + seed) * np.cos(x[None, :]) * 0.5 + 0.5
    return (base * 255).astype(np.uint8)


def test_restart_interval_roundtrip_pixel_identical():
    """DRI streams decode to EXACTLY the same pixels as the unrestarted
    encoding of the same blocks (restarts change framing, not data), for
    intervals that divide, don't divide, and exceed the MCU count."""
    img = _terrain(157, 203)
    base = decode_jpeg(encode_jpeg(img, 85))
    for ri in (1, 7, 26, 100, 10 ** 4):
        b = encode_jpeg(img, 85, restart_interval=ri)
        assert np.array_equal(decode_jpeg(b), base), ri


def test_restart_marker_structure():
    """DRI segment present with the interval; RSTn markers appear in
    cyclic order n=0..7,0..; count = ceil(blocks/interval) - 1."""
    img = _terrain(64, 64)          # 8x8 = 64 blocks
    ri = 5
    b = encode_jpeg(img, 85, restart_interval=ri)
    i = b.find(b"\xFF\xDD")
    assert i > 0
    assert int.from_bytes(b[i + 2:i + 4], "big") == 4
    assert int.from_bytes(b[i + 4:i + 6], "big") == ri
    # collect RST markers from the scan (skip stuffed FF00)
    sos = b.find(b"\xFF\xDA")
    scan = b[sos + 2 + int.from_bytes(b[sos + 2:sos + 4], "big"):]
    rsts = []
    j = 0
    while j < len(scan) - 1:
        if scan[j] == 0xFF and 0xD0 <= scan[j + 1] <= 0xD7:
            rsts.append(scan[j + 1] - 0xD0)
            j += 2
        else:
            j += 1
    assert len(rsts) == (64 + ri - 1) // ri - 1
    assert rsts == [k % 8 for k in range(len(rsts))]


def test_restart_zero_is_byte_identical_legacy():
    img = _terrain(48, 80)
    assert encode_jpeg(img, 90) == encode_jpeg(img, 90, restart_interval=0)


def test_restart_parallel_workers_match_sequential():
    img = _terrain(96, 96)
    b = encode_jpeg(img, 85, restart_interval=9)
    assert np.array_equal(decode_jpeg(b, workers=4), decode_jpeg(b))


def test_restart_segment_independence():
    """Corrupting one restart segment's bytes leaves every OTHER segment's
    blocks bit-identical (the property that makes the segment the
    parallel/recovery unit) — decode the good segments by hand."""
    from osm2garmin_spark.operators.jpeg import (_decode_entropy_segment,
                                                 _split_scan)
    img = _terrain(64, 64)
    ri = 16                          # 4 segments of 16 blocks
    b = encode_jpeg(img, 85, restart_interval=ri)
    sos = b.find(b"\xFF\xDA")
    scan = b[sos + 2 + int.from_bytes(b[sos + 2:sos + 4], "big"):]
    segs = _split_scan(scan)
    assert len(segs) == 4
    dc = (tuple(__import__("osm2garmin_spark.operators.jpeg",
                           fromlist=["DC_BITS"]).DC_BITS),
          tuple(range(12)))
    from osm2garmin_spark.operators.jpeg import AC_BITS, AC_VALS
    ac = (tuple(AC_BITS), tuple(AC_VALS))
    ref = [_decode_entropy_segment((s, 16, dc, ac)) for s in segs]
    # corrupt segment 1 (flip bits mid-segment); other segments unchanged
    bad = bytearray(segs[1])
    bad[len(bad) // 2] ^= 0x55
    for i in (0, 2, 3):
        assert _decode_entropy_segment((segs[i], 16, dc, ac)) == ref[i]


def test_restart_validation_errors():
    img = _terrain(32, 32)
    b = encode_jpeg(img, 85, restart_interval=3)
    # strip the DRI segment but keep the RST markers -> reject
    i = b.find(b"\xFF\xDD")
    no_dri = b[:i] + b[i + 6:]
    with pytest.raises(ValueError, match="RST marker without"):
        decode_jpeg(no_dri)
    with pytest.raises(ValueError):
        encode_jpeg(img, 85, restart_interval=-1)
    with pytest.raises(ValueError):
        encode_jpeg(img, 85, restart_interval=70000)
