"""pHash near-dup: brute-force parity, pigeonhole completeness, byte-path
recompute parity (lossless exact, lossy drift bounded by the codec)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.functions.phash import (
    phash64, phash_from_bytes, phash_near_pairs)
from osm2garmin_spark.pipeline.synth import synth_images


def _brute_pairs(ids, hashes, t):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= t:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, d))
    return out


def test_phash64_matches_synth_column(spark):
    rows = synth_images(spark, 200, partitions=3).select(
        "image_id", "bytes", "w", "h", "fmt", "phash").collect()
    from osm2garmin_spark.operators.raster import decode_image
    for r in rows:
        if r["fmt"] in ("raw", "png"):
            img = decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
            assert phash64(img) == r["phash"], r["image_id"]


def test_near_pairs_match_brute_force(spark):
    df = synth_images(spark, 300, partitions=4).select("image_id", "phash")
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in phash_near_pairs(df, max_hamming=3).collect()}
    rows = df.collect()
    want = _brute_pairs([r["image_id"] for r in rows],
                        [r["phash"] & ((1 << 64) - 1) for r in rows], 3)
    assert got == want
    assert len(want) > 0  # the corpus actually contains near-dups


def test_pigeonhole_completeness_wider_threshold(spark):
    # t=6 with the minimum 7 bands — completeness must still hold exactly
    df = synth_images(spark, 200, partitions=2).select("image_id", "phash")
    with pytest.raises(ValueError):
        phash_near_pairs(df, max_hamming=6, bands=4)  # would lose recall
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in phash_near_pairs(df, max_hamming=6, bands=8).collect()}
    rows = df.collect()
    want = _brute_pairs([r["image_id"] for r in rows],
                        [r["phash"] & ((1 << 64) - 1) for r in rows], 6)
    assert got == want


def test_recompute_from_bytes_lossless_exact_lossy_bounded(spark):
    imgs = synth_images(spark, 240, partitions=3)
    rec = phash_from_bytes(imgs).join(
        imgs.select("image_id", "phash", "fmt"), "image_id")
    rows = rec.withColumn(
        "drift", F.bit_count(F.col("phash").bitwiseXOR(
            F.col("phash_computed"))).cast("int")).collect()
    lossless = [r for r in rows if r["fmt"] in ("raw", "png")]
    lossy = [r for r in rows if r["fmt"] == "q6"]
    assert lossless and lossy
    assert all(r["drift"] == 0 for r in lossless)
    # q6 quantizes to 4-value steps around the mean; the fingerprint may
    # flip bits whose pixel sits within one step of the threshold, but a
    # near-dup fingerprint must stay near: bound well inside the 64-bit
    # space (observed max drift 2 on this corpus)
    assert max(r["drift"] for r in lossy) <= 8


def test_negative_phash_sign_bit_handled(spark):
    # hand-built hashes exercising the sign bit: two int64 values whose
    # unsigned forms differ only in bits 62..63
    a = -(1 << 63)                 # 0x8000000000000000
    b = -(1 << 63) | (1 << 62)     # 0xC000000000000000
    df = spark.createDataFrame(
        [("x", a), ("y", b), ("z", 31)], "image_id string, phash long")
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in phash_near_pairs(df, max_hamming=3).collect()}
    # x↔y differ only in bit 62; x↔z differ in 6 bits (sign + 5 low),
    # y↔z in 7 — both beyond t=3, so exactly one pair survives
    assert got == {("x", "y", 1)}


def _brute_pairs128(ids, hashes, t):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            x = (hashes[i][0] ^ hashes[j][0]) & ((1 << 64) - 1)
            y = (hashes[i][1] ^ hashes[j][1]) & ((1 << 64) - 1)
            d = bin(x).count("1") + bin(y).count("1")
            if d <= t:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, d))
    return out


def test_phash128_near_pairs_match_brute_force(spark):
    from osm2garmin_spark.functions.phash import (
        phash128_from_bytes, phash128_near_pairs)
    imgs = synth_images(spark, 300, partitions=4).filter("fmt != 'q6'")
    ph = phash128_from_bytes(imgs)
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in phash128_near_pairs(ph, max_hamming=3).collect()}
    rows = ph.collect()
    want = _brute_pairs128([r["image_id"] for r in rows],
                           [(r["phash_hi"], r["phash_lo"]) for r in rows], 3)
    assert got == want
    assert len(want) > 0


def test_phash128_from_bytes_matches_kernel(spark):
    from osm2garmin_spark.functions.phash import phash128, phash128_from_bytes
    from osm2garmin_spark.operators.raster import decode_image
    imgs = synth_images(spark, 60, partitions=2).filter("fmt != 'q6'")
    rows = imgs.select("image_id", "bytes", "w", "h", "fmt").collect()
    want = {r["image_id"]:
            phash128(decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"]))
            for r in rows}
    got = {r["image_id"]: (r["phash_hi"], r["phash_lo"])
           for r in phash128_from_bytes(imgs).collect()}
    assert got == want


def test_phash128_band_validation(spark):
    from osm2garmin_spark.functions.phash import (
        phash128_bands, phash128_near_pairs)
    from pyspark.sql import functions as F
    with pytest.raises(ValueError):
        phash128_bands(F.lit(0), F.lit(0), 3)    # 3 does not divide 128
    with pytest.raises(ValueError):
        phash128_bands(F.lit(0), F.lit(0), 2)    # 64-bit bands unsupported
    df = spark.createDataFrame(
        [("x", 0, 0)], "image_id string, phash_hi long, phash_lo long")
    with pytest.raises(ValueError):
        phash128_near_pairs(df, max_hamming=6, bands=4)  # recall loss


def test_synth_phash_parity():
    """The column-pruned fingerprint path must equal the full generator's
    stored phash bit-for-bit (it IS the same derivation, minus bytes)."""
    import numpy as np
    from osm2garmin_spark.pipeline.synth import _gen_batch, _phash_batch

    ids = np.arange(0, 700, dtype=np.int64)
    full = _gen_batch(ids)
    pruned = _phash_batch(ids)
    assert list(pruned["phash"]) == list(full["phash"])
    assert list(pruned["image_id"]) == list(ids)
    assert list(full["image_id"]) == ["img" + str(i) for i in ids]
