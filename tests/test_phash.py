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


def test_phash_dct_from_bytes_matches_kernel(spark):
    """Spark byte-path DCT hash == the numpy kernel on locally decoded
    images (lossless formats: exact)."""
    from osm2garmin_spark.functions.phash import (phash_dct64,
                                                  phash_dct_from_bytes)
    from osm2garmin_spark.operators.raster import decode_image

    imgs = synth_images(spark, 200, partitions=3) \
        .filter(F.col("fmt").isin("raw", "png"))
    got = {r["image_id"]: r["phash_dct"]
           for r in phash_dct_from_bytes(imgs).collect()}
    for r in imgs.select("image_id", "bytes", "w", "h", "fmt").collect():
        img = decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        assert got[r["image_id"]] == phash_dct64(img), r["image_id"]


def test_phash_dct_near_pairs_match_brute_force(spark):
    """Banded blocking over the DCT hash column == all-pairs brute force
    (the blocking is hash-agnostic; this pins it on the new family)."""
    from osm2garmin_spark.functions.phash import (phash_dct_from_bytes,
                                                  phash_near_pairs)

    imgs = synth_images(spark, 300, partitions=4) \
        .filter(F.col("fmt").isin("raw", "png"))
    ph = phash_dct_from_bytes(imgs)
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in phash_near_pairs(ph, phash_col="phash_dct",
                                     max_hamming=3).collect()}
    rows = ph.collect()
    want = _brute_pairs([r["image_id"] for r in rows],
                        [r["phash_dct"] & ((1 << 64) - 1) for r in rows], 3)
    assert got == want


def test_phash_dct_brightness_invariance_exact():
    """Every kept Q13 basis row sums to EXACTLY zero (checked against
    the constants, not assumed), so a constant brightness shift without
    clipping provably changes no coefficient: hash identical."""
    from osm2garmin_spark.functions.phash import _DCT16_Q13, phash_dct64

    assert (_DCT16_Q13.sum(axis=1) == 0).all()
    rng = np.random.RandomState(11)
    for _ in range(5):
        img = rng.randint(0, 200, (16, 16)).astype(np.uint8)
        for shift in (1, 17, 55):
            shifted = (img.astype(np.int64) + shift).astype(np.uint8)
            assert phash_dct64(shifted) == phash_dct64(img)


def test_phash_dct_absorbs_mean_boundary_noise():
    """The distinguishing robustness property vs the mean-threshold
    hash, on an image with genuine low-frequency structure (NOT a pure
    ramp or a single separable cosine — for those every kept AC
    coefficient is ~0, the median is a 63-way tie, and the DCT hash is
    legitimately fragile): engineer one sampled pixel to sit exactly at
    the sampled mean, then poke a DIFFERENT sampled pixel by +1. The
    mean rises past the tied pixel and the mean hash flips; the DCT
    hash — whose coefficients sit far from their median on this
    content — is unchanged under that poke AND under every other
    single-pixel +1 poke."""
    from osm2garmin_spark.functions.phash import phash64, phash_dct64

    yy, xx = np.indices((16, 16))
    base = np.clip(120 + 60 * np.cos((xx - 4) / 5) * np.cos((yy - 9) / 4)
                   + 40 * np.sin(xx * 1.1 + 0.3) * np.cos(yy * 0.7 + 1.2),
                   0, 230).astype(np.int64)
    small_idx = [(2 * r, 2 * c) for r in range(8) for c in range(8)]
    tie_pix, poke_pix = (8, 8), (0, 2)
    # set the tie pixel to the sampled value closest to the mean, then
    # spread the residual so the sampled sum is exactly 64 * tie value
    sum0 = sum(base[p] for p in small_idx)
    v = min((base[p] for p in small_idx), key=lambda t: abs(64 * t - sum0))
    base[tie_pix] = v
    adj = 64 * v - sum(base[p] for p in small_idx)
    spread = [p for p in small_idx if p not in (tie_pix, poke_pix)]
    i, step = 0, 1 if adj > 0 else -1
    while adj != 0:
        p = spread[i % len(spread)]
        if 0 <= base[p] + step <= 254:
            base[p] += step
            adj -= step
        i += 1
    img = base.astype(np.uint8)
    s = img[::2, ::2].astype(np.float64)
    assert s[4, 4] == s.mean()                  # the engineered tie

    h0m, h0d = phash64(img), phash_dct64(img)
    poke = img.copy()
    poke[poke_pix] += 1
    assert phash64(poke) != h0m                 # mean hash flips
    assert phash_dct64(poke) == h0d             # DCT hash does not
    for k in range(256):                        # ... nor under any poke
        p2 = np.where(np.arange(256).reshape(16, 16) == k,
                      np.minimum(img, 254) + 1, img).astype(np.uint8)
        assert phash_dct64(p2) == h0d


def test_phash_dct_nonsquare_input_sampled():
    """Inputs that are not 16x16 take the same floor-index nearest
    sample as the mean-hash family (no crash, deterministic)."""
    from osm2garmin_spark.functions.phash import phash_dct64

    rng = np.random.RandomState(3)
    big = rng.randint(0, 256, (48, 32)).astype(np.uint8)
    rows = (np.arange(16) * 48) // 16
    cols = (np.arange(16) * 32) // 16
    assert phash_dct64(big) == phash_dct64(big[np.ix_(rows, cols)])


def _dhash_ref(img):
    """Independent reference: explicit double loop over the 8x9 grid."""
    h, w = img.shape
    rows = [(r * h) // 8 for r in range(8)]
    cols = [(c * w) // 9 for c in range(9)]
    v = 0
    for r in range(8):
        for c in range(8):
            if int(img[rows[r], cols[c + 1]]) > int(img[rows[r], cols[c]]):
                v |= 1 << (r * 8 + c)
    return v if v < (1 << 63) else v - (1 << 64)


def test_dhash64_matches_reference():
    from osm2garmin_spark.functions.phash import dhash64

    rng = np.random.RandomState(7)
    for shape in [(16, 16), (8, 9), (33, 21), (100, 100)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert dhash64(img) == _dhash_ref(img), shape


def test_dhash_monotone_brightness_invariant():
    """Gradient signs survive any strictly-monotone pixel remap — the
    robustness class the mean-threshold hash does NOT have."""
    from osm2garmin_spark.functions.phash import dhash64, phash64

    rng = np.random.RandomState(11)
    img = rng.randint(0, 121, (16, 16)).astype(np.uint8)
    # strictly monotone on 0..127: f(v) = 2v + v//8 (increments >= 2)
    lut = (2 * np.arange(121) + np.arange(121) // 8).astype(np.uint8)  # max 255, no wrap
    assert (np.diff(lut.astype(int)) > 0).all()
    remapped = lut[img]
    assert dhash64(remapped) == dhash64(img)
    # contrast: the mean-threshold hash is NOT invariant to this remap
    assert phash64(remapped) != phash64(img)


def test_dhash_near_pairs_match_brute_force(spark):
    from osm2garmin_spark.functions.phash import (dhash64, dhash_from_bytes,
                                                  phash_near_pairs)

    imgs = synth_images(spark, 250, partitions=4)
    dh = dhash_from_bytes(imgs.filter("fmt in ('raw','png')"))
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in phash_near_pairs(dh, phash_col="dhash_computed",
                                     max_hamming=3).collect()}
    rows = dh.collect()
    want = _brute_pairs([r["image_id"] for r in rows],
                        [r["dhash_computed"] & ((1 << 64) - 1) for r in rows], 3)
    assert got == want and len(want) > 0
