"""Perceptual-hash (pHash) near-duplicate detection for image corpora.

The image-payload twin of the text MinHash-LSH path (functions/dedup.py):
the input shape (BASELINE input_hint) carries a ``phash:int64`` column —
a 64-bit mean-threshold fingerprint of the 8×8 nearest-neighbor
downsample of the decoded grayscale image — and near-duplicate images
differ in few fingerprint bits.

Operators:

- ``phash_from_bytes``   recompute the fingerprint from the stored bytes
                         (decode → 8×8 nearest downsample → mean
                         threshold → 64-bit pack), Arrow-batched
                         mapInPandas; for lossless formats the result is
                         bit-identical to a fingerprint computed at
                         ingest time, for lossy formats it drifts by the
                         codec's bit error (pinned in tests).
- ``phash_bands``        split the 64-bit hash into ``bands`` disjoint
                         fixed-width bit bands (JVM shift/mask exprs).
- ``phash_near_pairs``   all pairs with hamming(phash_a, phash_b) ≤ t.
                         Scale path: band-exact blocking self-join —
                         by pigeonhole, two hashes within hamming t agree
                         exactly on at least one of t+1 disjoint bands,
                         so with bands ≥ t+1 the candidate join is
                         COMPLETE (no recall loss), and candidates only
                         ever meet inside an equal-band bucket (never an
                         all-pairs product). Refine = one JVM
                         ``bit_count(xor)`` per candidate.

100 TB story (round 7: VALUE COMPRESSION): the band self-join runs over
the DISTINCT hash values, so bucket growth follows the hash DOMAIN, not
the row count — a corpus that repeats fingerprints (re-uploads,
thumbnails, flat images) adds rows to the expansion joins but nothing
to the quadratic bucket stage, and degenerate content (hot identical
hashes, collapsed dHash entropy) shows up only as genuinely-large
OUTPUT, which no blocking can avoid. The id→hash rows shuffle once per
expansion join on the 8-byte hash key; the binary column never moves;
the refine is a pure column expression (one popcount per distinct-hash
candidate).

The band join's bucket discrimination is still capped at
2^(hash_bits/(t+1)) values over the DISTINCT hashes; for the 64-bit
hash at t=3 that is 2^16, and false-candidate volume grows as
D²/2^16 in distinct hashes D. The scale path past that is a WIDER
fingerprint, not more bands of the same hash: ``phash128*`` below
carries 128 bits in an (hi, lo) int64 pair and blocks on four 32-bit
bands — 2^32 bucket values.

No reference analogue (mantlik/osm2garmin has no image dedup); brief-
mandated training-data-pipeline operator (SURVEY.md §2.12).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def phash64(img: "np.ndarray") -> int:
    """uint8 2-D array → 64-bit mean-threshold fingerprint (signed int64).

    Nearest-neighbor 8×8 downsample (floor-index sampling — for a 16×16
    input this is exactly ``img[::2, ::2]``, matching the corpus
    generator pipeline/synth.py:52-57), threshold at the float mean, bit
    k = r*8+c, LSB-first.
    """
    h, w = img.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(8) * w) // 8
    small = img[np.ix_(rows, cols)].reshape(64)
    bits = (small >= small.mean()).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int((bits * weights).sum(dtype=np.uint64).view(np.int64))


def phash_from_bytes(images: DataFrame, out_col: str = "phash_computed",
                     keep_cols: List[str] | None = None) -> DataFrame:
    """Recompute the pHash fingerprint from stored image bytes.

    Needs columns image_id, bytes, w, h, fmt; returns (image_id,
    *keep_cols, out_col). Decode + fingerprint run Arrow-batched on
    executors; the binary column never reaches the driver.
    """
    from ..operators.raster import decode_image

    keep = keep_cols or []
    schema = ("image_id string, "
              + "".join(f"{c} long, " for c in keep)
              + f"{out_col} long")

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = np.zeros(n, np.int64)
            for i in range(n):
                img = decode_image(pdf["bytes"].iat[i],
                                   int(pdf["w"].iat[i]),
                                   int(pdf["h"].iat[i]),
                                   pdf["fmt"].iat[i])
                out[i] = phash64(img)
            res = {"image_id": pdf["image_id"].to_numpy()}
            for c in keep:
                res[c] = pdf[c].to_numpy()
            res[out_col] = out
            yield pd.DataFrame(res)

    cols = images.select("image_id", "bytes", "w", "h", "fmt", *keep)
    return cols.mapInPandas(kernel, schema=schema)


def phash128(img: "np.ndarray") -> tuple:
    """uint8 2-D array → 128-bit fingerprint as (hi, lo) signed int64s.

    The wider-fingerprint scale path documented on phash_near_pairs: a
    16×8 nearest-neighbor downsample (128 samples) thresholded at the
    joint mean. bit k = r*8+c for row r in 0..15; lo carries bits 0..63
    (rows 0-7), hi bits 64..127 (rows 8-15). With 128 bits the t=3
    complete blocking uses four 32-bit bands — 2^32 bucket values
    instead of 2^16, which is what restores ~linear candidate volume
    past the 64-bit path's ~10M-row ceiling.
    """
    h, w = img.shape
    rows = (np.arange(16) * h) // 16
    cols = (np.arange(8) * w) // 8
    small = img[np.ix_(rows, cols)].reshape(128)
    bits = (small >= small.mean()).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    lo = int((bits[:64] * weights).sum(dtype=np.uint64).view(np.int64))
    hi = int((bits[64:] * weights).sum(dtype=np.uint64).view(np.int64))
    return hi, lo


def phash128_from_bytes(images: DataFrame) -> DataFrame:
    """Recompute the 128-bit fingerprint from stored image bytes:
    (image_id, phash_hi, phash_lo). Same executor-side contract as
    phash_from_bytes."""
    from ..operators.raster import decode_image

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            hi = np.zeros(n, np.int64)
            lo = np.zeros(n, np.int64)
            for i in range(n):
                img = decode_image(pdf["bytes"].iat[i],
                                   int(pdf["w"].iat[i]),
                                   int(pdf["h"].iat[i]),
                                   pdf["fmt"].iat[i])
                hi[i], lo[i] = phash128(img)
            yield pd.DataFrame({"image_id": pdf["image_id"].to_numpy(),
                                "phash_hi": hi, "phash_lo": lo})

    cols = images.select("image_id", "bytes", "w", "h", "fmt")
    return cols.mapInPandas(
        kernel, schema="image_id string, phash_hi long, phash_lo long")


def phash128_bands(hi: Column, lo: Column, bands: int) -> List[Column]:
    """128-bit hash → ``bands`` disjoint bit bands, LSB band first (lo
    bands before hi bands). Band width must be ≤ 32 bits so every band
    value is an exact non-negative int (width 64 would need the int64
    sign bit; any t ≥ 3 needs ≥ 4 bands anyway)."""
    if 128 % bands != 0:
        raise ValueError(f"bands must divide 128, got {bands}")
    width = 128 // bands
    if width > 32 or 64 % width != 0:
        raise ValueError(f"band width {width} unsupported (need ≤32, "
                         f"dividing 64)")
    mask = (1 << width) - 1
    per_half = 64 // width
    out = []
    for i in range(bands):
        src = lo if i < per_half else hi
        shift = width * (i % per_half)
        out.append(F.shiftrightunsigned(src, shift).bitwiseAND(F.lit(mask)))
    return out


def phash128_near_pairs(images: DataFrame, id_col: str = "image_id",
                        hi_col: str = "phash_hi", lo_col: str = "phash_lo",
                        max_hamming: int = 3,
                        bands: int | None = None) -> DataFrame:
    """128-bit twin of phash_near_pairs: same pigeonhole-complete band
    blocking and refine-before-dedup plan, with four 32-bit bands at the
    default t=3 (2^32 bucket discrimination). Returns (id_a, id_b,
    hamming)."""
    if bands is None:
        bands = max_hamming + 1
    if bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} < max_hamming+1={max_hamming + 1}: the band "
            f"join would miss pairs (pigeonhole completeness needs ≥ t+1)")

    hashes = images.select(F.col(id_col).alias("id"),
                           F.col(hi_col).alias("hi"),
                           F.col(lo_col).alias("lo"))
    # value compression (see phash_near_pairs): band-join the distinct
    # (hi, lo) values, then expand value pairs back to id pairs
    vals = hashes.select("hi", "lo").distinct()
    band_cols = phash128_bands(F.col("hi"), F.col("lo"), bands)
    buckets = vals.select(
        "hi", "lo",
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_val"))

    l = buckets.alias("l")
    r = buckets.alias("r")
    lt = (F.col("l.hi") < F.col("r.hi")) | (
        (F.col("l.hi") == F.col("r.hi")) & (F.col("l.lo") < F.col("r.lo")))
    hp = (l.join(r, on=[F.col("l.band_idx") == F.col("r.band_idx"),
                        F.col("l.band_val") == F.col("r.band_val"), lt])
           .select(F.col("l.hi").alias("hi_a"), F.col("l.lo").alias("lo_a"),
                   F.col("r.hi").alias("hi_b"), F.col("r.lo").alias("lo_b"),
                   (hamming64(F.col("l.hi"), F.col("r.hi"))
                    + hamming64(F.col("l.lo"), F.col("r.lo")))
                   .cast("int").alias("hamming"))
           .filter(F.col("hamming") <= max_hamming)
           .dropDuplicates(["hi_a", "lo_a", "hi_b", "lo_b"]))

    a = hashes.alias("a")
    b = hashes.alias("b")
    inter = (hp.join(a, (F.col("a.hi") == F.col("hi_a"))
                     & (F.col("a.lo") == F.col("lo_a")))
               .join(b, (F.col("b.hi") == F.col("hi_b"))
                     & (F.col("b.lo") == F.col("lo_b")))
               .select(F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                       F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                       "hamming"))
    intra = (a.join(b, on=[F.col("a.hi") == F.col("b.hi"),
                           F.col("a.lo") == F.col("b.lo"),
                           F.col("a.id") < F.col("b.id")])
              .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      F.lit(0).cast("int").alias("hamming")))
    return inter.unionByName(intra)


def dhash64(img: "np.ndarray") -> int:
    """uint8 2-D array → 64-bit difference hash (signed int64).

    The gradient fingerprint (Krawetz, "Kind of Like That",
    hackerfactor.com 2013 — public algorithm): sample a 8-row × 9-column
    grid with the same floor-index nearest-neighbor rule as phash64, set
    bit k = r*8+c (LSB-first) iff the right neighbor is strictly
    brighter: grid[r][c+1] > grid[r][c]. Horizontal-gradient signs are
    invariant to global brightness AND to any monotone per-pixel
    remapping — a different robustness class from the mean-threshold
    hash (which a brightness gradient can flip wholesale), which is why
    corpus dedup runs both and unions the edges (crossmodal pattern).
    """
    h, w = img.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    grid = img[np.ix_(rows, cols)].astype(np.int16)
    bits = (grid[:, 1:] > grid[:, :-1]).reshape(64).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int((bits * weights).sum(dtype=np.uint64).view(np.int64))


def dhash_from_bytes(images: DataFrame,
                     out_col: str = "dhash_computed") -> DataFrame:
    """Recompute the dHash fingerprint from stored image bytes — same
    Arrow-batched decode path as phash_from_bytes."""
    from ..operators.raster import decode_image

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = np.zeros(n, np.int64)
            for i in range(n):
                img = decode_image(pdf["bytes"].iat[i],
                                   int(pdf["w"].iat[i]),
                                   int(pdf["h"].iat[i]),
                                   pdf["fmt"].iat[i])
                out[i] = dhash64(img)
            yield pd.DataFrame({"image_id": pdf["image_id"].to_numpy(),
                                out_col: out})

    cols = images.select("image_id", "bytes", "w", "h", "fmt")
    return cols.mapInPandas(kernel, schema=f"image_id string, {out_col} long")


def phash_bands(phash: Column, bands: int) -> List[Column]:
    """64-bit hash → ``bands`` disjoint bit bands, LSB band first.

    Unsigned shift + mask keeps every band non-negative regardless of the
    int64 sign bit, so band values agree with any twin that models the
    hash as an unsigned 64-bit integer (the DuckDB oracle does).
    """
    if 64 % bands != 0:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1
    return [F.shiftrightunsigned(phash, width * i).bitwiseAND(F.lit(mask))
            for i in range(bands)]


def hamming64(a: Column, b: Column) -> Column:
    """Bit-level hamming distance between two int64 hashes (JVM popcount
    over the two's-complement xor — all 64 bits, sign bit included)."""
    return F.bit_count(a.bitwiseXOR(b))


def phash_value_near_pairs(vals: DataFrame, ph_col: str = "ph",
                           max_hamming: int = 3,
                           bands: int | None = None) -> DataFrame:
    """Near pairs over DISTINCT hash VALUES: (ph_a < ph_b, hamming) with
    0 < hamming ≤ max_hamming. ``vals`` must carry one row per distinct
    hash (callers groupBy the hash column first).

    This is the band join of :func:`phash_near_pairs` run on the value
    domain instead of the row domain — the value-compression that keeps
    the bucket self-join quadratic in DISTINCT hashes, not rows. A real
    corpus repeats fingerprints heavily (re-uploads, thumbnails, flat
    images), so band buckets over rows grow with row count while buckets
    over values are bounded by the hash domain; pairs within an equal
    value are hamming-0 and are reconstructed by the caller's expansion
    join, never enumerated here.
    """
    if bands is None:
        bands = max_hamming + 1
    if bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} < max_hamming+1={max_hamming + 1}: the band "
            f"join would miss pairs (pigeonhole completeness needs ≥ t+1)")
    band_cols = phash_bands(F.col(ph_col), bands)
    buckets = vals.select(
        F.col(ph_col).alias("ph"),
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_val"))
    l = buckets.alias("l")
    r = buckets.alias("r")
    cand = (l.join(r, on=[F.col("l.band_idx") == F.col("r.band_idx"),
                          F.col("l.band_val") == F.col("r.band_val"),
                          F.col("l.ph") < F.col("r.ph")])
             .select(F.col("l.ph").alias("ph_a"), F.col("r.ph").alias("ph_b"),
                     hamming64(F.col("l.ph"), F.col("r.ph"))
                     .cast("int").alias("hamming"))
             .filter(F.col("hamming") <= max_hamming))
    return cand.dropDuplicates(["ph_a", "ph_b"])


def phash_near_pairs(images: DataFrame, id_col: str = "image_id",
                     phash_col: str = "phash", max_hamming: int = 3,
                     bands: int | None = None) -> DataFrame:
    """All pairs (id_a < id_b) with hamming(phash) ≤ max_hamming.

    bands defaults to max_hamming + 1 — the smallest count with the
    pigeonhole completeness guarantee (≤ t differing bits cannot touch
    all t+1 disjoint bands, so some band matches exactly). More bands =
    smaller buckets (fewer false candidates) at the cost of more
    candidate-join rows per image; fewer than t+1 would lose recall and
    is rejected.

    Plan shape (round 7): VALUE COMPRESSION. The band self-join runs on
    the DISTINCT hash values (phash_value_near_pairs) — quadratic only in
    distinct fingerprints per bucket — and id pairs are reconstructed by
    two equi-joins of the (tiny) value-pair table against the id→hash
    rows plus an equal-hash self-join for the hamming-0 clique pairs.
    Every emitted row is a true near pair, so the candidate volume is
    output-bound: the old row-domain band join re-met every id pair once
    per agreeing band inside buckets whose size grows with corpus size
    (the sf1.0 gradient corpus holds 50k rows over 2,504 distinct hashes:
    392M band candidates for 57M true pairs; compressed, the band join
    sees 2,504 rows and the expansion emits exactly the 57M).

    Returns (id_a, id_b, hamming).
    """
    hashes = images.select(F.col(id_col).alias("id"),
                           F.col(phash_col).alias("ph"))
    hp = phash_value_near_pairs(hashes.select("ph").distinct(), "ph",
                                max_hamming, bands)
    # expansion: inter-value pairs (id order restored per pair — the two
    # sides of a value pair interleave in id space)
    a = hashes.alias("a")
    b = hashes.alias("b")
    inter = (hp.join(a, F.col("a.ph") == F.col("ph_a"))
               .join(b, F.col("b.ph") == F.col("ph_b"))
               .select(F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                       F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                       "hamming"))
    # equal-hash cliques: hamming 0 by construction
    intra = (a.join(b, on=[F.col("a.ph") == F.col("b.ph"),
                           F.col("a.id") < F.col("b.id")])
              .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      F.lit(0).cast("int").alias("hamming")))
    return inter.unionByName(intra)


# ---------------------------------------------------------------------------
# DCT perceptual hash (the pHash.org scheme, exact fixed-point arithmetic)
# ---------------------------------------------------------------------------

def _dct16_q13() -> "np.ndarray":
    """Fixed-point 16-point DCT-II basis rows u = 1..8, Q13 scale:
    D[u-1][x] = round(8192 * sqrt(2/16) * cos((2x+1) u pi / 32)).

    Rounded ONCE here and inlined verbatim into the SQL oracle twin
    (queries._PHASH_DCT_DMAT_SQL), so both engines evaluate the same
    exact integer transform — no cross-engine libm/rounding surface.
    """
    import math
    d = np.empty((8, 16), dtype=np.int64)
    s = math.sqrt(2.0 / 16.0)
    for u in range(1, 9):
        for x in range(16):
            d[u - 1, x] = round(8192.0 * s
                                * math.cos((2 * x + 1) * u * math.pi / 32.0))
    return d


_DCT16_Q13 = _dct16_q13()


def phash_dct64(img: "np.ndarray") -> int:
    """uint8 2-D array → 64-bit DCT perceptual hash (signed int64).

    The published pHash algorithm (pHash.org ph_dct_imagehash; also the
    imagehash library), in EXACT integer arithmetic: 16×16 luma (inputs
    of other sizes take the nearest-neighbor 16×16 sample, same floor
    indexing as phash64) → fixed-point 16-point DCT-II (Q13 basis,
    int64 sums — exact, no float transform) → the 8×8 LOW-FREQUENCY
    block at (u, v) ∈ 1..8 (DC row/column excluded entirely) → bit
    k = (u-1)*8 + (v-1) set iff coefficient > median of the 64.

    Why a second fingerprint family: the mean-threshold hash compares
    each PIXEL to the global mean, so a single sampled pixel sitting at
    the mean boundary flips a bit under ±1 noise; this hash thresholds
    low-frequency STRUCTURE, whose coefficients sit far from the median
    for natural content, absorbing small high-frequency perturbations
    (pinned empirically in tests: a boundary poke that flips the mean
    hash leaves this one at hamming 0). One invariance is exact, not
    empirical: every kept basis row sums to zero EVEN AFTER the Q13
    rounding (verified for these constants), so a constant brightness
    shift (no clipping) provably changes no coefficient and no bit;
    u=0 / v=0, the only rows a constant excites, are excluded.
    Median exactness: coefficients are int64 and |coef| < 2^40, so the
    even-count median (mid-pair average) is an exact float64 in numpy
    and in the SQL twin alike.
    """
    h, w = img.shape
    if (h, w) != (16, 16):
        rows = (np.arange(16) * h) // 16
        cols = (np.arange(16) * w) // 16
        img = img[np.ix_(rows, cols)]
    p = img.astype(np.int64)
    coef = _DCT16_Q13 @ p @ _DCT16_Q13.T          # exact int64, 8x8
    flat = coef.reshape(64)
    med = np.median(flat)                          # exact for |c| < 2^52
    bits = (flat > med).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int((bits * weights).sum(dtype=np.uint64).view(np.int64))


def phash_dct_from_bytes(images: DataFrame,
                         out_col: str = "phash_dct") -> DataFrame:
    """Recompute the DCT perceptual hash from stored image bytes:
    (image_id, out_col). Same executor-side contract as phash_from_bytes
    (Arrow-batched decode, bytes never reach the driver); the output
    column feeds the generic band blocking (phash_near_pairs with
    phash_col=out_col) unchanged — the blocking is hash-agnostic."""
    from ..operators.raster import decode_image

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = np.zeros(n, np.int64)
            for i in range(n):
                img = decode_image(pdf["bytes"].iat[i],
                                   int(pdf["w"].iat[i]),
                                   int(pdf["h"].iat[i]),
                                   pdf["fmt"].iat[i])
                out[i] = phash_dct64(img)
            yield pd.DataFrame({"image_id": pdf["image_id"].to_numpy(),
                                out_col: out})

    cols = images.select("image_id", "bytes", "w", "h", "fmt")
    return cols.mapInPandas(kernel, schema=f"image_id string, {out_col} long")
