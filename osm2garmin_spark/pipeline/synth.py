"""Deterministic synthetic image+caption corpus (BASELINE.json input_hint).

Schema: image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:int64 (+ lat/lon derived downstream by ``attach_geo``).

Generation is a pure function of the integer id — independent of partition
count and executor placement — so the corpus is reproducible at any scale
and any parallelism (the resume/scaling tests rely on this). Images are
synthesized in vectorized numpy batches inside mapInPandas: generation is
distributed and never touches the driver.

Geo distribution is skewed on purpose: ~30% of images cluster around 5
"metro" centers (hot cells exercising AQE skew handling / salting); the rest
spread quasi-uniformly via an integer LCG. Both branches use pure integer
arithmetic so a SQL oracle (DuckDB) can reproduce lat/lon exactly
(expressions.derived_* / *_sql twins).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..expressions import derived_lat, derived_lon
from .vocab import CAPTION_WORDS

IMAGE_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                "caption string, phash long")

#: metro centers (lat, lon) for the skewed 30% — deterministic hot spots
METROS = [(40.7, -74.0), (51.5, -0.1), (35.7, 139.7), (-23.5, -46.6), (28.6, 77.2)]


def _gen_batch(ids: np.ndarray) -> pd.DataFrame:
    n = len(ids)
    # 16×16 uint8 grayscale, integer pattern — vectorized over the batch
    size = 16
    x = np.arange(size, dtype=np.int64)
    y = np.arange(size, dtype=np.int64)
    a = (ids % 7 + 1)[:, None, None]
    b = (ids % 11 + 3)[:, None, None]
    imgs = ((x[None, None, :] * a + y[None, :, None] * b
             + ids[:, None, None]) % 256).astype(np.uint8)

    # three live codecs: raw (lossless), png (real codec, lossless),
    # q6 (lossy quantization)
    fmts = np.where(ids % 3 == 0, "raw", np.where(ids % 3 == 1, "png", "q6"))
    # phash: 64-bit mean-threshold fingerprint of the 8×8 nearest-downsample
    small = imgs[:, ::2, ::2]  # 8×8
    means = small.reshape(n, 64).mean(axis=1, keepdims=True)
    bits = (small.reshape(n, 64) >= means).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    phash = (bits * weights).sum(axis=1).astype(np.uint64).view(np.int64)

    w1 = CAPTION_WORDS[ids % len(CAPTION_WORDS)]
    w2 = CAPTION_WORDS[(ids // 7) % len(CAPTION_WORDS)]
    captions = np.char.add(np.char.add(np.char.add("photo of ", w1), " "), w2)

    from ..operators.png import encode_png

    encoded = []
    for i in range(n):
        if fmts[i] == "raw":
            encoded.append(imgs[i].tobytes())
        elif fmts[i] == "png":
            encoded.append(encode_png(imgs[i]))
        else:
            encoded.append((imgs[i] >> 2).tobytes())

    return pd.DataFrame({
        "image_id": np.char.add("img", ids.astype("U12")),
        "bytes": encoded,
        "w": np.full(n, size, dtype=np.int32),
        "h": np.full(n, size, dtype=np.int32),
        "fmt": fmts,
        "caption": captions,
        "phash": phash,
    })


def _gen_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield _gen_batch(pdf["id"].to_numpy(dtype=np.int64))


def _phash_batch(ids: np.ndarray) -> pd.DataFrame:
    """The column-pruned scan analogue: (numeric id, stored phash) WITHOUT
    materializing bytes. A real Iceberg/parquet scan of this corpus with
    only the phash column projected never touches the image bytes; the
    codec loop in _gen_batch is the synthesizer's stand-in for byte IO,
    so a fingerprint-only consumer must skip it the same way the pruned
    scan would. Derivation is shared with _gen_batch bit-for-bit
    (pinned by tests/test_synth_phash_parity)."""
    size = 16
    x = np.arange(size, dtype=np.int64)
    y = np.arange(size, dtype=np.int64)
    a = (ids % 7 + 1)[:, None, None]
    b = (ids % 11 + 3)[:, None, None]
    imgs = ((x[None, None, :] * a + y[None, :, None] * b
             + ids[:, None, None]) % 256).astype(np.uint8)
    small = imgs[:, ::2, ::2]
    n = len(ids)
    means = small.reshape(n, 64).mean(axis=1, keepdims=True)
    bits = (small.reshape(n, 64) >= means).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    phash = (bits * weights).sum(axis=1).astype(np.uint64).view(np.int64)
    return pd.DataFrame({"image_id": ids, "phash": phash})


def _phash_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield _phash_batch(pdf["id"].to_numpy(dtype=np.int64))


def synth_images(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of n images."""
    if partitions is None:
        partitions = max(1, min(256, n // 50_000 + 1))
    base = spark.range(0, n, 1, partitions)
    return base.mapInPandas(_gen_map, schema=IMAGE_SCHEMA)


def attach_geo(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Derive deterministic lat/lon from the numeric part of image_id.

    70% quasi-uniform via LCG; 30% (id%10<3) pulled to a metro center with
    a ±0.5° integer-LCG jitter. Pure column expressions (JVM-side) with an
    exact SQL twin for oracles (expressions.derived_*_sql).
    """
    nid = F.regexp_replace(F.col(id_col), "^img", "").cast("long")
    metro_idx = (nid % 10).cast("int")
    is_metro = nid % 10 < 3

    # jitter in millionths of a degree from an LCG, range [-500000, 500000)
    jlat = ((nid * 48271 + 11) % 1000000 - 500000).cast("double") / 1000000.0
    jlon = ((nid * 16807 + 7) % 1000000 - 500000).cast("double") / 1000000.0

    mlat = F.element_at(F.array(*[F.lit(m[0]) for m in METROS]), metro_idx % 5 + 1)
    mlon = F.element_at(F.array(*[F.lit(m[1]) for m in METROS]), metro_idx % 5 + 1)

    lat = F.when(is_metro, mlat + jlat).otherwise(derived_lat(nid))
    lon = F.when(is_metro, mlon + jlon).otherwise(derived_lon(nid))
    return images.withColumn("lat", lat).withColumn("lon", lon)


#: larger word pool for document synthesis (vocab words + suffixed variants
#: so 1M-doc corpora don't collapse into few distinct shingles)
def _doc_vocab() -> list:
    return [f"{w}{s}" for w in CAPTION_WORDS.tolist()
            for s in ("", "s", "ing", "ed", "er", "est", "ly", "ish")]


def synth_documents(spark: SparkSession, n: int, words_per_doc: int = 12,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of n text documents with KNOWN
    duplicate structure, for dedup-pipeline benches at corpus scale
    (VERDICT r4 next-round #3): every block of 5 consecutive ids holds
    one exact-duplicate pair (ids 5k, 5k+1: identical text) plus one
    near-duplicate (id 5k+2: same words except the last) — so the true
    clustering has one size-3 component per block and singletons
    elsewhere. Pure JVM column expressions of the id (no UDFs, no driver
    data): word j of doc id = vocab[(seed*A_j + B_j) mod P mod V] with
    seed = the block base for the three dup rows, id otherwise.

    Columns: doc_id long, text string."""
    if partitions is None:
        partitions = max(1, min(256, n // 100_000 + 1))
    vocab = _doc_vocab()
    varr = F.array(*[F.lit(w) for w in vocab])
    v = len(vocab)
    base = spark.range(0, n, 1, partitions).select(F.col("id").alias("doc_id"))
    in_block = F.col("doc_id") % 5
    seed = F.when(in_block < 3,
                  F.col("doc_id") - in_block).otherwise(F.col("doc_id"))
    words = []
    for j in range(words_per_doc):
        s = F.when((in_block == 2) & F.lit(j == words_per_doc - 1),
                   F.col("doc_id")).otherwise(seed)
        # word choice must be a well-mixed function of (seed, position):
        # a plain (s*a + b) % P % V LCG degenerates for small ids (the
        # product never wraps P, leaving a pure linear map whose even
        # multiplier shares factors with V — measured 3436 duplicate
        # 12-word sequences in 5000 seeds, which chained the whole corpus
        # into mega-clusters); xxhash64 is JVM-side and collision-free at
        # this scale
        words.append(F.element_at(
            varr, (F.pmod(F.xxhash64(F.lit(j), s), F.lit(v)) + 1).cast("int")))
    return base.select("doc_id", F.concat_ws(" ", *words).alias("text"))
