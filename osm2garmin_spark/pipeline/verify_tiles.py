"""Per-tile content verification: the north-star row invariant.

For every (image, tile) assignment, re-decode the image bytes and check
(a) content integrity — for png the decoder verifies every chunk CRC
against the stored bytes (a checksum of what's actually on disk — strictly
stronger than a re-encode roundtrip, and one decode instead of three codec
passes); for the checksum-less raw codec a decode/shape check; for the
lossy q6 codec a re-encode roundtrip with the PSNR ≥ 40 dB bound — and
(b) caption equality against the deterministic caption oracle. Aggregated
per tile into the lineage/metrics table, so a bad decode or a corrupted
partition surfaces as a failing tile row, not a silent wrong answer.

This is the engine's analogue of the reference's per-cell zip
double-checking (ContoursUpdater.java:270-326: recompute + compare total
uncompressed length before trusting a cached cell).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..operators.raster import decode_image, encode_image, psnr, LOSSLESS_FMTS

VERIFY_SCHEMA = ("tile_id int, image_id string, pixel_ok boolean, "
                 "psnr double, caption_ok boolean")


def _expected_caption(image_id: str) -> str:
    from .vocab import CAPTION_WORDS
    nid = int(image_id[3:])
    return f"photo of {CAPTION_WORDS[nid % len(CAPTION_WORDS)]} " \
           f"{CAPTION_WORDS[(nid // 7) % len(CAPTION_WORDS)]}"


def verify_assigned_tiles(assigned: DataFrame) -> DataFrame:
    """Row-level verification over the assignment output; needs columns
    tile_id, image_id, bytes, w, h, fmt, caption."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = {"tile_id": pdf["tile_id"].to_numpy(),
                   "image_id": pdf["image_id"].to_numpy(),
                   "pixel_ok": np.zeros(n, bool),
                   "psnr": np.zeros(n, float),
                   "caption_ok": np.zeros(n, bool)}
            for i in range(n):
                fmt = pdf["fmt"].iat[i]
                w, h = int(pdf["w"].iat[i]), int(pdf["h"].iat[i])
                if fmt in LOSSLESS_FMTS:
                    # png: decode_image verifies chunk CRCs against the
                    # stored bytes; raw: shape/decode check. One decode.
                    try:
                        decode_image(pdf["bytes"].iat[i], w, h, fmt)
                        out["pixel_ok"][i] = True
                    except (ValueError, NotImplementedError):
                        out["pixel_ok"][i] = False
                    out["psnr"][i] = float("inf")
                else:
                    img = decode_image(pdf["bytes"].iat[i], w, h, fmt)
                    rt = decode_image(encode_image(img, fmt), w, h, fmt)
                    p = psnr(img, rt)
                    out["psnr"][i] = p
                    out["pixel_ok"][i] = p >= 40.0
                out["caption_ok"][i] = (
                    pdf["caption"].iat[i] == _expected_caption(pdf["image_id"].iat[i]))
            yield pd.DataFrame(out)

    cols = assigned.select("tile_id", "image_id", "bytes", "w", "h", "fmt", "caption")
    return cols.mapInPandas(kernel, schema=VERIFY_SCHEMA)


def tile_verification_summary(assigned: DataFrame) -> DataFrame:
    """(tile_id, n_rows, n_pixel_ok, n_caption_ok, min_psnr) — appended to
    the lineage table as the 'verify' stage."""
    v = verify_assigned_tiles(assigned)
    return v.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("pixel_ok").cast("long")).alias("n_pixel_ok"),
        F.sum(F.col("caption_ok").cast("long")).alias("n_caption_ok"),
        F.min("psnr").alias("min_psnr"))
