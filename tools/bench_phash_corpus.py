"""pHash near-dup blocking at corpus scale: the image twin of
bench_dedup_corpus.py. Generates N 64-bit fingerprints with KNOWN
near-dup structure (one planted pair with <=2 flipped bits per 10-id
block; all other hashes are splitmix64-mixed, so random hamming<=3
collisions are negligible at 64 bits), runs the pigeonhole-complete band
join + popcount refine, and prints one JSON line with hashes/sec, final
pairs, and planted-pair recall (must be 1.0 — the band blocking is
complete, not probabilistic).

Scale shape this pins: candidates only meet inside equal-band buckets.
With t=3 the four 16-bit bands are the WIDEST complete blocking a 64-bit
fingerprint allows (multi-index hashing: m = t+1 substrings), so bucket
discrimination is capped at 2^16 — false-candidate volume grows as
N^2/2^16 per band and the refine becomes the dominant cost somewhere
past ~10M rows per hash domain. Past that, the honest scale path is a
wider fingerprint (128/256-bit pHash -> 32/64-bit bands), not more bands
of the same hash; the docstring on functions/phash.py says the same.

Usage: python tools/bench_phash_corpus.py [n] [cores]
"""

import json
import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2garmin_spark.functions.phash import phash_near_pairs     # noqa: E402
from osm2garmin_spark.session import get_spark                    # noqa: E402


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        u = ids.astype(np.uint64)
        # member 9 of each 10-id block clones member 8's hash with <=2
        # bit flips (positions from the id itself) -> hamming <= 2 <= t
        is_dup = (ids % 10) == 9
        base = np.where(is_dup, u - np.uint64(1), u)
        h = _splitmix64(base)
        f1 = np.uint64(1) << ((u * np.uint64(7)) % np.uint64(64))
        f2 = np.uint64(1) << ((u * np.uint64(13)) % np.uint64(64))
        h = np.where(is_dup, h ^ f1 ^ f2, h)
        yield pd.DataFrame({"image_id": ids, "phash": h.view(np.int64)})


def _gen128(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        u = ids.astype(np.uint64)
        is_dup = (ids % 10) == 9
        base = np.where(is_dup, u - np.uint64(1), u)
        lo = _splitmix64(base)
        hi = _splitmix64(base + np.uint64(0x5851F42D4C957F2D))
        # <=2 flips at positions 0..127 spread across both halves
        p1 = (u * np.uint64(7)) % np.uint64(128)
        p2 = (u * np.uint64(13)) % np.uint64(128)
        for p in (p1, p2):
            in_lo = p < 64
            bit = np.uint64(1) << (p % np.uint64(64))
            lo = np.where(is_dup & in_lo, lo ^ bit, lo)
            hi = np.where(is_dup & ~in_lo, hi ^ bit, hi)
        yield pd.DataFrame({"image_id": ids,
                            "phash_hi": hi.view(np.int64),
                            "phash_lo": lo.view(np.int64)})


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else \
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("bench-phash-corpus", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    from pyspark.sql import functions as F

    if bits == 128:
        from osm2garmin_spark.functions.phash import phash128_near_pairs
        hashes = (spark.range(0, n, 1, cores * 2)
                  .mapInPandas(_gen128, schema="image_id long, "
                               "phash_hi long, phash_lo long")
                  .persist())
        hashes.count()
        t0 = time.perf_counter()
        pairs = phash128_near_pairs(hashes, max_hamming=3).persist()
    else:
        hashes = (spark.range(0, n, 1, cores * 2)
                  .mapInPandas(_gen, schema="image_id long, phash long")
                  .persist())
        hashes.count()
        t0 = time.perf_counter()
        pairs = phash_near_pairs(hashes, max_hamming=3).persist()
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0

    # planted recall: pair (10g+8, 10g+9) for every block g
    planted_found = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1)
        & (F.col("id_a") % 10 == 8)).count()
    n_planted = n // 10

    print(json.dumps({
        "n_hashes": n, "cores": cores, "bits": bits,
        "pairs_sec_wall": round(wall, 3),
        "hashes_per_sec": round(n / wall, 1),
        "final_pairs": n_pairs,
        "planted_pairs": n_planted,
        "planted_found": planted_found,
        "planted_recall": round(planted_found / max(n_planted, 1), 4),
        "noise_pairs": n_pairs - planted_found,
    }))


if __name__ == "__main__":
    main()
