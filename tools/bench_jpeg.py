"""JPEG decode throughput datapoint (VERDICT r3 #2): decode large
grayscale rasters through operators/jpeg.py and print Mpx/s per size.

The round-3 decoder shifted one segment-sized big integer per bit read
(O(bits^2)) and walked a Python object per symbol; round 4 vectorizes
the bitstream pass (48-bit window table + flat-LUT chain follow) and
batches the IDCT through BLAS matmul. Usage: python tools/bench_jpeg.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2garmin_spark.operators.jpeg import encode_jpeg, decode_jpeg  # noqa: E402


def main():
    rng = np.random.default_rng(5)
    for size in (256, 512, 1201):       # 1201 = one full SRTM3 raster
        x = np.linspace(0, 6, size)
        img = ((np.sin(x)[:, None] * np.cos(x)[None, :] * 0.5 + 0.5)
               * 255).astype(np.uint8)
        img = np.clip(img.astype(int) + rng.integers(-8, 8, img.shape),
                      0, 255).astype(np.uint8)
        b = encode_jpeg(img, quality=90)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = decode_jpeg(b)
            ts.append(time.perf_counter() - t0)
        assert out.shape == (size, size)
        t = min(ts)
        print(f"{size}x{size}: {len(b)} bytes, decode best-of-5 "
              f"{t*1000:.1f} ms = {size*size/t/1e6:.2f} Mpx/s")

    # round-5 chunked decode: restart interval = one MCU row of the
    # 1201^2 SRTM cell -> 151 independent restart segments; decode them
    # sequentially and over a fork pool (the T.81 parallel-decode unit)
    size = 1201
    mcu_row = (size + 7) // 8
    b = encode_jpeg(img, quality=90, restart_interval=mcu_row)
    ref = decode_jpeg(b)
    for workers in (0, 4, 8):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = decode_jpeg(b, workers=workers)
            ts.append(time.perf_counter() - t0)
        assert np.array_equal(out, ref)
        t = min(ts)
        label = "sequential" if workers < 2 else f"{workers} workers"
        print(f"{size}x{size} DRI={mcu_row} ({mcu_row} segments, "
              f"{len(b)} bytes), {label}: {t*1000:.1f} ms "
              f"= {size*size/t/1e6:.2f} Mpx/s")


if __name__ == "__main__":
    main()
