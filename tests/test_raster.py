"""Raster codec + corpus invariants (BASELINE.json input_hint):
lossless roundtrip exact, lossy PSNR ≥ 40 dB, caption equality, phash
deterministic."""

import numpy as np
import pytest

from osm2garmin_spark.operators.raster import (
    decode_image, encode_image, psnr, resize_nearest, decode_stats,
)
from osm2garmin_spark.pipeline.synth import synth_images, _gen_batch


def test_raw_roundtrip_exact():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    assert (decode_image(encode_image(img, "raw"), 16, 16, "raw") == img).all()


def test_q6_psnr_above_40():
    rng = np.random.default_rng(1)
    for _ in range(5):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        dec = decode_image(encode_image(img, "q6"), 16, 16, "q6")
        assert psnr(img, dec) >= 40.0
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_and_png_dispatch_are_real():
    img = np.arange(4, dtype=np.uint8).reshape(2, 2)
    assert np.array_equal(
        decode_image(encode_image(img, "png"), 2, 2, "png"), img)
    rng = np.random.default_rng(4)
    big = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    dec = decode_image(encode_image(big, "jpeg"), 16, 16, "jpeg")
    assert psnr(big, dec) >= 40.0
    with pytest.raises(ValueError, match="metadata"):
        decode_image(encode_image(big, "jpeg"), 8, 8, "jpeg")


def test_resize_nearest():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = resize_nearest(img, 4, 4)
    assert out.shape == (4, 4)
    assert out[0, 0] == img[0, 0]


def test_gen_batch_deterministic_and_invariants():
    ids = np.arange(0, 50, dtype=np.int64)
    a = _gen_batch(ids)
    b = _gen_batch(ids)
    assert (a["phash"] == b["phash"]).all()
    assert (a["caption"] == b["caption"]).all()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    # decoded-pixel invariant per fmt
    for i in range(len(a)):
        img = decode_image(a["bytes"][i], int(a["w"][i]), int(a["h"][i]), a["fmt"][i])
        assert img.shape == (16, 16)
        if a["fmt"][i] == "q6":
            # re-encode is idempotent (stable fixture)
            assert encode_image(img, "q6") == a["bytes"][i]


def test_decode_stats_distributed(spark):
    imgs = synth_images(spark, 200, partitions=2)
    stats = decode_stats(imgs).collect()
    assert len(stats) == 200
    for r in stats:
        assert 0 <= r["p_min"] <= r["p_max"] <= 255
        assert r["psnr_vs_roundtrip"] == float("inf") or r["psnr_vs_roundtrip"] >= 40.0


def test_corpus_partition_independence(spark):
    """generation is a pure function of id — partitioning must not matter"""
    a = synth_images(spark, 300, partitions=1).select("image_id", "phash", "caption").collect()
    b = synth_images(spark, 300, partitions=7).select("image_id", "phash", "caption").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_tile_verification_summary(spark):
    from osm2garmin_spark.pipeline.synth import synth_images, attach_geo
    from osm2garmin_spark.pipeline.tiling import run_tiling_pipeline
    from osm2garmin_spark.pipeline.verify_tiles import tile_verification_summary

    corpus = attach_geo(synth_images(spark, 500, partitions=2))
    res = run_tiling_pipeline(corpus, max_nodes=200)
    summary = tile_verification_summary(res.assigned).collect()
    assert len(summary) == len(res.tiles) or len(summary) > 0
    for r in summary:
        assert r["n_pixel_ok"] == r["n_rows"], "pixel invariant violated"
        assert r["n_caption_ok"] == r["n_rows"], "caption invariant violated"
        assert r["min_psnr"] >= 40.0


def test_histogram_features_counts_and_formats(spark):
    """Histogram counts vs local numpy decode for all three formats; sum
    of bins == pixel count; bins validation."""
    import numpy as np
    import pytest
    from osm2garmin_spark.operators.raster import (decode_image,
                                                   histogram_features)
    from osm2garmin_spark.pipeline.synth import synth_images

    imgs = synth_images(spark, 90, partitions=3)
    got = {r["image_id"]: list(r["hist"])
           for r in histogram_features(imgs, bins=16).collect()}
    rows = imgs.select("image_id", "bytes", "w", "h", "fmt").collect()
    fmts_seen = set()
    for r in rows:
        img = decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        want = np.bincount(img.reshape(-1) >> 4, minlength=16).tolist()
        assert got[r["image_id"]] == want, (r["image_id"], r["fmt"])
        assert sum(want) == r["w"] * r["h"]
        fmts_seen.add(r["fmt"])
    assert fmts_seen == {"raw", "png", "q6"}
    with pytest.raises(ValueError, match="bins"):
        histogram_features(imgs, bins=10)


def test_downsample2x_exact_floor_average():
    import numpy as np
    from osm2garmin_spark.operators.raster import downsample2x

    img = np.array([[0, 1, 2, 3],
                    [4, 5, 6, 7],
                    [252, 253, 254, 255],
                    [250, 250, 251, 251]], dtype=np.uint8)
    out = downsample2x(img)
    assert out.dtype == np.uint8
    assert out.tolist() == [[(0 + 1 + 4 + 5) // 4, (2 + 3 + 6 + 7) // 4],
                            [(252 + 253 + 250 + 250) // 4,
                             (254 + 255 + 251 + 251) // 4]]


def test_downsample2x_odd_dims_crop():
    import numpy as np
    from osm2garmin_spark.operators.raster import downsample2x

    img = np.arange(15, dtype=np.uint8).reshape(3, 5)
    out = downsample2x(img)
    assert out.shape == (1, 2)  # trailing row/col cropped
    import pytest
    with pytest.raises(ValueError, match="too small"):
        downsample2x(np.zeros((1, 4), dtype=np.uint8))


def test_pyramid_stats_matches_numpy(spark):
    import numpy as np
    from osm2garmin_spark.operators.raster import (downsample2x,
                                                   pyramid_stats)
    from osm2garmin_spark.pipeline.synth import _gen_map
    from pyspark.sql import functions as F

    ids = spark.range(0, 40).select(F.col("id"))
    images = ids.mapInPandas(_gen_map, schema="image_id string, bytes binary, "
                             "w int, h int, fmt string, caption string, phash long")
    got = {(r.image_id, r.level): (r.p_min, r.p_max, r.p_sum)
           for r in pyramid_stats(images, levels=2).collect()}
    # numpy reference over the decoded full-res pixels
    from osm2garmin_spark.operators.raster import decode_image
    rows = images.select("image_id", "bytes", "w", "h", "fmt").collect()
    assert len(got) == 3 * len(rows)
    for r in rows:
        cur = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        for lv in range(3):
            assert got[(r.image_id, lv)] == (
                int(cur.min()), int(cur.max()), int(cur.astype(np.int64).sum()))
            if lv < 2:
                cur = downsample2x(cur)
