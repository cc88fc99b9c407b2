"""Tile pyramid rollup: per-level equality with direct-from-raw
computation (the floor-shift identity), clamp edges, weight sums,
single-raw-shuffle plan shape."""

import pytest
from pyspark.sql import Row, functions as F

from osm2garmin_spark.geo.webmercator import slippy_x_col, slippy_y_col
from osm2garmin_spark.operators.pyramid import tile_pyramid


def _pts(spark, coords):
    return spark.createDataFrame(
        [Row(pid=i, lat=float(a), lon=float(o), w=float(i % 7))
         for i, (a, o) in enumerate(coords)])


def _direct(df, zoom):
    return (df.groupBy(slippy_x_col(F.col("lon"), zoom).alias("x"),
                       slippy_y_col(F.col("lat"), zoom).alias("y"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("wsum")))


def _coords(rng, k):
    out = []
    for _ in range(k):
        out.append((rng.uniform(-90, 90), rng.uniform(-180, 180)))
    # clamp/edge band: beyond the Mercator cap, the poles, the dateline
    out += [(89.9, 10.0), (-89.9, 10.0), (85.06, 0.0), (-85.06, 0.0),
            (0.0, -180.0), (0.0, 179.9999), (0.0, 180.0)]
    return out


def test_rollup_matches_direct_every_level(spark):
    import random
    df = _pts(spark, _coords(random.Random(7), 400))
    pyr = tile_pyramid(df, "lat", "lon", base_zoom=8, min_zoom=3,
                       weight_col="w")
    rows = pyr.collect()
    for z in range(3, 9):
        got = {(r.x, r.y): (r.n, round(r.wsum, 6))
               for r in rows if r.zoom == z}
        want = {(r.x, r.y): (r.n, round(r.wsum, 6))
                for r in _direct(df, z).collect()}
        assert got == want, f"zoom {z}"


def test_counts_conserved_per_level(spark):
    import random
    df = _pts(spark, _coords(random.Random(11), 300))
    total = df.count()
    pyr = tile_pyramid(df, "lat", "lon", base_zoom=6, min_zoom=2)
    per_level = {r.zoom: r.total for r in
                 pyr.groupBy("zoom").agg(F.sum("n").alias("total")).collect()}
    assert per_level == {z: total for z in range(2, 7)}


def test_without_weight_col(spark):
    df = _pts(spark, [(10.0, 20.0), (10.0, 20.0), (-40.0, 100.0)])
    pyr = tile_pyramid(df, "lat", "lon", base_zoom=4, min_zoom=4)
    assert pyr.columns == ["zoom", "x", "y", "n"]
    assert sum(r.n for r in pyr.collect()) == 3


def test_zoom_validation(spark):
    df = _pts(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError, match="min_zoom"):
        tile_pyramid(df, "lat", "lon", base_zoom=4, min_zoom=5)
    with pytest.raises(ValueError, match="min_zoom"):
        tile_pyramid(df, "lat", "lon", base_zoom=4, min_zoom=0)


def test_plan_reuses_every_level_exchange(spark):
    """The raw points are aggregated ONCE: each union branch below the
    base level consumes the previous level's exchange via Spark's
    exchange-reuse rule, so the executed plan must contain exactly
    levels-1 ReusedExchange nodes (z=9 reuses the z=10 agg exchange,
    z=8 reuses z=9's). Without reuse the plan would re-shuffle the raw
    scan once per level — the cost this operator exists to avoid."""
    df = _pts(spark, [(1.0, 2.0)] * 10)
    pyr = tile_pyramid(df, "lat", "lon", base_zoom=10, min_zoom=7)
    pyr.collect()  # executed plan (AQE finalizes reuse at runtime)
    plan = pyr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") == 3


def test_pyramid_small_image_emits_existing_levels(spark):
    # ADVICE r6: a 1-pixel image must not fail the job; it emits level 0
    # only, while normal images still emit every requested level
    import pandas as pd
    from osm2garmin_spark.operators.raster import pyramid_stats
    rows = [("tiny", bytes([7]), 1, 1, "raw"),
            ("ok", bytes(range(16)), 4, 4, "raw")]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = {(r.image_id, r.level): (r.p_min, r.p_max, r.p_sum)
           for r in pyramid_stats(df, levels=2).collect()}
    assert ("tiny", 0) in out and ("tiny", 1) not in out
    assert ("ok", 0) in out and ("ok", 1) in out and ("ok", 2) in out
    assert out[("tiny", 0)] == (7, 7, 7)
