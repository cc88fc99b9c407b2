"""Vector->raster bridge (operators/rasterize.py): pixel-rect algebra,
boundary flags, and the two-sided bridge invariant against the
assignment join (the reference's testNeeded discipline)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from osm2garmin_spark.geo.area import Area
from osm2garmin_spark.geo.cells import ORIGIN_LAT, ORIGIN_LON
from osm2garmin_spark.operators.rasterize import rasterize_tiles, pixel_of

TILES = [
    Area(-400000, -800000, 0, 0, map_id=1),
    Area(0, -800000, 400000, 0, map_id=2),
    Area(-50000, -50000, 50000, 50000, map_id=3),   # overlaps 1 and 2
]
SHIFT = 14
OV = 2000


def test_pixel_rect_counts_and_boundary(spark):
    r = rasterize_tiles(spark, TILES, shift=SHIFT, overlap=OV)
    pdf = r.toPandas()
    for t in TILES:
        py0 = (t.min_lat - OV - ORIGIN_LAT) >> SHIFT
        py1 = (t.max_lat + OV - ORIGIN_LAT) >> SHIFT
        px0 = (t.min_long - OV - ORIGIN_LON) >> SHIFT
        px1 = (t.max_long + OV - ORIGIN_LON) >> SHIFT
        sub = pdf[pdf.tile_id == t.map_id]
        assert len(sub) == (py1 - py0 + 1) * (px1 - px0 + 1)
        nb = ((py1 - py0 + 1) * (px1 - px0 + 1)
              - max(py1 - py0 - 1, 0) * max(px1 - px0 - 1, 0))
        assert int(sub.boundary.sum()) == nb
        # every painted pixel's range intersects the extended bounds
        assert (sub.py.min(), sub.py.max()) == (py0, py1)
        assert (sub.px.min(), sub.px.max()) == (px0, px1)
    # boundary_only is the filtered same set
    b = rasterize_tiles(spark, TILES, shift=SHIFT, overlap=OV,
                        boundary_only=True).toPandas()
    assert len(b) == int(pdf.boundary.sum())


def test_bridge_invariant_vs_assignment_join(spark):
    """tile assigned => point's pixel painted; point's pixel interior
    => tile assigned.  Exactly the writer-grid contract
    (SplitProcessor.java:430-501: testNeeded=false cells skip the exact
    bbox test)."""
    from osm2garmin_spark.operators.tile_join import assign_points_to_tiles

    rng = np.random.default_rng(31)
    n = 4000
    lat_mu = rng.integers(-600000, 600000, n)
    lon_mu = rng.integers(-1000000, 200000, n)
    # degrees that round-trip exactly through map_unit's nudge+truncate
    k = 360.0 / (1 << 24)
    pts = spark.createDataFrame(pd.DataFrame({
        "image_id": [f"p{i}" for i in range(n)],
        "lat": lat_mu * k, "lon": lon_mu * k,
        "lat_mu": lat_mu, "lon_mu": lon_mu}))
    assigned = assign_points_to_tiles(
        pts.select("image_id", "lat", "lon"), TILES, overlap=OV) \
        .select("image_id", "tile_id", "lat_mu", "lon_mu").toPandas()
    # the join's derived map units must equal the intended integers
    mu = {r.image_id: (r.lat_mu, r.lon_mu) for r in
          pts.select("image_id", "lat_mu", "lon_mu").toPandas().itertuples()}
    for r in assigned.itertuples():
        assert (r.lat_mu, r.lon_mu) == mu[r.image_id]
    got = {(r.image_id, r.tile_id) for r in assigned.itertuples()}

    raster = rasterize_tiles(spark, TILES, shift=SHIFT, overlap=OV) \
        .toPandas()
    painted = {(r.tile_id, r.py, r.px) for r in raster.itertuples()}
    interior = {(r.tile_id, r.py, r.px) for r in raster.itertuples()
                if not r.boundary}

    py, px = pixel_of(F.col("lat_mu"), F.col("lon_mu"), SHIFT)
    pix = pts.select("image_id", py.alias("py"), px.alias("px")).toPandas()
    ppix = {r.image_id: (r.py, r.px) for r in pix.itertuples()}

    for t in TILES:
        for img, (qy, qx) in ppix.items():
            if (img, t.map_id) in got:
                assert (t.map_id, qy, qx) in painted, (img, t.map_id)
            if (t.map_id, qy, qx) in interior:
                assert (img, t.map_id) in got, (img, t.map_id)
    # the invariant is non-vacuous: points in interior pixels AND
    # points assigned via boundary pixels both occur
    n_int = sum((t.map_id, *ppix[i]) in interior
                for t in TILES for i in ppix)
    assert n_int > 100
    n_bnd = sum((i, t.map_id) in got
                and (t.map_id, *ppix[i]) not in interior
                for t in TILES for i in ppix)
    assert n_bnd > 0


def test_degenerate_tiles(spark):
    # strictly inside one pixel -> exactly one (boundary) pixel
    tiny = [Area(100, 100, 200, 200, map_id=9)]
    r = rasterize_tiles(spark, tiny, shift=SHIFT).toPandas()
    assert len(r) == 1 and bool(r.boundary.iloc[0])
    # straddling the origin pixel corner -> 2x2, all boundary
    straddle = [Area(-10, -10, 10, 10, map_id=10)]
    r2 = rasterize_tiles(spark, straddle, shift=SHIFT).toPandas()
    assert len(r2) == 4 and r2.boundary.all()
