"""Distributed density histogram (reference splitter pass 1, analyze).

The reference streams every node through DensityMapCollector.processNode
(DensityMapCollector.java:50-56) updating a driver-local int[][] — inherently
single-node. Here the histogram is one Spark ``groupBy(cell_x, cell_y)``
with map-side partial aggregation, so the full scan is distributed and only
the tiny (≤8192×4096 at res 13, usually far smaller) cell-count table is
collected. Exact data bounds (MapDetails.java:32-49) come from the same
single scan via per-cell min/max.

addNode semantics preserved exactly (DensityMap.java:63-78): closed-bounds
containment filter, then x/y cell with the x==width / y==height clamp.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F

from ..geo.area import Area, PLANET, round_area
from ..expressions import map_unit
from .quadtree import DensityGrid


def density_cells(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
                  resolution: int = 13, bounds: Area = PLANET) -> DataFrame:
    """Per-cell node counts + per-cell exact bounds, one distributed scan.

    Returns columns: cell_x, cell_y (−1 for out-of-bounds rows), cnt,
    min_lat_mu, max_lat_mu, min_lon_mu, max_lon_mu (map units).
    """
    b = round_area(bounds, resolution)
    shift = 24 - resolution
    width = b.width >> shift
    height = b.height >> shift

    lat_mu = map_unit(F.col(lat_col))
    lon_mu = map_unit(F.col(lon_col))
    inside = (
        (lat_mu >= F.lit(b.min_lat)) & (lat_mu <= F.lit(b.max_lat))
        & (lon_mu >= F.lit(b.min_long)) & (lon_mu <= F.lit(b.max_long))
    )
    x_raw = F.shiftright(lon_mu - F.lit(b.min_long), shift)
    y_raw = F.shiftright(lat_mu - F.lit(b.min_lat), shift)
    x = F.when(x_raw >= F.lit(width), F.lit(width - 1)).otherwise(x_raw)
    y = F.when(y_raw >= F.lit(height), F.lit(height - 1)).otherwise(y_raw)

    cells = df.select(
        F.when(inside, x).otherwise(F.lit(-1)).alias("cell_x"),
        F.when(inside, y).otherwise(F.lit(-1)).alias("cell_y"),
        lat_mu.alias("lat_mu"),
        lon_mu.alias("lon_mu"),
    )
    return cells.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("lat_mu").alias("min_lat_mu"),
        F.max("lat_mu").alias("max_lat_mu"),
        F.min("lon_mu").alias("min_lon_mu"),
        F.max("lon_mu").alias("max_lon_mu"),
    )


def collect_density(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
                    resolution: int = 13, bounds: Area = PLANET,
                    ) -> Tuple[DensityGrid, Area]:
    """Run the density scan and materialize (DensityGrid, exact data Area)."""
    import numpy as np

    rows = density_cells(df, lat_col, lon_col, resolution, bounds).collect()
    grid = DensityGrid(bounds, trim=True, resolution=resolution)
    if not rows:
        return grid, None

    xs = np.array([r["cell_x"] for r in rows], dtype=np.int64)
    ys = np.array([r["cell_y"] for r in rows], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in rows], dtype=np.int64)
    ok = xs >= 0
    if ok.any():
        grid.add_counts(xs[ok], ys[ok], cnts[ok])

    min_lat = min(r["min_lat_mu"] for r in rows)
    max_lat = max(r["max_lat_mu"] for r in rows)
    min_lon = min(r["min_lon_mu"] for r in rows)
    max_lon = max(r["max_lon_mu"] for r in rows)
    exact = Area(int(min_lat), int(min_lon), int(max_lat), int(max_lon))
    return grid, exact
