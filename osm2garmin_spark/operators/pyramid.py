"""Web-Mercator tile pyramid rollup: per-tile aggregates at every zoom
level, raw data scanned and shuffled exactly ONCE.

The map-tiling twin of a TimescaleDB-style hierarchical rollup (and of
a tile server's pyramid build): points aggregate at the FINEST zoom,
then every coarser level is computed from the PREVIOUS LEVEL's
aggregates via the XYZ parent identity ``parent = (x >> 1, y >> 1)`` —
exact because both slippy axes are ``floor(f * 2^z)`` of a
zoom-independent fraction ``f in [0, 1)``, and
``floor(floor(f * 2^z) / 2) = floor(f * 2^(z-1))`` (the y-axis clamp to
``2^z - 1`` commutes with the shift: ``(2^z - 1) >> 1 = 2^(z-1) - 1``).

Scale shape: one shuffle of the points on the base-zoom tile key; each
coarser level shuffles only the PREVIOUS level's aggregate rows (<=
distinct tiles, collapsing 4:1 per level), so total shuffle volume is
|points| + |tiles_base| * 4/3 — at 10^12 points and z=12 that second
term is <= 2.2e7 rows, noise. The naive per-zoom-from-raw plan shuffles
|points| * levels. Only algebraic aggregates roll up (count/sum/min/
max); exact distinct does not — use a sketch column for that.

Reference parity: the reference renders fixed-zoom Garmin tiles only;
the pyramid is the engine-extension path for the multi-resolution web
map a 100 TB corpus browser needs (SURVEY §2.12).
"""

from __future__ import annotations

from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..geo.webmercator import slippy_x_col, slippy_y_col


def tile_pyramid(points: DataFrame, lat_col: str, lon_col: str,
                 base_zoom: int, min_zoom: int,
                 weight_col: Optional[str] = None) -> DataFrame:
    """(zoom, x, y, n[, wsum]) for every non-empty tile at every zoom in
    [min_zoom, base_zoom]. ``n`` counts points; ``wsum`` (present iff
    ``weight_col``) sums a measure — both roll up exactly."""
    if not 1 <= min_zoom <= base_zoom:
        raise ValueError(
            f"need 1 <= min_zoom <= base_zoom, got {min_zoom}..{base_zoom}")

    aggs = [F.count(F.lit(1)).alias("n")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("wsum"))
    level = (points
             .groupBy(slippy_x_col(F.col(lon_col), base_zoom).alias("x"),
                      slippy_y_col(F.col(lat_col), base_zoom).alias("y"))
             .agg(*aggs)
             .withColumn("zoom", F.lit(base_zoom)))

    roll = [F.sum("n").alias("n")]
    if weight_col is not None:
        roll.append(F.sum("wsum").alias("wsum"))
    levels = [level]
    for z in range(base_zoom - 1, min_zoom - 1, -1):
        level = (level
                 .groupBy(F.shiftright("x", 1).alias("x"),
                          F.shiftright("y", 1).alias("y"))
                 .agg(*roll)
                 .withColumn("zoom", F.lit(z)))
        levels.append(level)
    cols = ["zoom", "x", "y", "n"] + (["wsum"] if weight_col else [])
    return reduce(DataFrame.unionByName,
                  [lv.select(*cols) for lv in levels])
