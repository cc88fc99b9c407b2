"""Tile naming: max-population city inside each tile bbox.

Reference: GeoNames cities loaded to a lat-sorted array, binary-search band
+ lon refine per tile, then argmax by population (geo/DefaultCityFinder.
java:39-105; Main.nameAreas:367-392). Spark shape: broadcast the tile table,
range-join cities on the bbox predicate, window argmax — the 1-D sort-refine
index is subsumed by the join + Catalyst.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..geo.area import Area
from ..expressions import map_unit


def name_tiles(cities: DataFrame, tiles: Sequence[Area],
               name_col: str = "name", pop_col: str = "population",
               lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """(tile_id, name, population) — the max-population city whose point
    lies inside the tile's raw (non-extended) bbox; ties broken by name then
    position (deterministic). Tiles containing no city are absent (the
    reference leaves them unnamed, Main.nameAreas:377-385)."""
    spark = cities.sparkSession
    tiles_df = spark.createDataFrame(
        [(t.map_id, t.min_lat, t.min_long, t.max_lat, t.max_long) for t in tiles],
        "tile_id int, t_min_lat long, t_min_lon long, t_max_lat long, t_max_lon long")
    pts = cities.withColumn("_lat_mu", map_unit(F.col(lat_col))) \
                .withColumn("_lon_mu", map_unit(F.col(lon_col)))
    j = pts.join(
        F.broadcast(tiles_df),
        (F.col("_lat_mu") >= F.col("t_min_lat")) & (F.col("_lat_mu") <= F.col("t_max_lat"))
        & (F.col("_lon_mu") >= F.col("t_min_lon")) & (F.col("_lon_mu") <= F.col("t_max_lon")))
    w = Window.partitionBy("tile_id").orderBy(
        F.col(pop_col).desc(), F.col(name_col).asc(),
        F.col("_lat_mu").asc(), F.col("_lon_mu").asc())
    return (j.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select("tile_id", F.col(name_col).alias("name"),
                     F.col(pop_col).alias("population")))
