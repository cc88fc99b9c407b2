"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over osm2garmin_spark.queries — see that module for the
operator inventory and the oracle-matching conventions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm2garmin_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full reference pipeline
    (density scan → driver quadtree split → broadcast tile-assignment join)
    over points derived from the events table; returns per-tile counts with
    tile boundaries (map units)."""
    from pyspark.sql import functions as F
    from osm2garmin_spark.pipeline.tiling import run_tiling_pipeline

    sf_dir = "/root/testdata/sf0.001"
    pts = Q._event_points(spark, sf_dir)
    res = run_tiling_pipeline(pts, max_nodes=100, overlap=2000)
    if res is None:
        return spark.createDataFrame(
            [], "tile_id int, n_rows long, min_lat long, min_lon long, "
                "max_lat long, max_lon long")
    tiles_meta = spark.createDataFrame(
        [(t.map_id, t.min_lat, t.min_long, t.max_lat, t.max_long)
         for t in res.tiles],
        "tile_id int, min_lat long, min_lon long, max_lat long, max_lon long")
    return res.counts.join(tiles_meta, "tile_id").orderBy("tile_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """Environment-aware variant for local harnesses (check_oracle):
    drops oracles whose validity assumptions don't hold at ``sf_dir``
    (currently only ann_ivf_top3's exact-equality oracle, pinned to the
    sf0.01 flat-parquet gate environment)."""
    return Q.oracle_sql(sf_dir)
