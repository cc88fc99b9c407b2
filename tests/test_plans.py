"""Physical-plan regression guards: the scale story is the plan shape,
which — unlike wall-clock on this shared box — is deterministic. These
pin the claims made in BENCH.md/README."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.expressions import derived_lat, derived_lon

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tile_join_is_broadcast_no_fact_shuffle(spark):
    """Tile assignment: BroadcastHashJoin on the cell key; the fact side
    must reach the join without an Exchange."""
    from osm2garmin_spark.pipeline import synth_images, attach_geo
    from osm2garmin_spark.geo.area import Area
    from osm2garmin_spark.operators.tile_join import assign_points_to_tiles

    pts = attach_geo(synth_images(spark, 2000, partitions=4))
    tiles = [Area(-2_000_000, -2_000_000, 2_000_000, 2_000_000, map_id=1),
             Area(2_000_000, -2_000_000, 3_000_000, 2_000_000, map_id=2)]
    plan = _plan(assign_points_to_tiles(pts, tiles, overlap=2000))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only Exchange allowed is the broadcast of the tile-cell table
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "Broadcast" in line, f"fact-side shuffle leaked in: {line}"


def test_density_histogram_partial_aggregation(spark):
    """Density scan: partial (map-side) + final HashAggregate around ONE
    shuffle."""
    from osm2garmin_spark.split.density import density_cells

    pts = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        derived_lat(F.col("id")).alias("lat"),
        derived_lon(F.col("id")).alias("lon"))
    import re
    plan = _plan(density_cells(pts))
    assert plan.count("HashAggregate") >= 2      # partial + final
    # formatted plans list each operator twice (tree + detail) — count ids
    exchange_ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(exchange_ids) == 1


def test_scan_prunes_columns(spark):
    """A 2-column projection must reach the parquet scan as a 2-column
    ReadSchema (Catalyst column pruning — SURVEY §2.2)."""
    df = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_comment" not in read


def test_scan_pushes_filters(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .filter(F.col("l_quantity") >= 48).select("l_partkey")
    plan = _plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "l_quantity" in pushed[0]


def test_distributed_split_level_join_is_hash_not_nlj(spark):
    """The level aggregation's cells→windows association must plan as a
    BroadcastHashJoin on the block prefix (round 1 planned a
    BroadcastNestedLoopJoin: O(cells × nodes) per level)."""
    import pandas as pd
    from osm2garmin_spark.split.density import density_cells
    from osm2garmin_spark.split.distributed import _block_shift

    pts = spark.range(0, 2000).select(
        F.col("id").alias("event_id"),
        derived_lat(F.col("id")).alias("lat"),
        derived_lon(F.col("id")).alias("lon"))
    cells = density_cells(pts)
    k = _block_shift([(4096, 2048)])
    win = spark.createDataFrame(pd.DataFrame(
        [(0, bx, by, 0, 4096, 0, 2048)
         for bx in range(0, (4095 >> k) + 1)
         for by in range(0, (2047 >> k) + 1)],
        columns=["node_id", "_bx", "_by", "wx0", "wx1", "wy0", "wy1"]))
    j = (cells.withColumn("_bx", F.shiftright("cell_x", k))
         .withColumn("_by", F.shiftright("cell_y", k))
         .join(F.broadcast(win), ["_bx", "_by"])
         .filter((F.col("cell_x") >= F.col("wx0"))
                 & (F.col("cell_x") < F.col("wx1"))
                 & (F.col("cell_y") >= F.col("wy0"))
                 & (F.col("cell_y") < F.col("wy1")))
         .groupBy("node_id", "cell_x").agg(F.sum("cnt")))
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
