"""End-to-end tiling pipeline (reference Main.split:147-221 re-expressed).

pass 1 (analyze): one distributed scan → density histogram → driver quadtree
pass 2 (execute): broadcast cell-join fan-out → per-tile assignment + counts

The reference re-scans the raw input once per batch of ≤255 tiles
(Main.writeAreas:400-432) because it can't keep >max-areas writers open;
one Spark shuffle-free broadcast join handles any tile count in a single
pass (SURVEY.md §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame

from ..geo.area import Area, PLANET
from ..split.density import collect_density
from ..split.quadtree import split_area
from ..operators.tile_join import assign_points_to_tiles, tile_counts

#: defaults ≙ SplitterParams.java:25,37-41 / SplitterParams overlap 34-35
DEFAULT_MAX_NODES = 1_600_000
DEFAULT_RESOLUTION = 13
DEFAULT_OVERLAP = 2000
DEFAULT_FIRST_MAP_ID = 63240001


@dataclass
class TilingResult:
    tiles: List[Area]
    assigned: DataFrame          # input cols + lat_mu/lon_mu + tile_id
    counts: DataFrame            # (tile_id, n_rows)


def run_tiling_pipeline(points: DataFrame, max_nodes: int = DEFAULT_MAX_NODES,
                        resolution: int = DEFAULT_RESOLUTION,
                        overlap: int = DEFAULT_OVERLAP,
                        lat_col: str = "lat", lon_col: str = "lon",
                        bounds: Area = PLANET,
                        first_map_id: int = DEFAULT_FIRST_MAP_ID,
                        split_strategy: str = "driver",
                        ) -> Optional[TilingResult]:
    """points (any DataFrame with degree lat/lon) → quadtree tiles +
    multi-assignment. Returns None for an empty input.

    split_strategy:
    - "driver"      (default) collect the occupied-cell table, run the
                    integer quadtree on the driver — fastest locally;
                    driver memory O(occupied cells) ≤ grid size.
    - "distributed" level-synchronous quadtree (split/distributed.py):
                    driver holds only per-node 1-D vectors; use when the
                    occupied-cell table itself is too big to collect.
    Both produce bit-identical tiles (tests/test_distributed_split.py).
    """
    if split_strategy == "distributed":
        from ..split.density import density_cells, exact_bounds
        from ..split.distributed import split_area_distributed

        exact = exact_bounds(points, lat_col, lon_col)
        if exact is None:
            return None
        cells = density_cells(points, lat_col, lon_col, resolution, bounds).persist()
        try:
            tiles = split_area_distributed(cells, exact, resolution,
                                           max_nodes, first_map_id,
                                           bounds=bounds)
        finally:
            cells.unpersist()
    else:
        grid, exact = collect_density(points, lat_col, lon_col, resolution, bounds)
        if exact is None:
            return None
        tiles = split_area(grid, exact, resolution, max_nodes, first_map_id)
    if not tiles:
        return None
    assigned = assign_points_to_tiles(points, tiles, overlap, lat_col, lon_col)
    return TilingResult(tiles=tiles, assigned=assigned,
                        counts=tile_counts(assigned))
