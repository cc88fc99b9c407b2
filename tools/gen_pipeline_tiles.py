"""Regenerate queries._SF001_PIPE_TILES — the pinned deterministic quadtree
tile set backing the tiling_pipeline_counts oracle.

Run after any change to the quadtree split or the sf0.01 events testdata:

    python tools/gen_pipeline_tiles.py [sf_dir]

and paste the printed literal over _SF001_PIPE_TILES in
osm2garmin_spark/queries.py. Only the tile STRUCTURE is pinned; the DuckDB
oracle recomputes every per-tile count independently from the events table.
"""

import sys

sys.path.insert(0, ".")

from osm2garmin_spark.session import get_spark  # noqa: E402
from osm2garmin_spark import queries as Q  # noqa: E402
from osm2garmin_spark.pipeline import run_tiling_pipeline  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("gen-pipeline-tiles", master="local[8]",
                      shuffle_partitions=8)
    pts = Q._event_points(spark, sf_dir)
    res = run_tiling_pipeline(pts, max_nodes=200, overlap=Q._OVERLAP)
    print("_SF001_PIPE_TILES = [")
    line = "    "
    for t in res.tiles:
        frag = (f"({t.map_id}, {t.min_lat}, {t.min_long}, "
                f"{t.max_lat}, {t.max_long}), ")
        if len(line) + len(frag) > 78:
            print(line.rstrip())
            line = "    "
        line += frag
    print(line.rstrip().rstrip(","))
    print("]")


if __name__ == "__main__":
    main()
