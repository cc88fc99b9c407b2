"""Driver vs distributed quadtree split at the 20M-row flagship scale
(VERDICT r4 next-round #5): both strategies produce bit-identical tiles
(tests/test_distributed_split.py); this records the WALL cost of each
and the distributed strategy's jobs-per-level so the 2-jobs-per-level
contract has a datapoint at rehearsal scale, not just in pytest.

Prints one JSON line. Usage:
    python tools/bench_split_strategies.py [rows] [cores]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2garmin_spark.pipeline.synth import attach_geo, synth_images  # noqa: E402
from osm2garmin_spark.pipeline.tiling import run_tiling_pipeline      # noqa: E402
from osm2garmin_spark.session import get_spark                        # noqa: E402

MAX_NODES = 100_000
RESOLUTION = 11


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else \
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-split-strategies", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    sc = spark.sparkContext

    # geo columns only — the quadtree split consumes lat/lon; synthesizing
    # image bytes for 20M rows would swamp the measurement with encode
    # cost that both strategies share identically
    corpus = attach_geo(synth_images(spark, rows, partitions=cores * 4)) \
        .select("image_id", "lat", "lon")

    out = {"metric": "split_strategy_20m", "rows": rows, "cores": cores}
    tiles_by = {}
    for strategy in ("driver", "distributed"):
        t0 = time.perf_counter()
        jobs0 = sc.statusTracker().getJobIdsForGroup(None)
        res = run_tiling_pipeline(corpus, max_nodes=MAX_NODES,
                                  resolution=RESOLUTION,
                                  split_strategy=strategy)
        n_assigned = res.assigned.count()
        wall = time.perf_counter() - t0
        tiles_by[strategy] = [(t.map_id, t.min_lat, t.min_long,
                               t.max_lat, t.max_long) for t in res.tiles]
        out[strategy] = {
            "wall_sec": round(wall, 2),
            "n_tiles": len(res.tiles),
            "assigned_rows": n_assigned,
            "assignments_per_sec": round(n_assigned / wall, 1),
        }

    out["tiles_bit_identical"] = tiles_by["driver"] == tiles_by["distributed"]

    # jobs-per-level contract: rerun ONLY the distributed split (no
    # assignment) and count Spark jobs; the level-synchronous algorithm
    # runs 2 jobs per level (split-decision agg + child-density agg)
    # plus constant setup jobs
    from osm2garmin_spark.split.density import density_cells, exact_bounds
    from osm2garmin_spark.split.distributed import split_area_distributed
    from osm2garmin_spark.geo.area import PLANET

    exact = exact_bounds(corpus, "lat", "lon")
    cells = density_cells(corpus, "lat", "lon", RESOLUTION, PLANET).persist()
    cells.count()
    n_jobs0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    sstats: dict = {}
    tiles = split_area_distributed(cells, exact, RESOLUTION, MAX_NODES,
                                   bounds=PLANET, stats=sstats)
    n_jobs1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    cells.unpersist()
    n_levels = max(sstats.get("levels", 1), 1)
    out["distributed_split_only"] = {
        "n_tiles": len(tiles),
        "spark_jobs": n_jobs1 - n_jobs0,
        "levels": n_levels,
        "jobs_per_level": round((n_jobs1 - n_jobs0) / n_levels, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
