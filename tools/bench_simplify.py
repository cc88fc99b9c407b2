"""Corpus-scale bench of the batched effective-area decimation.

N vertices across W ways, K passes — pins that (a) the whole K-pass
pipeline costs ONE shuffle (jobs and exchange count independent of K),
and (b) wall grows linearly in N (each pass is a window scan). Vertices
are LCG-scattered map-unit coordinates, eps2 chosen so a planet-scale
random track drops roughly half its vertices over 3 passes (the same
constant as the gate query).

Usage: python tools/bench_simplify.py [n_vertices] [n_ways] [passes] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS2 = 10_000_000_000_000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else \
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F
    from osm2garmin_spark.expressions import derived_lat, derived_lon, map_unit
    from osm2garmin_spark.operators.simplify import simplify_polylines
    from osm2garmin_spark.session import get_spark

    spark = get_spark("bench-simplify", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    base = spark.range(0, n, 1, cores * 4).select(
        (F.col("id") % w).alias("way_id"),
        F.col("id").alias("seq"),
        map_unit(derived_lon(F.col("id"))).alias("lon_mu"),
        map_unit(derived_lat(F.col("id"))).alias("lat_mu")).persist()
    rows = base.count()

    out = {"n_vertices": rows, "n_ways": w, "passes": passes,
           "cores": cores, "eps2": EPS2}
    t0 = time.perf_counter()
    kept = simplify_polylines(base, EPS2, passes=passes).count()
    out["wall_sec"] = round(time.perf_counter() - t0, 3)
    out["kept"] = kept
    out["kept_frac"] = round(kept / rows, 4)
    out["vertices_per_sec"] = round(rows / out["wall_sec"], 1)

    import io, contextlib, re
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        simplify_polylines(base, EPS2, passes=passes).explain("formatted")
    out["n_exchanges"] = len(set(re.findall(r"\((\d+)\) Exchange",
                                            buf.getvalue())))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
