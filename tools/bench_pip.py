"""Corpus-scale head-to-head of the two PIP join strategies.

Same deterministic inputs through ``pip_join`` (broadcast task-closure
polygons) and ``pip_join_partitioned`` (both sides shuffled onto the
fixed-degree grid, SHUFFLE_HASH cell equi-join) — N points x K region
polygons, per-polygon match counts compared for exact agreement. The
broadcast twin is the small-region-table baseline; the partitioned plan
is the one that survives a polygon table too large to broadcast, and
this pins its constant factor at bench scale.

Usage: python tools/bench_pip.py [n_points] [n_polys] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_polys(k: int):
    """K deterministic hexagonal regions, LCG-scattered centers, three
    sizes; vertices on exact 0.25-degree multiples."""
    shape = [(0, -8), (-4, -4), (-4, 4), (0, 8), (4, 4), (4, -4)]
    polys = []
    for i in range(k):
        clat = ((i * 48271 + 11) % 140) - 70
        clon = ((i * 16807 + 7) % 340) - 170
        scale = (i % 3 + 1) * 0.25
        polys.append((i, [(clat + dy * scale, clon + dx * scale)
                          for dy, dx in shape]))
    return polys


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else \
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F
    from osm2garmin_spark.expressions import derived_lat, derived_lon
    from osm2garmin_spark.operators.pip import pip_join, pip_join_partitioned
    from osm2garmin_spark.session import get_spark

    spark = get_spark("bench-pip", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    pts = spark.range(0, n, 1, cores * 2).select(
        F.col("id").alias("pid"),
        derived_lat(F.col("id")).alias("lat"),
        derived_lon(F.col("id")).alias("lon")).persist()
    pts.count()

    polys = make_polys(k)
    polys_df = spark.createDataFrame(
        [(pid, [float(v[0]) for v in pv], [float(v[1]) for v in pv])
         for pid, pv in polys],
        "poly_id int, vlats array<double>, vlons array<double>")

    def counts(df):
        return {r["poly_id"]: r["c"] for r in
                df.groupBy("poly_id").agg(F.count(F.lit(1)).alias("c"))
                .collect()}

    t0 = time.perf_counter()
    c_b = counts(pip_join(pts, polys))
    w_broadcast = time.perf_counter() - t0

    t0 = time.perf_counter()
    c_p = counts(pip_join_partitioned(pts, polys_df, cell_deg=4.0))
    w_partitioned = time.perf_counter() - t0

    print(json.dumps({
        "n_points": n, "n_polys": k, "cores": cores,
        "pairs": sum(c_b.values()),
        "broadcast_sec": round(w_broadcast, 3),
        "partitioned_sec": round(w_partitioned, 3),
        "pairs_per_sec_partitioned": round(sum(c_p.values())
                                           / w_partitioned, 1),
        "per_poly_counts_match": c_b == c_p,
    }))


if __name__ == "__main__":
    main()
