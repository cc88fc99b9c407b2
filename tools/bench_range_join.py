"""Corpus-scale bench of the fixed-radius near-neighbor join.

N query points x M neighbor points within R km through
``range_join_within`` (grid blocking + haversine refine). The brute
force is N*M pairs — unrunnable at this scale, which is the point; the
gate query's oracle already proved the blocking exact at 15M pairs.
This pins the blocked plan's constant factor and prints the candidate
ratio (pairs surviving the cell join / output pairs) so cell-size
regressions are visible. A second leg plants a 100x hot cell on the
query side to show the skew behavior of the cell-key shuffle (AQE
skew-split handles the hash join; the hot cell inflates only its own
partition).

Usage: python tools/bench_range_join.py [n_query] [n_neigh] [radius_km] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    nn = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    r_km = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else \
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F
    from osm2garmin_spark.expressions import derived_lat, derived_lon
    from osm2garmin_spark.operators.range_join import range_join_within
    from osm2garmin_spark.session import get_spark

    spark = get_spark("bench-range-join", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    cap = 70.0

    def pts(lo, hi, idname):
        df = spark.range(lo, hi).select(
            F.col("id").alias(idname),
            derived_lat(F.col("id")).alias("lat"),
            derived_lon(F.col("id")).alias("lon"))
        return df.filter(F.abs(F.col("lat")) <= cap)

    out = {"n_query": nq, "n_neigh": nn, "radius_km": r_km, "cores": cores}

    q = pts(10_000_000, 10_000_000 + nq, "q_id").persist()
    n = pts(0, nn, "n_id").persist()
    out["rows_query"] = q.count()
    out["rows_neigh"] = n.count()

    # --parquet: materialize once and time the operator READING the
    # corpus (the production shape — a scan-fed join), instead of paying
    # the synthetic LCG generator inside the timed region. The generator
    # is pure ALU on shared memory bandwidth, which scales sublinearly
    # in one JVM and is not the operator under test.
    if os.environ.get("RANGE_BENCH_PARQUET"):
        d = os.environ["RANGE_BENCH_PARQUET"]
        if not os.path.exists(os.path.join(d, "neigh", "_SUCCESS")):
            q.write.mode("overwrite").parquet(os.path.join(d, "query"))
            n.write.mode("overwrite").parquet(os.path.join(d, "neigh"))
        q.unpersist(); n.unpersist()
        q = spark.read.parquet(os.path.join(d, "query"))
        n = spark.read.parquet(os.path.join(d, "neigh"))
        out["input"] = "parquet"

    t0 = time.perf_counter()
    pairs = range_join_within(q, n, r_km, max_abs_lat=cap + 0.1)
    out["pairs"] = pairs.count()
    out["wall_sec"] = round(time.perf_counter() - t0, 3)
    out["pairs_per_sec"] = round(out["pairs"] / out["wall_sec"], 1)

    # candidate volume: the cell join WITHOUT the haversine residual
    # (same plan upstream) — the blocking selectivity the refine pays for
    t0 = time.perf_counter()
    from osm2garmin_spark.operators.range_join import _cell_sizes_deg
    import math
    cell_lat, cell_lon = _cell_sizes_deg(r_km, cap + 0.1)
    # mirror the operator's UNIFORM ring (floor + scaled index; see
    # range_join.py — ceil left a narrow seam cell)
    n_x = max(3, int(math.floor(360.0 / cell_lon)))
    _ix = F.floor((F.col("lon") + F.lit(180.0)) * F.lit(float(n_x))
                  / F.lit(360.0))
    qk = q.withColumn("_ix", F.pmod(_ix, F.lit(n_x))) \
        .withColumn("_iy", F.floor((F.col("lat") + F.lit(90.0)) / F.lit(cell_lat)))
    qk = qk.select("q_id", "_ix", "_iy",
                   F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("_dx"))
    qk = qk.select("q_id", "_iy", F.pmod(F.col("_ix") + F.col("_dx"),
                                         F.lit(n_x)).alias("_ix"),
                   F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("_dy"))
    qk = qk.select("q_id", "_ix", (F.col("_iy") + F.col("_dy")).alias("_iy"))
    nk = n.withColumn("_ix", F.pmod(_ix, F.lit(n_x))) \
        .withColumn("_iy", F.floor((F.col("lat") + F.lit(90.0)) / F.lit(cell_lat)))
    out["candidates"] = qk.join(nk, on=["_ix", "_iy"]).count()
    out["candidate_scan_sec"] = round(time.perf_counter() - t0, 3)
    out["refine_selectivity"] = round(out["pairs"] / max(out["candidates"], 1), 4)

    # skew leg: all queries duplicated into one metro cell (100x density)
    hot = q.limit(max(nq // 10, 1)).select(
        "q_id", (F.lit(40.7) + (F.col("q_id") % 1000) * 1e-5).alias("lat"),
        (F.lit(-74.0) + (F.col("q_id") % 997) * 1e-5).alias("lon"))
    qskew = q.unionByName(hot)
    t0 = time.perf_counter()
    out["skew_pairs"] = range_join_within(qskew, n, r_km,
                                          max_abs_lat=cap + 0.1).count()
    out["skew_wall_sec"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
