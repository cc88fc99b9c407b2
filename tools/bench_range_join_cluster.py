"""N-vs-4N EXECUTOR scaling for the fixed-radius near-neighbor join.

The single-JVM local-mode legs (BENCH.md) plateau at ~0.70-0.75
efficiency — the refine is trig-ALU-bound and 8 threads share one heap
and memory controller. This tool runs the SAME join via spark-submit
against ``local-cluster[E, 1, mem]`` (separate executor JVMs,
single-core each per the documented oversubscription finding) at E and
4E executors, interleaved best-of-R, to measure whether executor-JVM
isolation recovers the scaling the thread-mode legs lose.

Inputs are synthesized and PERSISTED on the executors outside the
timer; the timed region is the join + count only. Pairs counts must be
identical across every leg (exactness re-checked per run).

Usage: python tools/bench_range_join_cluster.py [--n-query 100000]
           [--n-neigh 80000000] [--radius 25] [--n 2] [--xn 8]
           [--mem-mb 6144] [--repeats 2]
Child mode (internal): ... --child --cores-total K
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def child(args):
    import time
    from pyspark.sql import SparkSession, functions as F
    from osm2garmin_spark.expressions import derived_lat, derived_lon
    from osm2garmin_spark.operators.range_join import range_join_within

    spark = SparkSession.builder.appName("range-join-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cap = 70.0

    def pts(lo, hi, idname, parts):
        df = spark.range(lo, hi, 1, parts).select(
            F.col("id").alias(idname),
            derived_lat(F.col("id")).alias("lat"),
            derived_lon(F.col("id")).alias("lon"))
        return df.filter(F.abs(F.col("lat")) <= cap)

    parts = args.cores_total * 4
    q = pts(10_000_000, 10_000_000 + args.n_query, "q_id", parts).persist()
    n = pts(0, args.n_neigh, "n_id", parts).persist()
    rq, rn = q.count(), n.count()

    t0 = time.perf_counter()
    pairs = range_join_within(q, n, args.radius, max_abs_lat=cap + 0.1).count()
    wall = time.perf_counter() - t0
    print(json.dumps({"wall_sec": round(wall, 3), "pairs": pairs,
                      "rows_query": rq, "rows_neigh": rn,
                      "master": spark.sparkContext.master}))


def _zip_package() -> str:
    import zipfile
    path = os.path.join(tempfile.gettempdir(), "osm2garmin_spark.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "osm2garmin_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def _one(zip_path, execs, mem_mb, args):
    cmd = [
        SUBMIT,
        "--master", f"local-cluster[{execs},1,{mem_mb}]",
        "--py-files", zip_path,
        "--conf", f"spark.sql.shuffle.partitions={execs}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.ui.enabled=false",
        os.path.abspath(__file__), "--child",
        "--cores-total", str(execs),
        "--n-query", str(args.n_query), "--n-neigh", str(args.n_neigh),
        "--radius", str(args.radius),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=REPO, timeout=3600)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(f"[range_join_cluster] execs={execs}: no JSON; "
                         f"stderr tail:\n{out.stderr[-2000:]}\n")
        return None
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores-total", type=int, default=8)
    ap.add_argument("--n-query", type=int, default=100_000)
    ap.add_argument("--n-neigh", type=int, default=80_000_000)
    ap.add_argument("--radius", type=float, default=25.0)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--xn", type=int, default=8)
    ap.add_argument("--mem-mb", type=int, default=6144)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    zip_path = _zip_package()
    best = {}
    for _ in range(args.repeats):
        for execs in (args.xn, args.n):
            res = _one(zip_path, execs, args.mem_mb, args)
            if res is None:
                continue
            if execs not in best or res["wall_sec"] < best[execs]["wall_sec"]:
                best[execs] = res
    if args.n not in best or args.xn not in best:
        raise RuntimeError("no successful run at one level; see stderr")
    lo, hi = best[args.n], best[args.xn]
    assert lo["pairs"] == hi["pairs"], "pairs diverged across cluster sizes"
    eff = (lo["wall_sec"] / hi["wall_sec"]) / (args.xn / args.n)
    print(json.dumps({
        "date": datetime.date.today().isoformat(),
        "n_query": args.n_query, "n_neigh": args.n_neigh,
        "radius_km": args.radius, "pairs": lo["pairs"],
        f"executors[{args.n}]": lo, f"executors[{args.xn}]": hi,
        "scaling_efficiency": round(eff, 3), "target": 0.8,
    }))


if __name__ == "__main__":
    main()
