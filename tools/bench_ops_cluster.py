"""Thread-JVM vs executor-JVM legs for the ALU-heavy operators.

Round 5 measured the 2.1x heap/GC-isolation win (8 single-core executor
JVMs vs 8 threads in one JVM) for the range join only; this tool runs
the OTHER trig/bit-ALU-heavy operators through the same spark-submit +
local-cluster packaging to test whether the deployment guidance
("ALU-bound refines want executor-JVM parallelism, not in-JVM threads")
generalizes (VERDICT r5 "Next round" #6).

Ops (same inputs as their bench.py / gate-query twins):

- ``knn_hex``    — knn_hex_kring, 100k queries x 600k neighbors, res 4
- ``knn_strat``  — gate query knn_stratified_customers_events at --sf-dir
- ``phash``      — gate query phash_dedup_clusters at --sf-dir

Each leg reports wall seconds, the output row count, and an
order-independent digest (sum of xxhash64 over every output column), so
bit-identity across execution modes is checked, not assumed. Inputs are
synthesized/persisted (or parquet-scanned) outside the timed region.

Usage: python tools/bench_ops_cluster.py [--ops knn_hex,knn_strat,phash]
           [--threads 8] [--execs 8] [--mem-mb 6144] [--repeats 2]
           [--sf-dir /root/testdata/sf0.1]
Child mode (internal): ... --child --op NAME --cores-total K
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


def _digest(df):
    from pyspark.sql import functions as F
    cols = [F.col(c) for c in df.columns]
    # decimal(38,0) sum: order-independent and immune to the ANSI-mode
    # long-overflow a plain sum of 64-bit hashes hits
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("digest")
    ).collect()[0]
    return int(row["n"]), int(row["digest"] or 0)


def child(args):
    import time

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName(f"ops-cluster-{args.op}") \
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    parts = args.cores_total * 4

    if args.op == "knn_hex":
        from osm2garmin_spark.expressions import derived_lat, derived_lon
        from osm2garmin_spark.operators.knn_hex import knn_hex_kring
        neigh = spark.range(0, 600_000, 1, parts).select(
            F.col("id").alias("n_id"),
            derived_lat(F.col("id")).alias("n_lat"),
            derived_lon(F.col("id")).alias("n_lon")).persist()
        qpts = spark.range(600_000, 700_000, 1, parts).select(
            F.col("id").alias("q_id"),
            derived_lat(F.col("id")).alias("q_lat"),
            derived_lon(F.col("id")).alias("q_lon")).persist()
        neigh.count(); qpts.count()
        t0 = time.perf_counter()
        n, dig = _digest(knn_hex_kring(qpts, neigh, k=3, res=4))
        wall = time.perf_counter() - t0
    else:
        import osm2garmin_spark.queries as Q
        name = {"knn_strat": "knn_stratified_customers_events",
                "phash": "phash_dedup_clusters"}[args.op]
        fn = Q.queries()[name]
        t0 = time.perf_counter()
        n, dig = _digest(fn(spark, args.sf_dir))
        wall = time.perf_counter() - t0
    print(json.dumps({"op": args.op, "wall_sec": round(wall, 3),
                      "rows": n, "digest": dig,
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


def _one(zip_path: str, master: str, cores_total: int, op: str,
         sf_dir: str) -> dict | None:
    cmd = [
        SUBMIT,
        "--master", master,
        "--py-files", zip_path,
        "--conf", f"spark.sql.shuffle.partitions={cores_total}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.ui.enabled=false",
        os.path.abspath(__file__),
        "--child", "--op", op, "--cores-total", str(cores_total),
        "--sf-dir", sf_dir,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=3600)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(f"[bench_ops_cluster] {op} @ {master} produced no "
                         f"JSON; stderr tail:\n{out.stderr[-2000:]}\n")
        return None
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--op", default=None)
    ap.add_argument("--cores-total", type=int, default=8)
    ap.add_argument("--ops", default="knn_hex,knn_strat,phash")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--execs", type=int, default=8)
    ap.add_argument("--mem-mb", type=int, default=6144)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    zip_path = _zip_package()
    masters = {
        "threads": (f"local[{args.threads}]", args.threads),
        "executors": (f"local-cluster[{args.execs},1,{args.mem_mb}]",
                      args.execs),
    }
    report = {"date": datetime.date.today().isoformat(),
              "sf_dir": args.sf_dir, "ops": {}}
    for op in args.ops.split(","):
        best: dict[str, dict] = {}
        for _ in range(args.repeats):
            for mode, (master, cores) in masters.items():
                res = _one(zip_path, master, cores, op, args.sf_dir)
                if res is None:
                    continue
                if mode not in best or res["wall_sec"] < best[mode]["wall_sec"]:
                    best[mode] = res
        if "threads" not in best or "executors" not in best:
            raise RuntimeError(f"op {op}: a mode produced no result")
        t, e = best["threads"], best["executors"]
        identical = (t["rows"] == e["rows"] and t["digest"] == e["digest"])
        report["ops"][op] = {
            "threads_wall_sec": t["wall_sec"],
            "executors_wall_sec": e["wall_sec"],
            "jvm_isolation_speedup": round(t["wall_sec"] / e["wall_sec"], 3),
            "rows": t["rows"], "results_identical": identical,
        }
        print(json.dumps({op: report["ops"][op]}), flush=True)
        if not identical:
            raise SystemExit(f"op {op}: thread/executor results DIFFER: "
                             f"{t} vs {e}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
