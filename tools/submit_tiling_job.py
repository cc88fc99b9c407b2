"""spark-submit entry point for the tiling pipeline (north_rule packaging).

Usage (local sandbox stands in for the cluster):

    cd /root/repo && zip -qr /tmp/osm2garmin_spark.zip osm2garmin_spark
    spark-submit --master local[8] \
        --py-files /tmp/osm2garmin_spark.zip \
        tools/submit_tiling_job.py --rows 100000 --out /tmp/tiling_out

On a real cluster only --master changes. The job is the resumable pipeline:
synth corpus → density → quadtree → salted partitioned write + lineage;
re-submitting with the same --out resumes (completed tiles skipped).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# under spark-submit the package arrives via --py-files; for direct
# `python tools/submit_tiling_job.py` runs, fall back to the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-nodes", type=int, default=100_000)
    ap.add_argument("--resolution", type=int, default=13)
    ap.add_argument("--run-id", default="submit")
    ap.add_argument("--bench", action="store_true",
                    help="time the run and report assignments/sec "
                         "(assignments summed from the committed lineage)")
    ap.add_argument("--verify", action="store_true",
                    help="bench the compute-dominated pipeline instead of "
                         "the persisted write: density -> quadtree -> "
                         "assignment join -> per-row decode verification "
                         "(PSNR + caption), corpus persisted outside the "
                         "timer — the scaling-efficiency work shape, where "
                         "wall measures the engine, not this VM's disk")
    args = ap.parse_args()

    # spark-submit provides the session; fall back to local for direct runs
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("osm2garmin-tiling").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osm2garmin_spark.pipeline.synth import synth_images, attach_geo
    from osm2garmin_spark.pipeline.lineage import (LineageStore,
                                                   run_tiling_resumable)

    corpus = attach_geo(synth_images(spark, args.rows))

    if args.verify:
        from pyspark.sql import functions as F
        from osm2garmin_spark.pipeline.tiling import run_tiling_pipeline
        from osm2garmin_spark.pipeline.verify_tiles import \
            tile_verification_summary
        corpus = corpus.persist()
        corpus.count()                       # generation outside the timer
        t0 = time.perf_counter()
        res = run_tiling_pipeline(corpus, max_nodes=args.max_nodes,
                                  resolution=args.resolution)
        plan_sec = time.perf_counter() - t0
        agg = tile_verification_summary(res.assigned).agg(
            F.sum("n_rows").alias("n"),
            F.sum("n_pixel_ok").alias("ok")).collect()[0]
        wall = time.perf_counter() - t0
        print(json.dumps({
            "job": "tiling-verified", "tiles": len(res.tiles),
            "wall_sec": round(wall, 3),
            "phase_plan_sec": round(plan_sec, 3),
            "phase_verify_sec": round(wall - plan_sec, 3),
            "assignments": int(agg["n"]), "verified_ok": int(agg["ok"]),
            "assignments_per_sec": round(agg["n"] / wall, 1),
            "master": spark.sparkContext.master,
            "default_parallelism": spark.sparkContext.defaultParallelism,
        }))
        spark.stop()
        return

    t0 = time.perf_counter()
    stats = run_tiling_resumable(
        corpus, args.out, max_nodes=args.max_nodes,
        resolution=args.resolution, id_col="image_id", run_id=args.run_id)
    wall = time.perf_counter() - t0
    if args.bench:
        from pyspark.sql import functions as F
        lineage = LineageStore(args.out).read(spark)
        assigned = lineage.filter(F.col("stage") == "assign") \
            .agg(F.sum("n_rows").alias("s")).collect()[0]["s"] or 0
        stats.update({
            "wall_sec": round(wall, 3),
            "assignments": int(assigned),
            "assignments_per_sec": round(assigned / wall, 1),
            "master": spark.sparkContext.master,
            "default_parallelism": spark.sparkContext.defaultParallelism,
        })
    print(json.dumps({"job": "tiling", **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
