"""Dedup pipeline at corpus scale (VERDICT r4 next-round #3): run
minhash_lsh_pairs -> dedup_clusters end-to-end on a >=1M-doc synthetic
corpus with KNOWN duplicate structure (pipeline/synth.synth_documents:
one exact-dup pair + one near-dup per 5-id block) and print one JSON
line with pairs/sec, rounds-to-fixpoint, and recall against the planted
structure.

The oracle-gated sf0.01 queries pin the VALUES of this pipeline on 500
docs; this bench pins its SCALE shape: the candidate join is banded
buckets (never all-pairs), edges repartition exactly once and each label
round starts from a checkpoint (no plan growth across rounds).

Round 6: times BOTH cluster-resolution methods on the same
checkpointed candidate pairs — the SoCC'14 large-star/small-star
alternation (O(log d) rounds, the new default) and min-label
propagation (O(diameter) rounds) — and asserts their labels identical
before printing per-method wall + rounds.

Usage: python tools/bench_dedup_corpus.py [n_docs] [cores]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2garmin_spark.functions.dedup import (dedup_clusters,     # noqa: E402
                                              minhash_lsh_pairs)
from osm2garmin_spark.pipeline.synth import synth_documents       # noqa: E402
from osm2garmin_spark.session import get_spark                    # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else \
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-dedup-corpus", master=f"local[{cores}]",
                      shuffle_partitions=cores)

    docs = synth_documents(spark, n)

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs).localCheckpoint()
    n_pairs = pairs.count()
    wall_pairs = time.perf_counter() - t0

    stats: dict = {}
    t1 = time.perf_counter()
    clusters = dedup_clusters(docs.select("doc_id"), pairs, stats=stats,
                              method="star")
    from pyspark.sql import functions as F

    sizes = (clusters.groupBy("cluster_id").count()
             .groupBy("count").count().collect())
    wall_clusters = time.perf_counter() - t1

    stats_ml: dict = {}
    t2 = time.perf_counter()
    clusters_ml = dedup_clusters(docs.select("doc_id"), pairs,
                                 stats=stats_ml, method="minlabel")
    diverged = (clusters.withColumnRenamed("cluster_id", "c_star")
                .join(clusters_ml.withColumnRenamed("cluster_id", "c_ml"),
                      "doc_id")
                .filter(F.col("c_star") != F.col("c_ml")).count())
    wall_ml = time.perf_counter() - t2
    assert diverged == 0, f"{diverged} labels diverged between methods"

    stats_auto: dict = {}
    t3 = time.perf_counter()
    clusters_auto = dedup_clusters(docs.select("doc_id"), pairs,
                                   stats=stats_auto)     # default path
    diverged_a = (clusters.withColumnRenamed("cluster_id", "c_star")
                  .join(clusters_auto.withColumnRenamed("cluster_id", "c_a"),
                        "doc_id")
                  .filter(F.col("c_star") != F.col("c_a")).count())
    wall_auto = time.perf_counter() - t3
    assert diverged_a == 0, f"{diverged_a} labels diverged (auto vs star)"
    by_size = {int(r["count"]): int(r["count(1)"])
               if "count(1)" in r.asDict() else int(r[1]) for r in sizes}

    # planted truth: every block of 5 ids holds one {5k, 5k+1, 5k+2}
    # component; recall = fraction of those blocks fully clustered
    # (LSH can miss a banded match — report, don't assert perfection)
    n_blocks = n // 5
    full_triples = by_size.get(3, 0)
    out = {
        "metric": "dedup_pipeline_corpus",
        "n_docs": n,
        "cores": cores,
        "wall_pairs_sec": round(wall_pairs, 2),
        "n_candidate_pairs": n_pairs,
        "pairs_per_sec": round(n_pairs / wall_pairs, 1),
        "docs_per_sec_pairs_stage": round(n / wall_pairs, 1),
        "wall_clusters_sec": round(wall_clusters, 2),
        "rounds_to_fixpoint": stats.get("rounds"),
        "wall_clusters_minlabel_sec": round(wall_ml, 2),
        "rounds_minlabel": stats_ml.get("rounds"),
        "wall_clusters_auto_sec": round(wall_auto, 2),
        "rounds_auto": stats_auto.get("rounds"),
        "auto_switched": stats_auto.get("switched"),
        "labels_identical": True,
        "cluster_size_histogram": {str(k): v for k, v in sorted(by_size.items())},
        "planted_triples": n_blocks,
        "recovered_triples": full_triples,
        "triple_recall": round(full_triples / n_blocks, 4) if n_blocks else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
