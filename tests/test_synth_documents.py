"""synth_documents: the deterministic dup-structured corpus feeding the
1M-doc dedup bench (tools/bench_dedup_corpus.py) — structure, determinism
across parallelism, and end-to-end recovery by the dedup pipeline."""

from osm2garmin_spark.pipeline.synth import synth_documents


def test_planted_structure_and_determinism(spark):
    rows = {r["doc_id"]: r["text"]
            for r in synth_documents(spark, 40).collect()}
    assert len(rows) == 40
    for k in range(0, 40, 5):
        assert rows[k] == rows[k + 1]                       # exact dup
        assert rows[k] != rows[k + 2]                       # near dup...
        assert (rows[k].rsplit(" ", 1)[0]
                == rows[k + 2].rsplit(" ", 1)[0])           # ...last word only
        assert rows[k + 3] != rows[k + 4] != rows[k]        # singletons
    # independent of partition count (pure function of the id)
    rows8 = {r["doc_id"]: r["text"]
             for r in synth_documents(spark, 40, partitions=8).collect()}
    assert rows8 == rows

    # word sequences must not collide across unrelated seeds (the LCG
    # this replaced produced thousands of duplicate sequences)
    texts = [rows[k] for k in range(0, 40, 5)]
    assert len(set(texts)) == len(texts)


def test_dedup_pipeline_recovers_planted_clusters(spark):
    from osm2garmin_spark.functions.dedup import (dedup_clusters,
                                                  minhash_lsh_pairs)
    from pyspark.sql import functions as F

    docs = synth_documents(spark, 500)
    pairs = minhash_lsh_pairs(docs).localCheckpoint()
    stats: dict = {}
    clusters = dedup_clusters(docs.select("doc_id"), pairs, stats=stats)
    sizes = {r["cluster_id"]: r["count"] for r in
             clusters.groupBy("cluster_id").count().collect()}
    triples = sum(1 for v in sizes.values() if v == 3)
    # banded LSH may miss a ~0.7-Jaccard near-dup link occasionally; the
    # exact-dup link is certain, so every block is at least a pair
    assert triples >= 0.85 * 100, triples
    at_least_pairs = sum(1 for v in sizes.values() if v >= 2)
    assert at_least_pairs >= 100
    assert stats["rounds"] <= 6
