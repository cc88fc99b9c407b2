"""Cross-modal dedup: a text edge and an image edge must merge
transitively into one cluster that neither modality finds alone."""

from pyspark.sql import functions as F

from osm2garmin_spark.functions import dedup as D
from osm2garmin_spark.functions.phash import phash_near_pairs


def _clusters(spark, ids, edges):
    out = D.dedup_clusters(ids, edges, id_col="doc_id",
                           a_col="id_a", b_col="id_b")
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_union_of_modalities_merges_transitively(spark):
    # doc 1 ~ doc 2 by TEXT only; doc 2 ~ doc 3 by IMAGE only
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "the quick brown fox jumps over the lazy dog tonight"),
         (3, "completely unrelated caption about mountains and rivers")],
        "doc_id long, text string")
    imgs = spark.createDataFrame(
        [(1, 0x0123456789ABCDEF), (2, 0x5A5A5A5A5A5A5A5A),
         (3, 0x5A5A5A5A5A5A5A5A)],
        "image_id long, phash long")

    text_pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n=1,
                                     num_hashes=16, bands=8) \
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    img_pairs = phash_near_pairs(imgs, max_hamming=3).select("id_a", "id_b")

    ids = docs.select("doc_id")
    assert _clusters(spark, ids, text_pairs) == {1: 1, 2: 1, 3: 3}
    assert _clusters(spark, ids, img_pairs) == {1: 1, 2: 2, 3: 2}
    both = text_pairs.unionByName(img_pairs).dropDuplicates(["id_a", "id_b"])
    assert _clusters(spark, ids, both) == {1: 1, 2: 1, 3: 1}