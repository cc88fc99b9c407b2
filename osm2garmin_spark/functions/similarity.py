"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``      exact brute-force top-k, all JVM-side: zip_with dot
                       product + per-query window. The correctness baseline.
- ``ann_lsh_topk``     random-hyperplane LSH buckets (deterministic integer
                       hyperplanes) → candidates meet only inside a bucket →
                       exact refine. The 100 TB path: the quadratic
                       query×corpus join shrinks to bucket-local joins.
- ``embedding_near_pairs``  near-duplicate pairs by cosine ≥ threshold.

Dot products fold sequentially (F.aggregate) → deterministic fp order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm2(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.sqrt(_norm2(a) * _norm2(b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                q_id: str = "q_id", q_vec: str = "q_vec",
                c_id: str = "c_id", c_vec: str = "c_vec") -> DataFrame:
    """Exact top-k: (q_id, c_id, rnk); self-matches (same id) excluded.
    Broadcast the smaller side (queries) — corpus never shuffles."""
    j = corpus.join(F.broadcast(queries), F.col(q_id) != F.col(c_id))
    sim = cosine_sim(F.col(q_vec), F.col(c_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("_sim").desc(), F.col(c_id).asc())
    return (j.withColumn("_sim", sim)
             .withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= k)
             .select(q_id, c_id, "rnk", F.col("_sim").alias("sim")))


def _hyperplane(dim: int, h: int) -> list:
    """Deterministic ±1 pseudo-random hyperplane from an integer LCG."""
    v = []
    state = h * 6364136223846793005 + 1442695040888963407
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        v.append(1.0 if (state >> 62) & 1 else -1.0)
    return v


def lsh_bucket(vec: Column, dim: int, num_planes: int = 12) -> Column:
    """Sign-pattern bucket id from num_planes deterministic hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _hyperplane(dim, p + 1)
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
                 num_planes: int = 10,
                 q_id: str = "q_id", q_vec: str = "q_vec",
                 c_id: str = "c_id", c_vec: str = "c_vec") -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket; exact cosine
    refine within bucket. Recall < 1 by design (report alongside exact)."""
    qb = queries.withColumn("_bucket", lsh_bucket(F.col(q_vec), dim, num_planes))
    cb = corpus.withColumn("_bucket", lsh_bucket(F.col(c_vec), dim, num_planes))
    j = cb.join(F.broadcast(qb), ["_bucket"]).filter(F.col(q_id) != F.col(c_id))
    sim = cosine_sim(F.col(q_vec), F.col(c_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("_sim").desc(), F.col(c_id).asc())
    return (j.withColumn("_sim", sim)
             .withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= k)
             .select(q_id, c_id, "rnk", F.col("_sim").alias("sim")))


def embedding_near_pairs(df: DataFrame, threshold: float,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         dim: int = 64, num_planes: int = 8) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine ≥ threshold, LSH-pruned."""
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")) \
          .withColumn("_bucket", lsh_bucket(F.col("vec"), dim, num_planes))
    l = b.alias("l")
    r = b.alias("r")
    cand = l.join(r, (F.col("l._bucket") == F.col("r._bucket"))
                  & (F.col("l.id") < F.col("r.id")))
    sim = cosine_sim(F.col("l.vec"), F.col("r.vec"))
    return (cand.withColumn("_sim", sim)
                .filter(F.col("_sim") >= threshold)
                .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                        F.col("_sim").alias("sim")))
