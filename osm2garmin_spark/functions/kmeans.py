"""Integer-exact Lloyd k-means over embedding columns.

The float-free twin of classic k-means (same move the engine's
weighted-centroid aggregation makes, SURVEY §2.4): embeddings quantize
to int64 via ``floor(x * scale)`` — identical IEEE doubles floor
identically in every engine — and every distance, sum, and centroid
update stays in exact integer arithmetic, so a SQL oracle reproduces
the full iteration bit-for-bit. Floating k-means is NOT cross-engine
reproducible (sum order, tie noise); this variant is, at the cost of a
1/scale quantization error that is irrelevant for cluster assignment.

Semantics per Lloyd iteration (Lloyd 1982 / MacQueen 1967, public):
- assign: nearest centroid by squared L2 distance in quantized space;
  exact integer ties break toward the LOWEST cluster id.
- update: per-dimension centroid = floor-division mean
  ``(s - pmod(s, n)) / n`` (exact: the numerator is divisible by n);
  a cluster that loses all members keeps its previous centroid.
- init: the first k rows by id order (deterministic, catalog-friendly;
  k-means++ would need a sequential scan of random draws — at 100 TB
  you seed from a footer sample the same way the IVF build does).

Scale shape: one scan + one groupBy(cluster) per iteration with
1 + d algebraic aggregates (map-side partial combine shrinks the
exchange to k rows per partition); the k x d centroid table round-trips
through the driver as bounded literals (what MLlib's treeAggregate
does). No UDFs, no explode of the vectors — the distance is a d-term
JVM expression inside whole-stage codegen.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, functions as F

#: quantization scale — unit-norm-ish embeddings at 1e6 keep the worst
#: 64-dim squared distance near 2^47, far inside int64
DEFAULT_SCALE = 1_000_000


def quantize_vec(vec: Column, scale: int = DEFAULT_SCALE) -> Column:
    """array<long> of floor(x * scale) — FLOOR, not round: round-half
    rules differ across engines, floor of the identical double does not."""
    return F.transform(vec, lambda x: F.floor(x * F.lit(float(scale))).cast("long"))


def _dist2(qvec: Column, centroid: List[int]) -> Column:
    """Exact integer squared L2 to a literal centroid (d unrolled terms,
    all inside codegen)."""
    d = None
    for i, c in enumerate(centroid):
        t = F.element_at(qvec, i + 1) - F.lit(int(c))
        term = t * t
        d = term if d is None else d + term
    return d


def assign_clusters(df: DataFrame, qvec_col: str,
                    centroids: List[List[int]]) -> DataFrame:
    """Adds ``cluster``: index of the nearest centroid (ties -> lowest
    id) via array_min over (dist, id) structs — lexicographic struct
    ordering gives the deterministic tie-break for free."""
    best = F.array_min(F.array(*[
        F.struct(_dist2(F.col(qvec_col), c).alias("d"),
                 F.lit(i).alias("c"))
        for i, c in enumerate(centroids)]))
    return df.withColumn("cluster", best.getField("c"))


def kmeans_fit(df: DataFrame, id_col: str, vec_col: str, k: int,
               iters: int, dim: int,
               scale: int = DEFAULT_SCALE) -> Tuple[List[List[int]], DataFrame]:
    """(final centroids, assigned DataFrame) after ``iters`` Lloyd
    rounds from the first-k-by-id init. All bounded driver round-trips
    are k x (1 + dim) aggregate rows."""
    if k < 1 or iters < 0 or dim < 1:
        raise ValueError(f"bad params k={k} iters={iters} dim={dim}")
    # checkpoint the quantized table: Lloyd makes 2 + iters passes over
    # it (init, per-iteration assign+agg, final assign), and without the
    # checkpoint every pass re-runs the scan + quantize transform (the
    # knn_grid iteration discipline; blocks are freed with the returned
    # DataFrame). At cluster scale pair this with a reliable checkpoint
    # dir if executors are preemptible — same trade-off as knn_grid.
    q = df.select(F.col(id_col).alias("_id"),
                  quantize_vec(F.col(vec_col), scale).alias("_q")) \
          .localCheckpoint(eager=True)
    init_rows = q.orderBy("_id").limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"need >= k={k} rows, got {len(init_rows)}")
    cents = [list(r["_q"]) for r in init_rows]

    for _ in range(iters):
        assigned = assign_clusters(q, "_q", cents)
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(F.element_at("_q", i + 1)).alias(f"_s{i}")
            for i in range(dim)]
        stats = {r["cluster"]: r
                 for r in assigned.groupBy("cluster").agg(*aggs).collect()}
        nxt = []
        for ci in range(k):
            r = stats.get(ci)
            if r is None:  # emptied cluster keeps its centroid
                nxt.append(cents[ci])
                continue
            n = r["_n"]
            # exact floor-division mean: numerator divisible by n
            nxt.append([(r[f"_s{i}"] - (r[f"_s{i}"] % n + n) % n) // n
                        for i in range(dim)])
        cents = nxt

    out = (assign_clusters(q, "_q", cents)
           .select(F.col("_id").alias(id_col), "cluster"))
    return cents, out


def kmeans_sql(k: int, iters: int, dim: int, table: str = "embeddings",
               id_col: str = "vec_id", vec_col: str = "embedding",
               scale: int = DEFAULT_SCALE) -> str:
    """DuckDB oracle: the SAME quantization, assignment, tie-break, and
    floor-division update, unrolled ``iters`` times via CTEs. List
    lambdas replace the unrolled JVM distance terms; '%' in DuckDB is
    C-truncated like Spark's, so the pmod identity transfers verbatim."""
    dims = f"range(1, {dim + 1})"
    sql = [f"""q AS (
  SELECT {id_col} AS id,
         list_transform({vec_col},
                        x -> CAST(FLOOR(x * {float(scale)!r}) AS BIGINT)) AS qv
  FROM {table})""",
           f"""c0 AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cluster, qv
  FROM (SELECT id, qv FROM q ORDER BY id LIMIT {k}))"""]
    for it in range(iters + 1):
        sql.append(f"""a{it} AS (
  SELECT id, cluster, qv FROM (
    SELECT q.id, c.cluster, q.qv,
           row_number() OVER (PARTITION BY q.id ORDER BY
             list_sum(list_transform({dims},
               i -> (q.qv[i] - c.qv[i]) * (q.qv[i] - c.qv[i]))) ASC,
             c.cluster ASC) AS rn
    FROM q CROSS JOIN c{it} c)
  WHERE rn = 1)""")
        if it == iters:
            break
        sql.append(f"""s{it} AS (
  SELECT cluster, i, COUNT(*) AS n, SUM(qv[i]) AS s
  FROM (SELECT cluster, qv, UNNEST({dims}) AS i FROM a{it})
  GROUP BY cluster, i)""")
        sql.append(f"""c{it + 1} AS (
  SELECT p.cluster,
         COALESCE(u.qv, p.qv) AS qv
  FROM c{it} p LEFT JOIN (
    SELECT cluster,
           list((s - ((s % n) + n) % n) // n ORDER BY i) AS qv
    FROM s{it} GROUP BY cluster) u ON p.cluster = u.cluster)""")
    ctes = ",\n".join(sql)
    return (f"WITH {ctes}\n"
            f"SELECT id AS {id_col}, cluster FROM a{iters}")
