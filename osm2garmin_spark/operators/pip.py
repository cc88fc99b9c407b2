"""Point-in-polygon join (region ``.poly`` semantics).

The reference only computes a polygon's envelope in-tree (Region.java:163-187)
and delegates exact PIP to its external splitter's ``--polygon-file``
(OsmMaker.java:83-118); the observable contract is "keep rows inside the
polygon". Here: broadcast the polygon vertices, pre-filter by bbox (cheap
JVM predicate — the envelope step), then an Arrow-vectorized numpy
ray-casting kernel over the surviving rows only. No shapely dependency; the
even-odd rule is ~15 numpy ops per (batch × edge).

Two physical strategies (the north-star's "broadcast + range-partitioned
point-in-polygon joins"):

- ``pip_join``: polygons as task-closure state — right when the region
  table fits a broadcast (the reference's handful of ``.poly`` regions).
- ``pip_join_partitioned``: polygons as a DataFrame, both sides
  range-partitioned onto a fixed-degree grid and equi-joined cell-to-cell
  — right when the polygon index itself is too large to broadcast
  (country/admin-boundary tables at planet scale). Candidates only meet
  inside a shared grid cell, so the shuffle carries each polygon once per
  covering cell and each point exactly once.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType


def ray_cast(lats: np.ndarray, lons: np.ndarray,
             poly: Sequence[Tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd ray casting. poly = [(lat, lon), ...] closed or
    open (auto-closes). Boundary behavior follows the standard y-interval
    half-open rule (consistent, not exactly 'closed edges')."""
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    inside = np.zeros(lats.shape, dtype=bool)
    n = len(poly)
    for i in range(n):
        y1, x1 = poly[i]
        y2, x2 = poly[(i + 1) % n]
        cond = (x1 > lons) != (x2 > lons)
        if not (x2 - x1):
            continue
        xint = (lons - x1) / (x2 - x1)
        yint = y1 + xint * (y2 - y1)
        inside ^= cond & (lats < yint)
    return inside


def points_in_polygon(points: DataFrame, poly: Sequence[Tuple[float, float]],
                      lat_col: str = "lat", lon_col: str = "lon",
                      flag_col: str = "inside") -> DataFrame:
    """Adds a boolean column; bbox pre-filter keeps the Python kernel off
    the (usually dominant) clearly-outside rows."""
    min_lat = min(p[0] for p in poly); max_lat = max(p[0] for p in poly)
    min_lon = min(p[1] for p in poly); max_lon = max(p[1] for p in poly)
    poly_b = [(float(a), float(b)) for a, b in poly]

    @F.pandas_udf(BooleanType())
    def _pip(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(ray_cast(lat.to_numpy(), lon.to_numpy(), poly_b))

    in_bbox = ((F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
               & (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon))
    return points.withColumn(
        flag_col,
        F.when(in_bbox, _pip(F.col(lat_col), F.col(lon_col))).otherwise(F.lit(False)),
    )


def points_in_region(points: DataFrame, region: dict,
                     lat_col: str = "lat", lon_col: str = "lon",
                     flag_col: str = "inside") -> DataFrame:
    """Exact containment for a parsed ``.poly`` region (sources/io.py:
    read_poly): outer rings PLUS holes, the reference's osmosis
    ``--polygon-file`` semantics its splitter consumes
    (OsmMaker.java:83-118). Even-odd over the multiset of all rings is
    the XOR of per-ring even-odd casts, so a point inside an outer ring
    and inside a hole cancels to outside — no special-casing. Vertices
    arrive (lon, lat) as read_poly returns them; bbox prefilter from the
    union of the OUTER rings' envelopes (holes can't extend the region).
    """
    outers = [[(float(la), float(lo)) for lo, la in r] for r in region["rings"]]
    hole_rings = [[(float(la), float(lo)) for lo, la in r]
                  for r in region.get("holes", [])]
    if not outers:
        return points.withColumn(flag_col, F.lit(False))
    min_lat = min(p[0] for r in outers for p in r)
    max_lat = max(p[0] for r in outers for p in r)
    min_lon = min(p[1] for r in outers for p in r)
    max_lon = max(p[1] for r in outers for p in r)
    all_rings = outers + hole_rings

    @F.pandas_udf(BooleanType())
    def _pip(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        inside = np.zeros(len(la), dtype=bool)
        for ring in all_rings:
            inside ^= ray_cast(la, lo, ring)
        return pd.Series(inside)

    in_bbox = ((F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
               & (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon))
    return points.withColumn(
        flag_col,
        F.when(in_bbox, _pip(F.col(lat_col), F.col(lon_col)))
        .otherwise(F.lit(False)),
    )


def pip_join(points: DataFrame, polygons: List[Tuple[int, Sequence[Tuple[float, float]]]],
             lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Multi-polygon containment join: one output row per (point, containing
    polygon). ``polygons`` = [(poly_id, [(lat, lon), ...]), ...], broadcast
    as task-closure state (region tables are small — the reference's .poly
    regions). Candidates pre-filtered per-polygon by bbox inside the kernel;
    the Python cost is O(batch × total_edges) numpy ops."""
    polys = [(int(pid), [(float(a), float(b)) for a, b in pv]) for pid, pv in polygons]
    bboxes = [(pid, min(p[0] for p in pv), max(p[0] for p in pv),
               min(p[1] for p in pv), max(p[1] for p in pv), pv)
              for pid, pv in polys]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lats = pdf[lat_col].to_numpy(np.float64)
            lons = pdf[lon_col].to_numpy(np.float64)
            frames = []
            for pid, lat0, lat1, lon0, lon1, pv in bboxes:
                cand = ((lats >= lat0) & (lats <= lat1)
                        & (lons >= lon0) & (lons <= lon1))
                if not cand.any():
                    continue
                idx = np.nonzero(cand)[0]
                ins = ray_cast(lats[idx], lons[idx], pv)
                hit = idx[ins]
                if len(hit):
                    sub = pdf.iloc[hit].copy()
                    sub["poly_id"] = pid
                    frames.append(sub)
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield pdf.iloc[0:0].assign(poly_id=np.array([], dtype=np.int32))

    # StructType.add mutates in place — build a fresh copy
    from pyspark.sql.types import IntegerType, StructField, StructType
    out_schema = StructType(list(points.schema.fields)
                            + [StructField("poly_id", IntegerType())])
    return points.mapInPandas(kernel, schema=out_schema)


#: grid-cell packing offset/stride — covers lat/lon cell indexes for any
#: cell_deg ≥ 0.001 without collision ((180/0.001 + margin) < _CELL_STRIDE)
_CELL_STRIDE = 1 << 20


def _cell_key(row, col):
    """Pack a (lat-row, lon-col) grid cell into one long join key."""
    return (row + _CELL_STRIDE // 2) * _CELL_STRIDE + (col + _CELL_STRIDE // 2)


def pip_join_partitioned(points: DataFrame, polygons: DataFrame,
                         cell_deg: float = 5.0,
                         lat_col: str = "lat", lon_col: str = "lon",
                         max_cells_per_poly: int = 4096) -> DataFrame:
    """Range-partitioned multi-polygon containment join — the scale path of
    ``pip_join`` for polygon tables too large to broadcast.

    ``polygons``: DataFrame(poly_id int, vlats array<double>,
    vlons array<double>) — one row per simple ring (same single-ring
    semantics as ``pip_join``). Plan: each polygon explodes onto the
    fixed-degree grid cells covering its bbox (pure JVM ``sequence`` —
    complete, because containment implies the point lies inside the
    polygon's bbox and therefore in one of its covering cells); each point
    computes its own cell; the two sides shuffle on the cell key and
    equi-join (SHUFFLE_HASH hint: the polygon side is by premise too big
    to broadcast, and per-cell polygon lists are the small build side). A
    JVM bbox predicate prunes the joined stream before the Arrow ray-cast
    kernel — identical ``ray_cast`` maths to ``pip_join``, so results are
    bit-identical (pinned in tests). Each point lives in exactly one cell,
    so (point, polygon) pairs are never duplicated — no distinct needed.

    ``max_cells_per_poly`` guards against a cell size far below a
    polygon's extent (the explode would quietly fan out; fail loudly and
    retune ``cell_deg`` instead — covering counts are validated JVM-side).
    """
    cs = float(cell_deg)
    half = _CELL_STRIDE // 2

    p_row = F.floor(F.col(lat_col) / cs).cast("long")
    p_col = F.floor(F.col(lon_col) / cs).cast("long")
    pts = points.withColumn(
        "_cell", (p_row + half) * _CELL_STRIDE + (p_col + half))

    v_minlat = F.array_min("vlats"); v_maxlat = F.array_max("vlats")
    v_minlon = F.array_min("vlons"); v_maxlon = F.array_max("vlons")
    r0 = F.floor(v_minlat / cs).cast("long")
    r1 = F.floor(v_maxlat / cs).cast("long")
    c0 = F.floor(v_minlon / cs).cast("long")
    c1 = F.floor(v_maxlon / cs).cast("long")
    n_cells = (r1 - r0 + 1) * (c1 - c0 + 1)
    guard = F.when(n_cells <= max_cells_per_poly, F.col("poly_id")) \
        .otherwise(F.raise_error(F.concat(
            F.lit("pip_join_partitioned: polygon "),
            F.col("poly_id").cast("string"),
            F.lit(f" covers > {max_cells_per_poly} cells at "
                  f"cell_deg={cs}; raise cell_deg or the cap"))))
    cov = (polygons
           .withColumn("poly_id", guard)
           .withColumn("_row", F.explode(F.sequence(r0, r1)))
           .withColumn("_col", F.explode(F.sequence(c0, c1)))
           .select(((F.col("_row") + half) * _CELL_STRIDE
                    + (F.col("_col") + half)).alias("_cell"),
                   "poly_id", "vlats", "vlons",
                   v_minlat.alias("_minlat"), v_maxlat.alias("_maxlat"),
                   v_minlon.alias("_minlon"), v_maxlon.alias("_maxlon")))

    joined = (pts.join(cov.hint("shuffle_hash"), "_cell")
              .filter((F.col(lat_col) >= F.col("_minlat"))
                      & (F.col(lat_col) <= F.col("_maxlat"))
                      & (F.col(lon_col) >= F.col("_minlon"))
                      & (F.col(lon_col) <= F.col("_maxlon")))
              .drop("_cell", "_minlat", "_maxlat", "_minlon", "_maxlon"))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                yield pdf.drop(columns=["vlats", "vlons"])
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            lats = pdf[lat_col].to_numpy(np.float64)
            lons = pdf[lon_col].to_numpy(np.float64)
            # one vectorized ray-cast per distinct polygon in the batch
            for _pid, idx in pdf.groupby("poly_id", sort=False).indices.items():
                row = pdf.iloc[idx[0]]
                poly = list(zip(row["vlats"], row["vlons"]))
                keep[idx] = ray_cast(lats[idx], lons[idx], poly)
            yield pdf.drop(columns=["vlats", "vlons"]).iloc[
                np.nonzero(keep)[0]]

    from pyspark.sql.types import IntegerType, StructField, StructType
    out_schema = StructType(list(points.schema.fields)
                            + [StructField("poly_id", IntegerType())])
    return joined.mapInPandas(kernel, schema=out_schema)
