"""Point-in-polygon join (region ``.poly`` semantics).

The reference only computes a polygon's envelope in-tree (Region.java:163-187)
and delegates exact PIP to its external splitter's ``--polygon-file``
(OsmMaker.java:83-118); the observable contract is "keep rows inside the
polygon". Here: broadcast the polygon vertices, pre-filter by bbox (cheap
JVM predicate — the envelope step), then an Arrow-vectorized numpy
ray-casting kernel over the surviving rows only. No shapely dependency; the
even-odd rule is ~15 numpy ops per (batch × edge).
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
