"""Distance-within spatial range join (fixed-radius near-neighbor join).

``range_join_within(a, b, radius_km)`` returns every (a, b) pair whose
great-circle (haversine) distance is <= radius_km — the "all events
within R km of each customer" join. The reference's nearest-city search
is the kNN cousin (DefaultCityFinder.java:39-105, covered by
operators/knn.py); the fixed-radius variant is the missing join class a
geo pipeline needs for proximity filters, geofencing, and duplicate-site
detection.

Scale design (no cartesian product, ever):

1. **Grid blocking.** Both sides key to a lat/lon grid whose cell sizes
   are RIGOROUS sphere bounds, not small-angle approximations:

   - ``cell_lat``: central angle >= |dphi|, so d <= R implies
     |dlat| <= degrees(R / R_EARTH) exactly.
   - ``cell_lon``: from hav(d) >= cos(phi1)cos(phi2) sin^2(dlon/2):
     d <= R implies dlon <= 2 asin(min(1, sin(R/2R_E) / cos(phi_cap)))
     where phi_cap bounds |lat| over both inputs (caller-supplied
     ``max_abs_lat``; the poles degenerate under lon blocking, which is
     the documented limit of lat/lon grids — polar data wants the S2
     index, geo/s2.py).

   Any qualifying pair is therefore in the same or an adjacent cell.
2. **3x3 ring explode on the LEFT side only** (9 rows per left point —
   same discipline as operators/knn.py: the big right side keys once
   and shuffles once on the cell key, never explodes).
3. **Dateline wrap**: the lon cell index is taken modulo the grid width,
   so cells at lon +179.9 and -179.9 are adjacent; the haversine's
   sin(dlon/2) is periodic, so the refine needs no unwrapping.
4. **Equi-join on (cell_x, cell_y)** — hash-partitioned, AQE-skew-
   splittable — then the exact haversine predicate as a pure-JVM
   residual (whole-stage codegen; literal double constants shared with
   the SQL oracle twin so both engines evaluate the same IEEE tree).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

#: mean Earth radius, km (IUGG); shared literal with the SQL twin
R_EARTH = 6371.0088
DEG2RAD = 0.017453292519943295


def _cell_sizes_deg(radius_km: float, max_abs_lat: float):
    """(cell_lat_deg, cell_lon_deg): rigorous adjacency bounds (see
    module docstring). Raises when the lon grid degenerates (< 3 cells
    around the globe or polar cap blocking)."""
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    if not (0 <= max_abs_lat < 90.0):
        raise ValueError(f"max_abs_lat must be in [0, 90), got {max_abs_lat}")
    cell_lat = math.degrees(radius_km / R_EARTH)
    cos_cap = math.cos(math.radians(max_abs_lat))
    s = math.sin(radius_km / (2.0 * R_EARTH)) / cos_cap
    if s >= 1.0:
        raise ValueError(
            f"radius {radius_km} km spans all longitudes at lat "
            f"{max_abs_lat}: block on geo/s2.py cells instead")
    cell_lon = math.degrees(2.0 * math.asin(s))
    if 360.0 / cell_lon < 3.0:
        raise ValueError(
            f"lon grid has <3 cells at radius {radius_km} km / lat cap "
            f"{max_abs_lat}: block on geo/s2.py cells instead")
    return cell_lat, cell_lon


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance (km) as a pure-JVM column expression."""
    p1 = lat1 * F.lit(DEG2RAD)
    p2 = lat2 * F.lit(DEG2RAD)
    dp = (lat2 - lat1) * F.lit(DEG2RAD)
    dl = (lon2 - lon1) * F.lit(DEG2RAD)
    a = (F.pow(F.sin(dp / F.lit(2.0)), 2)
         + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / F.lit(2.0)), 2))
    return F.lit(2.0 * R_EARTH) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The identical expression tree in ANSI SQL (oracle twin)."""
    p1 = f"({lat1} * {DEG2RAD!r})"
    p2 = f"({lat2} * {DEG2RAD!r})"
    dp = f"(({lat2} - {lat1}) * {DEG2RAD!r})"
    dl = f"(({lon2} - {lon1}) * {DEG2RAD!r})"
    a = (f"(POW(SIN({dp} / 2.0), 2) + COS({p1}) * COS({p2})"
         f" * POW(SIN({dl} / 2.0), 2))")
    return f"({2.0 * R_EARTH!r} * ASIN(SQRT(LEAST({a}, 1.0))))"


def range_join_within(a: DataFrame, b: DataFrame, radius_km: float,
                      max_abs_lat: float = 85.1,
                      dist_col: str | None = None) -> DataFrame:
    """All (a, b) pairs with haversine distance <= radius_km.

    ``a`` and ``b`` carry ``lat``/``lon`` double columns (degrees) plus
    any payload columns; output = a's columns + b's columns (+ the
    distance when ``dist_col`` names it). The LEFT side is exploded 9x —
    pass the smaller table as ``a``. Input rows with |lat| > max_abs_lat
    violate the blocking bound and raise at plan-build time via a
    raise_error guard column. Rows with NULL/NaN coordinates get NULL
    cell keys and drop out of the inner join silently — filter or
    impute upstream if they must be accounted for.
    """
    cell_lat, cell_lon = _cell_sizes_deg(radius_km, max_abs_lat)
    n_x = int(math.ceil(360.0 / cell_lon))

    def keyed(df: DataFrame, side: str) -> DataFrame:
        guard = F.when(
            F.abs(F.col("lat")) > F.lit(max_abs_lat),
            F.raise_error(F.lit(
                f"{side}.lat exceeds max_abs_lat={max_abs_lat}; raise the "
                f"cap or block on geo/s2.py cells"))).otherwise(F.lit(0))
        ix = F.floor((F.col("lon") + F.lit(180.0)) / F.lit(cell_lon))
        iy = F.floor((F.col("lat") + F.lit(90.0)) / F.lit(cell_lat))
        return df.withColumn("_g", guard) \
                 .withColumn("_ix", F.pmod(ix + F.col("_g"), F.lit(n_x))) \
                 .withColumn("_iy", iy.cast("long")).drop("_g")

    ak = keyed(a, "a")
    bk = keyed(b, "b")

    ring = F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("_dx")
    ak = ak.select("*", ring)
    ak = ak.select("*", F.explode(
        F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("_dy"))
    ak = (ak.withColumn("_ix", F.pmod(F.col("_ix") + F.col("_dx"), F.lit(n_x)))
            .withColumn("_iy", F.col("_iy") + F.col("_dy"))
            .drop("_dx", "_dy"))

    a_cols = [c for c in a.columns]
    b_cols = [c for c in b.columns]
    dup = set(a_cols) & set(b_cols)
    bren = bk
    for c in dup:
        bren = bren.withColumnRenamed(c, f"b_{c}")
    b_out = [f"b_{c}" if c in dup else c for c in b_cols]

    blat = F.col("b_lat") if "lat" in dup else F.col("lat")
    blon = F.col("b_lon") if "lon" in dup else F.col("lon")

    joined = ak.join(bren, on=["_ix", "_iy"], how="inner")
    # exact cheap pre-rejects before the trig: the SAME bounds that sized
    # the cells (d <= R implies |dlat| <= cell_lat and wrapped |dlon| <=
    # cell_lon — rigorous, so nothing true is dropped). The 3x3 ring
    # admits candidates up to ~3 cells apart on each axis; these two
    # subtract/compare filters cut the haversine evaluations to roughly
    # the inscribed window (~1/4 of candidates), which matters because
    # the sin/cos/asin tree is the join's ALU hot spot.
    dlat_ok = F.abs(blat - F.col("lat")) <= F.lit(cell_lat)
    dlon_raw = F.abs(blon - F.col("lon"))
    dlon_ok = F.least(dlon_raw, F.lit(360.0) - dlon_raw) <= F.lit(cell_lon)
    dist = haversine_km(F.col("lat"), F.col("lon"), blat, blon)
    out = joined.filter(dlat_ok & dlon_ok
                        & (dist <= F.lit(float(radius_km))))
    sel = a_cols + b_out
    if dist_col is not None:
        out = out.withColumn(dist_col, dist)
        sel = sel + [dist_col]
    return out.select(*sel)
