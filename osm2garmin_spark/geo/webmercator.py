"""Web-Mercator slippy tiles (XYZ) and Bing-style quadkeys.

The engine's Garmin-style tiles (integer map-unit rectangles,
`split/quadtree.py`) are one tiling scheme; the web ecosystem's universal
scheme is the Web-Mercator XYZ pyramid (OSM slippy tiles, the same grid
mkgmap-rendered maps are overlaid on). This module is the bridge: encode
any (lat, lon) to its zoom-z tile and quadkey so engine output can be
joined/partitioned against web-tile-keyed datasets.

Scheme (public OSM/Bing definition):

- ``x = floor((lon + 180) / 360 * 2^z)``
- ``y = floor((1 - ln(tan(latr) + 1/cos(latr)) / pi) / 2 * 2^z)``
  with ``latr = lat * pi/180`` clamped to +-85.05112878 (the latitude
  where the square Mercator world closes).
- quadkey = base-4 string of interleaved (y, x) bits, MSB first; the
  zoom-k quadkey of a tile is the length-k PREFIX of every descendant's
  quadkey, so quadkey ranges are partition-prunable exactly like the
  engine's Z-order/S2/hex prefixes.

Three implementations share the exact same expression tree (literal
double constants, no engine-specific radians()/pi() builtins): numpy
(Arrow side), Catalyst columns (JVM side), generated ANSI SQL (oracles).
ln/tan/cos are not correctly-rounded in either engine, so a point lying
within ~1 ulp of a tile boundary could in principle land differently
across engines; boundaries are a measure-zero set and the deterministic
test corpora sit nowhere near them.

Reference parity note: the reference's own tile scheme is the map-unit
quadtree (SplitProcessor.java:412-518); XYZ output is the engine
extension that makes those tiles addressable by web-map keys.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, functions as F

#: Mercator latitude clamp (atan(sinh(pi)) in degrees)
MAX_LAT = 85.05112878
#: lat degrees -> radians multiplier, written as the exact double literal
DEG2RAD = 0.017453292519943295
#: 1/pi as the exact double literal
INV_PI = 0.3183098861837907


# --- numpy ------------------------------------------------------------------

def slippy_xy_np(lat: np.ndarray, lon: np.ndarray, zoom: int):
    """(x, y) tile coordinates at ``zoom`` as int64 arrays (clamped)."""
    if not (0 <= zoom <= 30):
        raise ValueError(f"zoom must be in [0, 30], got {zoom}")
    n = 1 << zoom
    lat = np.clip(np.asarray(lat, np.float64), -MAX_LAT, MAX_LAT)
    lon = np.asarray(lon, np.float64)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    latr = lat * DEG2RAD
    y = np.floor(
        (1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr)) * INV_PI)
        / 2.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def quadkey_np(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """Quadkey strings (length ``zoom``) from tile coordinates."""
    if zoom < 1:
        # same contract as quadkey_col/quadkey_sql: zoom 0 has a single
        # tile and a zero-length key — an input error, not a value
        raise ValueError(f"quadkey needs zoom >= 1, got {zoom}")
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    out = np.full(x.shape, "", dtype=object)
    for bit in range(zoom - 1, -1, -1):
        digit = (((y >> bit) & 1) << 1) | ((x >> bit) & 1)
        out = np.char.add(out.astype(str), digit.astype(str)).astype(object)
    return out.astype(str)


def slippy_center_latlon_np(x: np.ndarray, y: np.ndarray, zoom: int):
    """Tile-center (lat, lon) — the decode direction, for tests/refine."""
    n = 1 << zoom
    lon = (np.asarray(x, np.float64) + 0.5) / n * 360.0 - 180.0
    yn = 1.0 - 2.0 * (np.asarray(y, np.float64) + 0.5) / n
    lat = np.degrees(np.arctan(np.sinh(math.pi * yn)))
    return lat, lon


# --- Catalyst columns ---------------------------------------------------------

def _clamped_latr(lat: Column) -> Column:
    latc = F.least(F.greatest(lat, F.lit(-MAX_LAT)), F.lit(MAX_LAT))
    return latc * F.lit(DEG2RAD)


def slippy_x_col(lon: Column, zoom: int) -> Column:
    """Tile x at ``zoom`` as a pure-JVM column (whole-stage codegen)."""
    n = 1 << zoom
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.least(F.greatest(x, F.lit(0)), F.lit(n - 1)).cast("long")


def slippy_y_col(lat: Column, zoom: int) -> Column:
    """Tile y at ``zoom`` as a pure-JVM column."""
    n = 1 << zoom
    latr = _clamped_latr(lat)
    y = F.floor(
        (F.lit(1.0) - F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr))
         * F.lit(INV_PI)) / F.lit(2.0) * F.lit(float(n)))
    return F.least(F.greatest(y, F.lit(0)), F.lit(n - 1)).cast("long")


def quadkey_col(x: Column, y: Column, zoom: int) -> Column:
    """Quadkey string column from tile-coordinate columns (JVM concat)."""
    if zoom < 1:
        raise ValueError(f"quadkey needs zoom >= 1, got {zoom}")
    digits = []
    for bit in range(zoom - 1, -1, -1):
        d = (F.shiftrightunsigned(y, bit) % 2) * 2 + (
            F.shiftrightunsigned(x, bit) % 2)
        digits.append(d.cast("string"))
    return F.concat(*digits)


# --- ANSI SQL (oracle twins) --------------------------------------------------

def slippy_x_sql(lon_expr: str, zoom: int) -> str:
    n = 1 << zoom
    x = f"CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {float(n)!r}) AS BIGINT)"
    return f"LEAST(GREATEST({x}, 0), {n - 1})"


def slippy_y_sql(lat_expr: str, zoom: int) -> str:
    n = 1 << zoom
    latr = (f"(LEAST(GREATEST({lat_expr}, {-MAX_LAT!r}), {MAX_LAT!r})"
            f" * {DEG2RAD!r})")
    y = (f"CAST(FLOOR((1.0 - LN(TAN({latr}) + 1.0 / COS({latr}))"
         f" * {INV_PI!r}) / 2.0 * {float(n)!r}) AS BIGINT)")
    return f"LEAST(GREATEST({y}, 0), {n - 1})"


def quadkey_sql(x_expr: str, y_expr: str, zoom: int) -> str:
    if zoom < 1:
        # twin of quadkey_col's guard — zoom 0 would render an empty
        # ' || ' join, i.e. invalid SQL, instead of failing loudly
        raise ValueError(f"quadkey needs zoom >= 1, got {zoom}")
    digits = []
    for bit in range(zoom - 1, -1, -1):
        digits.append(
            f"CAST((({y_expr} >> {bit}) & 1) * 2 + (({x_expr} >> {bit}) & 1)"
            f" AS VARCHAR)")
    return " || ".join(digits)
