"""Geohash encoding (the base32 cell scheme of Redis/Elasticsearch/
PostGIS) — the last member of the engine's index family next to Z-order
(`cells.py`), Hilbert, S2 (`s2.py`), aperture-7 hex (`hex.py`) and
Web-Mercator XYZ (`webmercator.py`).

Public definition: interleave the binary subdivisions of lon (first)
and lat, group into 5-bit digits, map through the geohash base32
alphabet. Integer formulation used here (equivalent to the bisection
loop, but vectorizable):

- ``ilon = floor((lon+180)/360 * 2^h)``, ``ilat = floor((lat+90)/180 * 2^h)``
  with ``h = 5*precision/2`` bits per axis (precision must be even so
  the axes split evenly; the odd precisions interleave a half-digit
  and are not worth the asymmetry here),
- ``v = spread(ilon) << 1 | spread(ilat)`` — lon owns the high bit of
  each pair, exactly the published bit order,
- digit k = bits ``5*(p-1-k) .. +4`` of v, through
  ``0123456789bcdefghjkmnpqrstuvwxyz``.

The prefix property is EXACT, not approximate: ``(lon+180)/360`` is
rounded once and the ``* 2^h`` scalings are exact in IEEE double, so
``ilon`` at h bits equals ``ilon`` at h' > h bits shifted down — a
precision-4 geohash is always the 4-char prefix of the precision-8 one
(pinned in tests and by the oracle, which re-encodes the parent with an
independent full derivation).

Three implementations share the semantics: numpy, Catalyst columns
(pure JVM — bit ops + array element_at + concat), generated ANSI SQL.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, functions as F

from .cells import _spread_np, _spread_sql, _spread_col

#: the geohash base32 alphabet (no a/i/l/o)
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _check_precision(precision: int) -> int:
    if not (2 <= precision <= 12 and precision % 2 == 0):
        raise ValueError(
            f"precision must be even and in [2, 12], got {precision}")
    return (5 * precision) // 2


# --- numpy ------------------------------------------------------------------

def geohash_int_np(lat: np.ndarray, lon: np.ndarray, precision: int):
    """The 5*precision-bit interleaved integer (the hash before base32)."""
    h = _check_precision(precision)
    n = 1 << h
    ilon = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n)
    ilat = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n)
    ilon = np.clip(ilon, 0, n - 1).astype(np.int64)
    ilat = np.clip(ilat, 0, n - 1).astype(np.int64)
    return ((_spread_np(ilon) << np.uint64(1)) | _spread_np(ilat)) \
        .astype(np.int64)


def geohash_np(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    """Geohash strings of length ``precision``."""
    v = geohash_int_np(lat, lon, precision)
    out = np.full(v.shape, "", dtype=object)
    for k in range(precision):
        digit = (v >> (5 * (precision - 1 - k))) & 31
        out = np.char.add(out.astype(str),
                          np.array(list(ALPHABET))[digit]).astype(object)
    return out.astype(str)


# --- Catalyst ----------------------------------------------------------------

def geohash_col(lat: Column, lon: Column, precision: int) -> Column:
    """Geohash string as a pure-JVM column (whole-stage codegen)."""
    h = _check_precision(precision)
    n = 1 << h
    ilon = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    ilat = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    ilon = F.greatest(F.lit(0), F.least(ilon, F.lit(n - 1)))
    ilat = F.greatest(F.lit(0), F.least(ilat, F.lit(n - 1)))
    v = F.shiftleft(_spread_col(ilon), 1).bitwiseOR(_spread_col(ilat))
    alphabet = F.array(*[F.lit(c) for c in ALPHABET])
    chars = [F.element_at(alphabet,
                          (F.shiftrightunsigned(v, 5 * (precision - 1 - k))
                           % 32 + 1).cast("int"))
             for k in range(precision)]
    return F.concat(*chars)


# --- SQL (oracle twin) ---------------------------------------------------------

def geohash_sql_ctes(src_cte: str, id_col: str, lat_expr: str, lon_expr: str,
                     precision: int, out_cte: str = "ghf",
                     out_col: str = "geohash") -> str:
    """CTE chain computing the geohash in ANSI SQL: one CTE for the axis
    integers, one for the interleaved value (the spread macro expands
    its argument 32x, so the axis integers must be materialized first),
    one for the string."""
    h = _check_precision(precision)
    n = 1 << h
    chars = " || ".join(
        f"SUBSTRING('{ALPHABET}', "
        f"CAST(((v >> {5 * (precision - 1 - k)}) & 31) + 1 AS INTEGER), 1)"
        for k in range(precision))
    return f"""{out_cte}_ax AS (
  SELECT {id_col},
         GREATEST(0, LEAST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {float(n)!r}) AS BIGINT), {n - 1})) AS ilon,
         GREATEST(0, LEAST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {float(n)!r}) AS BIGINT), {n - 1})) AS ilat
  FROM {src_cte}),
{out_cte}_v AS (
  SELECT {id_col},
         (({_spread_sql('ilon')}) * 2) | ({_spread_sql('ilat')}) AS v
  FROM {out_cte}_ax),
{out_cte} AS (
  SELECT {id_col}, {chars} AS {out_col} FROM {out_cte}_v)"""


# --- neighbors ----------------------------------------------------------------

def decode_int_np(v: np.ndarray, precision: int):
    """(ilat, ilon) axis integers back out of the interleaved hash."""
    h = _check_precision(precision)
    v = np.asarray(v, np.uint64)
    ilon = _compact_np(v >> np.uint64(1))
    ilat = _compact_np(v)
    return ilat.astype(np.int64) & ((1 << h) - 1), \
        ilon.astype(np.int64) & ((1 << h) - 1)


def _compact_np(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_np: gather the even-position bits."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def neighbors_np(gh: str) -> list:
    """The up-to-8 adjacent geohash strings (lon wraps; lat clamps at
    the poles — the cells off the top/bottom edge do not exist)."""
    precision = len(gh)
    h = _check_precision(precision)
    n = 1 << h
    digits = np.array([ALPHABET.index(c) for c in gh], np.uint64)
    v = np.uint64(0)
    for d in digits:
        v = (v << np.uint64(5)) | d
    ilat, ilon = decode_int_np(np.array([v]), precision)
    ilat, ilon = int(ilat[0]), int(ilon[0])
    out = []
    for dlat in (-1, 0, 1):
        for dlon in (-1, 0, 1):
            if dlat == dlon == 0:
                continue
            la = ilat + dlat
            if not (0 <= la < n):
                continue                       # polar edge: no cell there
            lo = (ilon + dlon) % n             # antimeridian wraps
            vv = int((_spread_np(np.array([lo]))[0] << np.uint64(1))
                     | _spread_np(np.array([la]))[0])
            out.append("".join(ALPHABET[(vv >> (5 * (precision - 1 - k))) & 31]
                               for k in range(precision)))
    return sorted(set(out))


# --- rect covering -------------------------------------------------------------

def cover_rect_np(lat_lo: float, lat_hi: float, lon_lo: float, lon_hi: float,
                  precision: int) -> np.ndarray:
    """All geohash cells intersecting the bbox — EXACT, not expanded:
    geohash cells are axis-aligned boxes of the (lat, lon) grid and
    floor is monotone, so a point with lat in [lat_lo, lat_hi] always
    lands in an enumerated ilat row (no circumradius argument needed,
    unlike the hex covering). No antimeridian wrap (lon_lo <= lon_hi
    required — split the box at 180 first)."""
    if not (lat_lo <= lat_hi and lon_lo <= lon_hi):
        raise ValueError("empty or wrapping rect; split at the "
                         "antimeridian first")
    h = _check_precision(precision)
    n = 1 << h

    def axis(lo, hi, offset, span):
        a = int(np.clip(np.floor((lo + offset) / span * n), 0, n - 1))
        b = int(np.clip(np.floor((hi + offset) / span * n), 0, n - 1))
        return np.arange(a, b + 1, dtype=np.int64)

    ilats = axis(lat_lo, lat_hi, 90.0, 180.0)
    ilons = axis(lon_lo, lon_hi, 180.0, 360.0)
    la, lo = np.meshgrid(ilats, ilons, indexing="ij")
    v = ((_spread_np(lo.ravel()) << np.uint64(1))
         | _spread_np(la.ravel())).astype(np.int64)
    out = np.full(v.shape, "", dtype=object)
    for k in range(precision):
        digit = (v >> (5 * (precision - 1 - k))) & 31
        out = np.char.add(out.astype(str),
                          np.array(list(ALPHABET))[digit]).astype(object)
    return out.astype(str)
