"""Hierarchical spatial cell ids (H3/S2 analogue, res 0–16).

No h3/s2 libraries exist in this container, so the engine carries its own
hierarchical index: a Morton (Z-order) interleave of the map-unit grid at a
given resolution. Same role as the reference's coarse grid accelerator
(SplitProcessor.java:412-518) and the north-star's "H3 res 5–9" columns:

- ``cell_id(res)``: 2·res-bit Z-order id; parent = child >> 2 (res-1).
- prefix property: all descendants of a cell share its bit-prefix, so
  range scans / joins on a resolution are partition-prunable.
- ``k_ring``: the (2k+1)² neighborhood (grid-disk) for kNN expansion.

Resolution r splits the planet into 2^r × 2^r cells over longitude ×
latitude map-unit space (lat doubled to square the aspect). Three
implementations share the exact bit semantics: numpy (Arrow UDF side), a
Catalyst column expression (JVM side), and generated ANSI SQL (oracles).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, functions as F

#: planet origin in map units (Area PLANET corners)
ORIGIN_LON = -0x800000
ORIGIN_LAT = -0x400000
LON_SPAN = 1 << 24
LAT_SPAN = 1 << 23

_MASKS = [
    (1, 0x5555555555555555),
    (2, 0x3333333333333333),
    (4, 0x0F0F0F0F0F0F0F0F),
    (8, 0x00FF00FF00FF00FF),
    (16, 0x0000FFFF0000FFFF),
]


# --- numpy ------------------------------------------------------------------

def _spread_np(v: np.ndarray) -> np.ndarray:
    """Insert a zero bit between each bit of the low 32 bits (u64)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def cell_xy_np(lat_mu: np.ndarray, lon_mu: np.ndarray, res: int):
    """(cx, cy) cell coordinates at resolution res (clamped to grid)."""
    cx = (np.asarray(lon_mu, np.int64) - ORIGIN_LON) >> (24 - res)
    cy = ((np.asarray(lat_mu, np.int64) - ORIGIN_LAT) << 1) >> (24 - res)
    lim = (1 << res) - 1
    return np.clip(cx, 0, lim), np.clip(cy, 0, lim)


def cell_id_np(lat_mu: np.ndarray, lon_mu: np.ndarray, res: int) -> np.ndarray:
    """Z-order cell id at resolution res (int64, vectorized)."""
    cx, cy = cell_xy_np(lat_mu, lon_mu, res)
    return (_spread_np(cx) | (_spread_np(cy) << np.uint64(1))).astype(np.int64)


def parent_np(cell: np.ndarray, levels: int = 1) -> np.ndarray:
    return np.asarray(cell, np.int64) >> (2 * levels)


def k_ring_np(cx: int, cy: int, res: int, k: int) -> list:
    """grid-disk: z-order ids of the (2k+1)² neighborhood, grid-clamped."""
    lim = (1 << res) - 1
    out = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            x, y = cx + dx, cy + dy
            if 0 <= x <= lim and 0 <= y <= lim:
                xs = _spread_np(np.array([x]))[0]
                ys = _spread_np(np.array([y]))[0]
                out.append(int(xs | (ys << np.uint64(1))))
    return sorted(set(out))


# --- Catalyst columns --------------------------------------------------------

def _spread_col(v: Column) -> Column:
    for shift, mask in reversed(_MASKS):
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def cell_id_col(lat_mu: Column, lon_mu: Column, res: int) -> Column:
    """JVM-side Z-order cell id at resolution res (whole-stage codegen)."""
    lim = (1 << res) - 1
    cx = F.shiftright(lon_mu - F.lit(ORIGIN_LON), 24 - res)
    cy = F.shiftright(F.shiftleft(lat_mu - F.lit(ORIGIN_LAT), 1), 24 - res)
    cx = F.greatest(F.lit(0), F.least(cx, F.lit(lim)))
    cy = F.greatest(F.lit(0), F.least(cy, F.lit(lim)))
    return _spread_col(cx).bitwiseOR(F.shiftleft(_spread_col(cy), 1))


# --- generated SQL (oracle twin) ---------------------------------------------

def _spread_sql(expr: str) -> str:
    for shift, mask in reversed(_MASKS):
        expr = f"(({expr}) | (({expr}) * {1 << shift})) & {mask}"
    return expr


def cell_id_sql(lat_mu_expr: str, lon_mu_expr: str, res: int) -> str:
    lim = (1 << res) - 1
    cx = f"(({lon_mu_expr}) - ({ORIGIN_LON})) // {1 << (24 - res)}"
    cy = f"((({lat_mu_expr}) - ({ORIGIN_LAT})) * 2) // {1 << (24 - res)}"
    cx = f"GREATEST(0, LEAST({cx}, {lim}))"
    cy = f"GREATEST(0, LEAST({cy}, {lim}))"
    return f"({_spread_sql(cx)}) | (({_spread_sql(cy)}) * 2)"


# --- Hilbert ordering (the S2-style curve) -----------------------------------
#
# S2's defining trait vs Z-order is Hilbert-curve cell ordering: consecutive
# ids are ALWAYS grid neighbors, so range scans touch contiguous geography
# (Z-order jumps at quadrant seams). Same grid/clamp discipline as cell_id;
# integer-exact in both engines — numpy here, a stepwise CTE chain in SQL
# (the classic iterative xy→d bit algorithm; each level is one CTE, so the
# generated SQL grows linearly with resolution, never exponentially).

def hilbert_d_np(cx: np.ndarray, cy: np.ndarray, res: int) -> np.ndarray:
    """(cx, cy) grid coords → Hilbert curve position at resolution res."""
    n = 1 << res
    x = np.asarray(cx, np.int64).copy()
    y = np.asarray(cy, np.int64).copy()
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: if ry==0 (and flip when rx==1), then swap x/y
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, n - 1 - x, x)
        y_f = np.where(flip, n - 1 - y, y)
        x, y = np.where(ry == 0, y_f, x_f), np.where(ry == 0, x_f, y_f)
        s >>= 1
    return d


def hilbert_id_np(lat_mu: np.ndarray, lon_mu: np.ndarray, res: int) -> np.ndarray:
    cx, cy = cell_xy_np(lat_mu, lon_mu, res)
    return hilbert_d_np(cx, cy, res)


def hilbert_sql_ctes(src_cte: str, id_col: str, lat_mu_expr: str,
                     lon_mu_expr: str, res: int, out_cte: str = "hf") -> str:
    """CTE chain computing the same Hilbert position in ANSI SQL: step i
    consumes bit (res-1-i), updates (x, y, d) — one CTE per level."""
    lim = (1 << res) - 1
    n = 1 << res
    cx = (f"GREATEST(0, LEAST((({lon_mu_expr}) - ({ORIGIN_LON})) "
          f"// {1 << (24 - res)}, {lim}))")
    cy = (f"GREATEST(0, LEAST(((({lat_mu_expr}) - ({ORIGIN_LAT})) * 2) "
          f"// {1 << (24 - res)}, {lim}))")
    ctes = [f"h0 AS (SELECT {id_col}, CAST({cx} AS BIGINT) AS x, "
            f"CAST({cy} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d "
            f"FROM {src_cte})"]
    prev = "h0"
    for i in range(res):
        s = 1 << (res - 1 - i)
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        step = f"h{i + 1}"
        ctes.append(
            f"{step} AS (SELECT {id_col}, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {n - 1} - y ELSE y END) ELSE x END AS x, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {n - 1} - x ELSE x END) ELSE y END AS y, "
            f"d + {s * s} * xor(3 * {rx}, {ry}) AS d FROM {prev})")
        prev = step
    ctes.append(f"{out_cte} AS (SELECT {id_col}, d FROM {prev})")
    return ",\n".join(ctes)
