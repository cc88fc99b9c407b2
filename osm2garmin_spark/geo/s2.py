"""True S2 cell ids (quadrilateralized spherical cube + Hilbert curve).

The north-star asks for rows encoded "into H3 (res 5-9) and S2 cells via
vectorized Arrow UDFs". ``geo/cells.py`` carries the engine's planar
Z-order/Hilbert analogue (the container has no s2/h3 libraries); this
module implements the REAL S2 cell-id scheme from the published algorithm
(s2geometry.io, s2coords.h — public spec: cube-face decomposition,
quadratic ST projection, per-face Hilbert curve, 64-bit ids), so an S2
user's cell semantics — 6 faces, levels 0..30, parent/child bit prefix,
range containment, edge neighbors with cross-face wrap — carry over
exactly:

- ``cell_id_from_latlng(lat, lon, level)``: vectorized numpy encode
  (lat/lng → unit XYZ → face+UV → quadratic ST → leaf IJ → Hilbert
  position → id). Ids are the canonical 64-bit layout
  ``face(3) | position(2·level) | 1 | 0…`` viewed as int64 (faces 4-5
  come out negative — a reinterpretation, not a semantic change; all
  mask/range arithmetic is two's-complement-safe and DuckDB BIGINT
  matches).
- ``decode`` / ``cell_center_latlng``: id → (face, i, j, level) → center.
- ``parent_id`` / ``range_min`` / ``range_max`` / ``contains``: the
  prefix algebra (lsb = 1 << 2·(30-level)).
- ``edge_neighbors``: the four same-level edge neighbors, including the
  cross-face wrap (linear UV bridge through XYZ, exactly the published
  FromFaceIJWrap construction).
- ``token``: canonical hex token (trailing zeros stripped).
- ``s2_cell_udf(level)``: Arrow-vectorized pandas_udf column (the
  input_hint's "vectorized pandas/Arrow UDFs" surface — the 30-step
  table-lookup state machine does not belong in a Catalyst expression
  tree; it vectorizes perfectly in numpy).
- ``s2_sql_ctes``: generated ANSI-SQL twin (DuckDB oracle) — one CTE per
  level for the Hilbert state machine, trig/quadratic in plain SQL.
  Float parity note: both engines scale by powers of two (exact in
  binary FP) before the only floor, so the sole cross-engine hazard is
  libm sin/cos ulp drift landing within ~1e-12 of a cell boundary —
  negligible at gate scale and caught by the value-hash if ever hit.

Correctness evidence (tests/test_s2.py): level-0 ids are the six known
face cells (tokens 1,3,5,7,9,b), Hilbert adjacency (consecutive leaf
positions are always grid neighbors — fails for ANY wrong table entry),
encode/decode round-trip at every level, parent/range containment, and
edge neighbors verified GEOMETRICALLY (a point nudged across each edge
midpoint must encode into that neighbor, including face crossings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MAX_LEVEL = 30
MAX_SIZE = 1 << MAX_LEVEL          # leaf cells per face axis

# Published Hilbert-curve tables (s2coords.h): position-within-parent →
# (i,j) quadrant, per orientation; orientation = swap(1) | invert(2).
SWAP_MASK = 1
INVERT_MASK = 2
POS_TO_IJ = np.array([[0, 1, 3, 2],      # orientation 0
                      [0, 2, 3, 1],      # swap
                      [3, 2, 0, 1],      # invert
                      [3, 1, 0, 2]],     # swap | invert
                     dtype=np.int64)
IJ_TO_POS = np.array([[0, 1, 3, 2],      # inverses of the rows above
                      [0, 3, 1, 2],
                      [2, 3, 1, 0],
                      [2, 1, 3, 0]], dtype=np.int64)
POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK],
                              dtype=np.int64)


# --- sphere ↔ cube-face coordinates -----------------------------------------

def latlng_to_xyz(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Largest-|component| face selection + the published per-face UV.

    Tie preference on equal magnitudes is z, then y, then x — exactly
    the canonical LargestAbsComponent branch order (x wins only when
    STRICTLY largest; a tie falls through toward z), so exact-boundary
    points (|x| == |y| etc.) get the same face the s2geometry library
    assigns.  The SQL twin mirrors the same CASE order."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    fx = (ax > ay) & (ax > az)
    fy = ~fx & (ay > az)
    face = np.where(fx, np.where(x >= 0, 0, 3),
                    np.where(fy, np.where(y >= 0, 1, 4),
                             np.where(z >= 0, 2, 5)))
    # np.select evaluates every branch; unselected divisors may be 0 (the
    # selected one never is: max |component| of a unit vector >= 1/sqrt 3)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)
    return np.asarray(face, np.int64), u, v


def face_uv_to_xyz(face, u, v):
    face = np.asarray(face, np.int64)
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [one, -u, -u, -one, v], default=v)
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [u, one, -v, -v, -one], default=u)
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [v, v, one, -u, -u], default=-one)
    return x, y, z


def uv_to_st(u):
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    u = np.asarray(u, np.float64)
    # np.where evaluates both branches; the off-branch sqrt argument can
    # go negative (u in [-1, 1]) — the selected branch never does
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv(s):
    s = np.asarray(s, np.float64)
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def st_to_ij(s):
    """Leaf-scale IJ: round(2^30·s − 0.5) clamped (published STtoIJ)."""
    v = np.floor(MAX_SIZE * np.asarray(s, np.float64) - 0.5 + 0.5)
    return np.clip(v, 0, MAX_SIZE - 1).astype(np.int64)


# --- Hilbert position ↔ IJ ---------------------------------------------------

def _pos_from_ij(face, i, j):
    """Leaf (i, j) → 60-bit Hilbert position (uint64), vectorized: the
    per-bit form of the published lookup-table state machine. Initial
    orientation is face & SWAP_MASK."""
    face = np.asarray(face, np.int64)
    i = np.asarray(i, np.int64)
    j = np.asarray(j, np.int64)
    orient = face & SWAP_MASK
    pos = np.zeros(np.broadcast(face, i, j).shape, np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = 2 * ((i >> k) & 1) + ((j >> k) & 1)
        p = IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ POS_TO_ORIENTATION[p]
    return pos


def _ij_from_pos(face, pos, level):
    """Inverse of _pos_from_ij truncated to ``level`` bit-pairs: returns
    cell-scale (i, j) in [0, 2^level)."""
    face = np.asarray(face, np.int64)
    pos = np.asarray(pos, np.uint64)
    orient = face & SWAP_MASK
    i = np.zeros(np.broadcast(face, pos).shape, np.int64)
    j = np.zeros_like(i)
    for k in range(level):
        p = ((pos >> np.uint64(2 * (level - 1 - k))) & np.uint64(3)) \
            .astype(np.int64)
        ij = POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ POS_TO_ORIENTATION[p]
    return i, j


# --- cell ids ----------------------------------------------------------------

def _lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def cell_id_from_face_ij(face, i, j, level: int = MAX_LEVEL) -> np.ndarray:
    """(face, leaf i, leaf j) → int64 cell id at ``level``."""
    pos = _pos_from_ij(face, i, j)
    leaf = ((np.asarray(face, np.uint64) << np.uint64(61))
            | (pos << np.uint64(1)) | np.uint64(1))
    if level < MAX_LEVEL:
        lsb = np.uint64(_lsb_for_level(level))
        leaf = (leaf & ~(lsb - np.uint64(1))) | lsb
    return np.asarray(leaf, np.uint64).view(np.int64)


def cell_id_from_latlng(lat_deg, lon_deg, level: int = MAX_LEVEL):
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    x, y, z = latlng_to_xyz(lat_deg, lon_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return cell_id_from_face_ij(face, i, j, level)


def level_of(cell_id) -> np.ndarray:
    """MAX_LEVEL − tz/2 where tz = trailing zero count of the id."""
    c = np.asarray(cell_id, np.int64).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # log2 of an exact power of two ≤ 2^60 is float-exact
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return (MAX_LEVEL - (tz >> 1)).astype(np.int64)


def decode(cell_id):
    """id → (face, i_cell, j_cell, level); i/j are cell-scale."""
    c = np.asarray(cell_id, np.int64).view(np.uint64)
    lvl = level_of(cell_id)
    levels = np.unique(np.atleast_1d(lvl))
    if len(levels) != 1:
        raise ValueError("decode() requires a uniform level per batch "
                         f"(got levels {levels.tolist()})")
    level = int(levels[0])
    face = (c >> np.uint64(61)).astype(np.int64)
    pos = (c >> np.uint64(1 + 2 * (MAX_LEVEL - level))) \
        & np.uint64((1 << (2 * level)) - 1)
    i, j = _ij_from_pos(face, pos, level)
    return face, i, j, level


def cell_center_latlng(cell_id):
    """id → (lat, lon) of the cell center (degrees)."""
    face, i, j, level = decode(cell_id)
    scale = 1.0 / (1 << level)
    u = st_to_uv((i + 0.5) * scale)
    v = st_to_uv((j + 0.5) * scale)
    x, y, z = face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def parent_id(cell_id, level: int):
    """Ancestor at ``level`` (caller guarantees level ≤ cell level)."""
    lsb = _lsb_for_level(level)
    return (np.asarray(cell_id, np.int64) & -lsb) | lsb


def range_min(cell_id, level=None):
    c = np.asarray(cell_id, np.int64)
    lsb = _lsb_for_level_arr(c) if level is None else \
        np.full_like(c, _lsb_for_level(level))
    return c - (lsb - 1)


def range_max(cell_id, level=None):
    c = np.asarray(cell_id, np.int64)
    lsb = _lsb_for_level_arr(c) if level is None else \
        np.full_like(c, _lsb_for_level(level))
    return c + (lsb - 1)


def _lsb_for_level_arr(c: np.ndarray) -> np.ndarray:
    u = c.view(np.uint64)
    return (u & (~u + np.uint64(1))).view(np.int64)


def contains(ancestor, descendant) -> np.ndarray:
    """True where ``descendant`` lies in ``ancestor``'s leaf range.

    Signed comparison is safe because both ids share the face bits
    whenever containment is possible, and differing faces compare
    unequal in both signed and unsigned order within the range test."""
    a = np.asarray(ancestor, np.int64)
    d = np.asarray(descendant, np.int64)
    return (range_min(a) <= d) & (d <= range_max(a))


def token(cell_id):
    """Canonical hex token: 16 hex digits, trailing zeros stripped."""
    c = np.atleast_1d(np.asarray(cell_id, np.int64)).view(np.uint64)
    out = [format(int(v), "016x").rstrip("0") or "X" for v in c]
    return out if np.ndim(cell_id) else out[0]


def edge_neighbors(cell_id) -> np.ndarray:
    """The four same-level edge neighbors of each id, shape (n, 4), in
    canonical order (down, right, up, left in IJ space). Cross-face
    neighbors use the published linear-UV wrap: project the out-of-range
    leaf center through XYZ and re-encode on the receiving face."""
    face, i, j, level = decode(cell_id)
    shift = MAX_LEVEL - level
    size = 1 << shift
    i_leaf, j_leaf = i << shift, j << shift
    cand = [(i_leaf, j_leaf - size), (i_leaf + size, j_leaf),
            (i_leaf, j_leaf + size), (i_leaf - size, j_leaf)]
    cols = []
    for ni, nj in cand:
        inside = (ni >= 0) & (ni < MAX_SIZE) & (nj >= 0) & (nj < MAX_SIZE)
        out = cell_id_from_face_ij(
            face, np.clip(ni, 0, MAX_SIZE - 1),
            np.clip(nj, 0, MAX_SIZE - 1), level)
        # the float bridge + full leaf re-encode runs only on the rows
        # that actually cross a face (~4/2^level of them), not the batch
        cross = np.nonzero(~inside)[0]
        if cross.size:
            out = out.copy()
            out[cross] = _from_face_ij_wrap(
                np.asarray(face)[cross], np.asarray(ni)[cross],
                np.asarray(nj)[cross], level)
        cols.append(out)
    return np.stack(cols, axis=-1)


def _from_face_ij_wrap(face, i, j, level):
    """Published FromFaceIJWrap: leaf (i, j) may be one step outside the
    face; bridge with the LINEAR st↔uv scaling (self-inverse across the
    round trip, unlike the quadratic), convert through XYZ, re-encode."""
    limit = 1.0 + np.finfo(np.float64).eps
    scale = 1.0 / MAX_SIZE
    u = np.clip(scale * (2.0 * (np.asarray(i, np.float64)
                                - MAX_SIZE // 2) + 1.0), -limit, limit)
    v = np.clip(scale * (2.0 * (np.asarray(j, np.float64)
                                - MAX_SIZE // 2) + 1.0), -limit, limit)
    x, y, z = face_uv_to_xyz(face, u, v)
    f2, u2, v2 = xyz_to_face_uv(x, y, z)
    return cell_id_from_face_ij(f2, st_to_ij(0.5 * (u2 + 1.0)),
                                st_to_ij(0.5 * (v2 + 1.0)), level)


# --- Spark surface -----------------------------------------------------------

def s2_cell_udf(level: int):
    """Arrow-vectorized (lat, lon) → S2 cell id pandas_udf at ``level``.

    ``pd`` is module-global on purpose: postponed annotations (PEP 563,
    active in this module) make Spark resolve the hint strings against
    the function's globals."""
    from pyspark.sql import functions as F

    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")

    @F.pandas_udf("long")
    def _s2(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        # null/NaN coordinates -> null id (matching the SQL twin, which
        # propagates NULL; casting NaN to int64 would mint a plausible-
        # looking but arbitrary cell id)
        ok = np.isfinite(la) & np.isfinite(lo)
        ids = np.atleast_1d(cell_id_from_latlng(
            np.where(ok, la, 0.0), np.where(ok, lo, 0.0), level))
        arr = pd.array(ids, dtype="Int64")
        arr[~np.atleast_1d(ok)] = pd.NA
        return pd.Series(arr)

    return _s2


def s2_ring_udf(level: int):
    """Arrow-vectorized (lat, lon) -> array of the <=13 distinct level-L
    cells {c} U EN(c) U EN(EN(c)) — a strict superset of c's
    8-neighborhood (the straight distance-2 cells come along; vertex
    neighbors at cube-face corners, where a cell has only 3, are
    covered without corner-case geometry). The blocking key set of the
    S2-blocked range join (operators/range_join.py). NULL/NaN
    coordinates -> NULL (the row drops out of an inner join).

    Lives here rather than in range_join.py because postponed
    annotations there would strip ``pd`` from the hint's resolution
    scope (see s2_cell_udf)."""
    from pyspark.sql import functions as F

    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")

    @F.pandas_udf("array<long>")
    def _ring(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        ok = np.atleast_1d(np.isfinite(la) & np.isfinite(lo))
        c = np.atleast_1d(cell_id_from_latlng(
            np.where(ok, la, 0.0), np.where(ok, lo, 0.0), level))
        en = edge_neighbors(c)                       # (n, 4)
        mats = [c.reshape(-1, 1), en]
        mats += [edge_neighbors(en[:, k]) for k in range(4)]
        cells = np.concatenate(mats, axis=1)         # (n, 21) with dups
        out = [list(dict.fromkeys(row.tolist())) if okk else None
               for row, okk in zip(cells, ok)]
        return pd.Series(out, dtype=object)

    return _ring


# --- generated SQL (oracle twin) ---------------------------------------------

def s2_sql_ctes(src_cte: str, id_col: str, lat_expr: str, lon_expr: str,
                level: int, out_cte: str = "s2f",
                prefix: str = "s2") -> str:
    """CTE chain computing the SAME id in ANSI SQL (DuckDB): trig + face
    CASE + quadratic ST + one CTE per level for the Hilbert state
    machine; the final id assembles in HUGEINT and wraps to signed
    BIGINT exactly like the numpy uint64→int64 view. ``prefix`` namespaces
    the intermediate CTEs so several chains can share one query."""
    n = 1 << level
    x = f"cos(radians({lat_expr})) * cos(radians({lon_expr}))"
    y = f"cos(radians({lat_expr})) * sin(radians({lon_expr}))"
    z = f"sin(radians({lat_expr}))"
    face = ("CASE WHEN abs(x) > abs(y) AND abs(x) > abs(z) THEN "
            "(CASE WHEN x >= 0 THEN 0 ELSE 3 END) "
            "WHEN abs(y) > abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END) "
            "ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END")
    u = ("CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z "
         "WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END")
    v = ("CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z "
         "WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END")
    st = ("CASE WHEN {c} >= 0 THEN 0.5 * sqrt(1 + 3 * {c}) "
          "ELSE 1 - 0.5 * sqrt(1 - 3 * {c}) END")
    # floor(s·2^level) == floor(s·2^30) >> (30-level): power-of-two
    # scaling is exact in binary FP, so this matches the numpy leaf path
    ij = "CAST(LEAST(GREATEST(FLOOR({s} * " + str(n) + "), 0), " \
        + str(n - 1) + ") AS BIGINT)"
    ctes = [
        f"{prefix}xyz AS (SELECT {id_col}, {x} AS x, {y} AS y, {z} AS z "
        f"FROM {src_cte})",
        f"{prefix}face AS (SELECT {id_col}, x, y, z, {face} AS face "
        f"FROM {prefix}xyz)",
        f"{prefix}uv AS (SELECT {id_col}, face, {u} AS u, {v} AS v "
        f"FROM {prefix}face)",
        f"{prefix}ij AS (SELECT {id_col}, face, "
        f"{ij.format(s=st.format(c='u'))} AS i, "
        f"{ij.format(s=st.format(c='v'))} AS j, "
        f"face & 1 AS orient, CAST(0 AS HUGEINT) AS pos FROM {prefix}uv)",
    ]
    # flat lookup tables keyed orient*4 + ij / pos
    ij2pos = " ".join(f"WHEN {o * 4 + q} THEN {IJ_TO_POS[o, q]}"
                      for o in range(4) for q in range(4))
    p2or = " ".join(f"WHEN {p} THEN {POS_TO_ORIENTATION[p]}"
                    for p in range(4))
    prev = f"{prefix}ij"
    for k in range(level - 1, -1, -1):
        step = f"{prefix}h{level - 1 - k}"
        p = (f"(CASE orient * 4 + (2 * ((i // {1 << k}) & 1) + "
             f"((j // {1 << k}) & 1)) {ij2pos} END)")
        ctes.append(
            f"{step} AS (SELECT {id_col}, face, i, j, "
            f"xor(orient, CASE {p} {p2or} END) AS orient, "
            f"pos * 4 + {p} AS pos FROM {prev})")
        prev = step
    shift1 = 1 + 2 * (MAX_LEVEL - level)
    sentinel = 1 << (2 * (MAX_LEVEL - level))
    ctes.append(
        f"{out_cte} AS (SELECT {id_col}, CAST("
        f"CAST(face AS HUGEINT) * 2305843009213693952 "
        f"+ pos * {1 << shift1} + {sentinel} "
        f"- (CASE WHEN face >= 4 THEN 18446744073709551616 ELSE 0 END) "
        f"AS BIGINT) AS s2_cell FROM {prev})")
    return ",\n".join(ctes)


# --- covering compaction (S2 cell-union normalization twins) ------------------

def children_ids(cell_id):
    """The 4 children of each cell, one level finer (s2geometry
    child_begin/next semantics: child k sits at id - lsb + (2k+1)·lsb/4,
    partitioning the parent's leaf range exactly)."""
    c = np.atleast_1d(np.asarray(cell_id, np.int64))
    lsb = _lsb_for_level_arr(c)
    if np.any(lsb == np.int64(1)):
        raise ValueError("leaf cells (level 30) have no children")
    lc = lsb >> np.int64(2)
    ks = np.arange(4, dtype=np.int64)[None, :]
    out = c[:, None] - lsb[:, None] + (2 * ks + 1) * lc[:, None]
    return out if np.ndim(cell_id) else out[0]


def compact_np(ids) -> np.ndarray:
    """Driver/numpy reference of S2 cell-union normalization: replace
    every complete set of 4 siblings by their parent, repeatedly,
    bottom-up (s2geometry ``S2CellUnion::Normalize`` semantics; mixed
    levels allowed). Input is expected to be a
    non-overlapping set (a covering): an ancestor already present in the
    input is kept as-is alongside any surviving descendants, it does not
    absorb them. Test twin of the distributed ``s2_compact``."""
    cur = set(int(c) for c in np.unique(np.asarray(ids, np.int64)))
    out: set = set()
    for level in range(MAX_LEVEL, 0, -1):
        lsb = _lsb_for_level(level)
        at = [c for c in cur if (c & -c) == lsb]
        if not at:
            continue
        groups: dict = {}
        for c in at:
            cur.discard(c)
            groups.setdefault(int(parent_id(c, level - 1)), []).append(c)
        for p, ch in groups.items():
            if len(ch) == 4:
                cur.add(p)
            else:
                out.update(ch)
    out.update(cur)
    return np.array(sorted(out), dtype=np.int64)


def s2_parent_col(id_col, level: int):
    """Ancestor at ``level`` as pure-JVM bit algebra on the canonical id
    ((id & -lsb) | lsb — works from ANY finer level in one step)."""
    from pyspark.sql import functions as F
    lsb = _lsb_for_level(level)
    return id_col.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def s2_compact(cells, id_col: str = "cell_id", base_level: int = MAX_LEVEL):
    """Distributed S2 cell-union normalization (the quad twin of
    geo/hex.py:hex_compact): one pass per level, finest first — cells at
    the level key by their parent, a window count over the parent
    partition splits complete 4-sibling groups (promoted) from
    incomplete ones (emitted). One shuffle per level over a shrinking
    metadata-scale set, localCheckpoint plan truncation; input cells
    finer than ``base_level`` fail loudly."""
    from pyspark.sql import Window, functions as F

    lsb_base = _lsb_for_level(base_level)
    trailing = F.col(id_col).bitwiseAND(-F.col(id_col))
    guard = F.when(trailing >= lsb_base, F.col(id_col)) \
        .otherwise(F.raise_error(F.lit(
            f"s2_compact: cell finer than base_level={base_level} "
            f"(pass the encode level)")))
    cur = cells.select(guard.alias("cell_id")).distinct()
    lsb_of = F.col("cell_id").bitwiseAND(-F.col("cell_id"))
    kept = []
    for level in range(base_level, 0, -1):
        cur = cur.localCheckpoint(eager=True)
        lsb = _lsb_for_level(level)
        at_l = cur.filter(lsb_of == lsb)
        rest = cur.filter(lsb_of != lsb)
        flagged = (at_l
                   .select("cell_id",
                           s2_parent_col(F.col("cell_id"), level - 1)
                           .alias("_p"))
                   .withColumn("_c", F.count(F.lit(1)).over(
                       Window.partitionBy("_p"))))
        kept.append(flagged.filter(F.col("_c") < 4).select("cell_id")
                    .localCheckpoint(eager=True))
        promoted = (flagged.filter(F.col("_c") == 4)
                    .select(F.col("_p").alias("cell_id")).distinct())
        cur = rest.unionByName(promoted)
    out = cur
    for k in kept:
        out = out.unionByName(k)
    return out


def s2_uncompact(cells, level: int, id_col: str = "cell_id"):
    """Expand every cell to its 4^(level - l) descendants at ``level``
    via the exact children algebra (Arrow row-expander; inverse of
    ``s2_compact`` on uniform-level sets, pinned in tests)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")

    def kernel(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(np.int64)
            lv = level_of(ids)
            if np.any(lv > level):
                raise ValueError("s2_uncompact: cell finer than target level")
            outs = []
            for l in np.unique(lv):
                cur = ids[lv == l]
                for _ in range(int(l), level):
                    cur = children_ids(cur).reshape(-1)
                outs.append(cur)
            yield pd.DataFrame({id_col: np.concatenate(outs)
                                if outs else np.array([], np.int64)})

    return cells.select(id_col).mapInPandas(kernel, schema=f"{id_col} long")
