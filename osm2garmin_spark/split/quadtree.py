"""Driver-side density grid + recursive weighted-median quadtree split.

This is the analytics core of the reference's splitter pass 1, ported
integer-exact so tile boundaries reproduce bit-for-bit:

- ``DensityGrid``            ≙ DensityMap.java:24-220 (subset, trim, cell codec)
- ``SplittableDensityArea``  ≙ SplittableDensityArea.java:27-196 (split
                               recursion, aspect ratio, weighted-mean split
                               point, 3/5-quantile clamp, even-parity split,
                               interleave+reverse result mixing)

The *histogram itself* is computed distributed (see ``split.density``); only
the ≤ (8192×4096) counts grid ever reaches the driver, so this scales to
arbitrarily many input rows.

Java-semantics notes (SURVEY.md §7.3 "what's hard"):
- ``int`` casts truncate toward zero (np.trunc / int()).
- ``>>>`` handled by geo.units.round_* helpers.
- ``(int)(weightedSum / sum)`` is long division of non-negatives → ``//``.
- aspect ratio uses cos of the *rounded* bounds' min/max latitude.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..geo.area import Area, EMPTY_AREA, round_area
from ..geo.units import to_degrees, to_map_unit


class DensityGrid:
    """Dense 2D histogram of node counts over a rounded area.

    Indexing is [x][y] like the reference (x = longitude cell, y = latitude
    cell); shift = 24 - resolution (DensityMap.java:37-45).
    """

    def __init__(self, area: Area, trim: bool, resolution: int,
                 counts: Optional[np.ndarray] = None):
        assert 1 <= resolution <= 24
        self.shift = 24 - resolution
        self.trim_enabled = trim
        if area is EMPTY_AREA or (area.width == 0 or area.height == 0):
            self.bounds = EMPTY_AREA
            self.width = 0
            self.height = 0
            self.grid = np.zeros((0, 0), dtype=np.int64)
            self.total = 0
            return
        self.bounds = round_area(area, resolution)
        self.height = self.bounds.height >> self.shift
        self.width = self.bounds.width >> self.shift
        if isinstance(counts, str) and counts == "defer":
            # caller assigns .grid/.total itself (subset fast path)
            self.grid = None
            self.total = 0
            return
        if counts is None:
            self.grid = np.zeros((self.width, self.height), dtype=np.int64)
        else:
            assert counts.shape == (self.width, self.height)
            self.grid = counts
        self.total = int(self.grid.sum())

    # --- cell codecs (DensityMap.java:203-219) -------------------------
    def lon_to_x(self, lon: int) -> int:
        return (lon - self.bounds.min_long) >> self.shift

    def lat_to_y(self, lat: int) -> int:
        return (lat - self.bounds.min_lat) >> self.shift

    def x_to_lon(self, x: int) -> int:
        return (x << self.shift) + self.bounds.min_long

    def y_to_lat(self, y: int) -> int:
        return (y << self.shift) + self.bounds.min_lat

    # --- population -----------------------------------------------------
    def add_counts(self, xs: np.ndarray, ys: np.ndarray, counts: np.ndarray):
        """Accumulate pre-aggregated (x, y, count) cell triples.

        Callers compute x/y with addNode semantics (DensityMap.java:63-78):
        containment-filtered, x==width / y==height clamped to the last cell.
        """
        np.add.at(self.grid, (xs, ys), counts)
        self.total = int(self.grid.sum())
        if getattr(self, "_sat", None) is not None:
            del self._sat          # mutation invalidates the table

    def node_count(self) -> int:
        return self.total

    # --- summed-area table (round 7) ------------------------------------
    # The split recursion reads each node's subgrid ~4 times (subset
    # total, trim occupancy both axes, weighted-median axis sums) — at
    # resolution 13 that is O(grid_cells × tree_depth) element reads,
    # ~5.6 s of the sf1.0 tiling_pipeline_counts wall on this machine.
    # One prefix-sum pass S[i, j] = grid[:i, :j].sum() makes every
    # rectangle total O(1) and every per-axis sum vector O(edge), and the
    # results are the SAME exact int64 values (counts are non-negative,
    # verified at build time, so `colsum > 0` is exactly the occupancy
    # `any()` the trim loops need). Subsets inherit the parent's table
    # with an absolute offset plus a valid-data extent (the zero padding
    # an unaligned subset copy introduces contributes 0 to every sum).

    def build_sat(self):
        """Build the shared summed-area table on a data-owning grid.
        Call after population; no-op for empty or negative-count grids
        (negative counts would break the occupancy probe — every method
        falls back to the direct numpy passes without a table)."""
        if self.grid is None or self.grid.size == 0:
            return
        if bool((self.grid < 0).any()):
            return
        sat = np.zeros((self.width + 1, self.height + 1), dtype=np.int64)
        # accumulate straight into the table: axis=1 first (contiguous
        # inner axis), then an in-place scan along axis=0 — avoids two
        # grid-sized intermediates on a bandwidth-starved machine
        np.cumsum(self.grid, axis=1, out=sat[1:, 1:])
        np.add.accumulate(sat[1:, 1:], axis=0, out=sat[1:, 1:])
        self._sat = sat
        self._sat_ox = 0
        self._sat_oy = 0
        self._ext = (0, 0, self.width, self.height)

    def _rect_sum(self, x0: int, x1: int, y0: int, y1: int) -> int:
        """grid[x0:x1, y0:y1].sum() in local coords via the table."""
        ex0, ey0, ex1, ey1 = self._ext
        a, b = max(x0, ex0), min(x1, ex1)
        c, d = max(y0, ey0), min(y1, ey1)
        if a >= b or c >= d:
            return 0
        s = self._sat
        ox, oy = self._sat_ox, self._sat_oy
        return int(s[ox + b, oy + d] - s[ox + a, oy + d]
                   - s[ox + b, oy + c] + s[ox + a, oy + c])

    def _colsums(self, x0: int, x1: int, y0: int, y1: int) -> np.ndarray:
        """grid[x0:x1, y0:y1].sum(axis=1) in local coords via the table."""
        out = np.zeros(max(x1 - x0, 0), dtype=np.int64)
        ex0, ey0, ex1, ey1 = self._ext
        a, b = max(x0, ex0), min(x1, ex1)
        c, d = max(y0, ey0), min(y1, ey1)
        if a < b and c < d:
            s = self._sat
            ox, oy = self._sat_ox, self._sat_oy
            edge = s[ox + a: ox + b + 1, oy + d] - s[ox + a: ox + b + 1, oy + c]
            out[a - x0: b - x0] = edge[1:] - edge[:-1]
        return out

    def _rowsums(self, x0: int, x1: int, y0: int, y1: int) -> np.ndarray:
        """grid[x0:x1, y0:y1].sum(axis=0) in local coords via the table."""
        out = np.zeros(max(y1 - y0, 0), dtype=np.int64)
        ex0, ey0, ex1, ey1 = self._ext
        a, b = max(x0, ex0), min(x1, ex1)
        c, d = max(y0, ey0), min(y1, ey1)
        if a < b and c < d:
            s = self._sat
            ox, oy = self._sat_ox, self._sat_oy
            edge = s[ox + b, oy + c: oy + d + 1] - s[ox + a, oy + c: oy + d + 1]
            out[c - y0: d - y0] = edge[1:] - edge[:-1]
        return out

    # --- subset + trim (DensityMap.java:88-179) -------------------------
    def subset(self, sub: Area) -> "DensityGrid":
        resolution = 24 - self.shift
        min_lat = max(self.bounds.min_lat, sub.min_lat)
        min_lon = max(self.bounds.min_long, sub.min_long)
        max_lat = min(self.bounds.max_lat, sub.max_lat)
        max_lon = min(self.bounds.max_long, sub.max_long)
        if min_lat > max_lat or min_lon > max_lon:
            return DensityGrid(EMPTY_AREA, self.trim_enabled, resolution)

        sub = Area(min_lat, min_lon, max_lat, max_lon)
        if self.trim_enabled:
            sub = self._trim(sub)
        if sub is EMPTY_AREA or sub.width == 0 or sub.height == 0:
            return DensityGrid(EMPTY_AREA, self.trim_enabled, resolution)

        result = DensityGrid(sub, self.trim_enabled, resolution,
                             counts="defer")
        start_x = self.lon_to_x(sub.min_long)
        start_y = self.lat_to_y(sub.min_lat)
        # window extent from the (possibly unaligned) subset area like the
        # reference's arraycopy loop (DensityMap.java:119-135); clamp to the
        # rounded result dims for safety
        max_x = min(sub.width >> self.shift, result.width)
        max_y = min(sub.height >> self.shift, result.height)
        view = self.grid[start_x:start_x + max_x, start_y:start_y + max_y]
        if view.shape == (result.width, result.height):
            # grids are read-only after build — a view avoids copying the
            # subtree at every quadtree recursion level
            result.grid = view
        else:
            result.grid = np.zeros((result.width, result.height), dtype=np.int64)
            result.grid[:max_x, :max_y] = view
        if getattr(self, "_sat", None) is not None:
            # inherit the table: local (0,0) sits at parent-local
            # (start_x, start_y); the valid-data extent shrinks by the
            # same shift and clips to the child dims
            ex0, ey0, ex1, ey1 = self._ext
            result._sat = self._sat
            result._sat_ox = self._sat_ox + start_x
            result._sat_oy = self._sat_oy + start_y
            result._ext = (max(0, ex0 - start_x), max(0, ey0 - start_y),
                           min(result.width, ex1 - start_x),
                           min(result.height, ey1 - start_y))
            result.total = result._rect_sum(0, result.width,
                                            0, result.height)
        else:
            result.total = int(result.grid.sum())
        return result

    def _trim(self, area: Area) -> Area:
        """Shave empty edge rows/columns then re-round (DensityMap.java:137-179).

        Vectorized: first/last occupied column within the y-window, then
        first/last occupied row within the trimmed x-window — identical
        semantics to the reference's four scan loops, two numpy passes."""
        min_x = self.lon_to_x(area.min_long)
        max_x = self.lon_to_x(area.max_long)
        min_y = self.lat_to_y(area.min_lat)
        max_y = self.lat_to_y(area.max_lat)

        if getattr(self, "_sat", None) is not None:
            # occupancy via per-axis sums from the table (counts are
            # non-negative by build_sat's check, so sum > 0 == any)
            occ_x = np.nonzero(
                self._colsums(min_x, max_x, min_y, max_y) > 0)[0]
        else:
            win = self.grid[min_x:max_x, min_y:max_y]
            occ_x = np.nonzero(win.any(axis=1))[0]
        if len(occ_x) == 0:
            return EMPTY_AREA
        new_min_x = min_x + int(occ_x[0])
        new_max_x = min_x + int(occ_x[-1]) + 1
        if getattr(self, "_sat", None) is not None:
            occ_y = np.nonzero(
                self._rowsums(new_min_x, new_max_x, min_y, max_y) > 0)[0]
        else:
            occ_y = np.nonzero(
                self.grid[new_min_x:new_max_x, min_y:max_y].any(axis=0))[0]
        if len(occ_y) == 0:
            return EMPTY_AREA
        min_x, max_x = new_min_x, new_max_x
        min_y, max_y = min_y + int(occ_y[0]), min_y + int(occ_y[-1]) + 1

        trimmed = Area(self.y_to_lat(min_y), self.x_to_lon(min_x),
                       self.y_to_lat(max_y), self.x_to_lon(max_x))
        rounded = round_area(trimmed, 24 - self.shift)

        # keep the rounding inside the original boundaries (DensityMap.java:166-175)
        lat_adjust = max(0, rounded.max_lat - area.max_lat)
        lon_adjust = max(0, rounded.max_long - area.max_long)
        if lat_adjust > 0 or lon_adjust > 0:
            rounded = Area(rounded.min_lat - lat_adjust,
                           rounded.min_long - lon_adjust,
                           rounded.max_lat - lat_adjust,
                           rounded.max_long - lon_adjust)
        return rounded


class SplittableDensityArea:
    """Recursive split of a density grid into areas of ≤ max_nodes counts.

    Port of SplittableDensityArea.java:27-196.
    """

    def __init__(self, densities: DensityGrid):
        self.densities: Optional[DensityGrid] = densities

    def get_bounds(self) -> Area:
        return self.densities.bounds

    def get_aspect_ratio(self) -> float:
        """SplittableDensityArea.java:40-48 — width cos-corrected at both
        latitudes, Java (int) truncation."""
        d = self.densities
        bounds = d.bounds
        width1 = int(np.trunc(d.width * math.cos(math.radians(to_degrees(bounds.min_lat)))))
        width2 = int(np.trunc(d.width * math.cos(math.radians(to_degrees(bounds.max_lat)))))
        width = max(width1, width2)
        return float(width) / d.height

    def split(self, max_nodes: int) -> List[Area]:
        """SplittableDensityArea.java:52-100."""
        d = self.densities
        if d is None or d.node_count() == 0:
            return []
        bounds = d.bounds
        if d.node_count() <= max_nodes:
            self.densities = None
            return [bounds]
        if d.width < 4 and d.height < 4:
            return [bounds]

        split_result = None
        split_x = self._get_split_horiz()
        split_y = self._get_split_vert()

        if self.get_aspect_ratio() <= 1.0 and d.height >= 4 and split_y is not None:
            split_result = self._split_vert(split_y)
        if split_result is None and d.width >= 4 and split_x is not None:
            split_result = self._split_horiz(split_x)
        if self.get_aspect_ratio() > 1.0 and split_result is None and d.height >= 4 and split_y is not None:
            split_result = self._split_vert(split_y)
        if split_result is None:
            return [bounds]

        self.densities = None
        return _mix_results(split_result[0].split(max_nodes),
                            split_result[1].split(max_nodes))

    # --- split point selection (SplittableDensityArea.java:127-196) -----
    # colsum/rowsum computed once per node (two grid passes serve both axes)
    def _axis_sums(self):
        if getattr(self, "_sums", None) is None:
            d = self.densities
            if getattr(d, "_sat", None) is not None:
                self._sums = (d._colsums(0, d.width, 0, d.height),
                              d._rowsums(0, d.width, 0, d.height))
            else:
                g = d.grid
                self._sums = (g.sum(axis=1), g.sum(axis=0))
        return self._sums

    def _get_split_horiz(self) -> Optional[int]:
        colsum, _ = self._axis_sums()
        s = int(colsum.sum())
        ws = int((colsum * np.arange(len(colsum), dtype=np.int64)).sum())
        return self._limit(0, self.densities.width, ws // s)

    def _get_split_vert(self) -> Optional[int]:
        _, rowsum = self._axis_sums()
        s = int(rowsum.sum())
        ws = int((rowsum * np.arange(len(rowsum), dtype=np.int64)).sum())
        return self._limit(0, self.densities.height, ws // s)

    @staticmethod
    def _limit(first: int, second: int, calc_offset: int) -> Optional[int]:
        """Clamp to middle 3/5 quantiles, force even parity
        (SplittableDensityArea.java:182-196)."""
        mid = first + calc_offset
        limitoff = (second - first) // 5
        if mid - first < limitoff:
            mid = first + limitoff
        elif second - mid < limitoff:
            mid = second - limitoff
        if mid % 2 != 0:
            mid -= 1
        if mid == first or mid == second:
            return None
        return mid

    def _split_horiz(self, split_x: int):
        d = self.densities
        bounds = d.bounds
        mid = bounds.min_long + (split_x << d.shift)
        left = Area(bounds.min_lat, bounds.min_long, bounds.max_lat, mid)
        right = Area(bounds.min_lat, mid, bounds.max_lat, bounds.max_long)
        return (SplittableDensityArea(d.subset(left)),
                SplittableDensityArea(d.subset(right)))

    def _split_vert(self, split_y: int):
        d = self.densities
        bounds = d.bounds
        mid = bounds.min_lat + (split_y << d.shift)
        bottom = Area(bounds.min_lat, bounds.min_long, mid, bounds.max_long)
        top = Area(mid, bounds.min_long, bounds.max_lat, bounds.max_long)
        return (SplittableDensityArea(d.subset(bottom)),
                SplittableDensityArea(d.subset(top)))


def _mix_results(a1: List[Area], a2: List[Area]) -> List[Area]:
    """Interleave the two halves' results then reverse
    (SplittableDensityArea.java:103-122). The order defines sequential
    map-id assignment (Main.java:181-195), so it must be exact."""
    results: List[Area] = []
    i = j = 0
    while i < len(a1) and j < len(a2):
        results.append(a1[i]); i += 1
        results.append(a2[j]); j += 1
    results.extend(a1[i:])
    results.extend(a2[j:])
    results.reverse()
    return results


def rounded_split_bounds(exact_area: Area, resolution: int) -> Area:
    """round_area plus the sliver-coverage guard — the ONE bbox both the
    driver split (split_area) and the distributed twin
    (split.distributed.split_area_distributed) must use, or they diverge.

    Robustness divergence #2 (same spirit as split_area's empty-areas
    retry): RoundingUtils.round moves the min-lat edge UP and the max-lon
    edge DOWN (RoundingUtils.java:74,89), so data confined to a
    sub-alignment sliver along those two edges falls OUTSIDE the rounded
    bbox — the subset grid never sees those rows, trim hugs the surviving
    bands, and real input points end up in no tile (the ±overlap
    extension cannot rescue them once trim has pulled the nearest tile a
    whole band away). Detect the exclusion and pad the exact bbox by one
    alignment on the excluded side(s); round_area's own parity adjustment
    often pulls an edge outward already, in which case nothing changes
    and tile boundaries stay bit-identical to the reference. The ±85°
    polar clamp is the reference's intentional discard and is honoured
    (no pad below it) — which carries a documented residual: data in the
    sub-alignment band between to_map_unit(-85) and its round-up is
    still excluded, because the PLANET density grid itself starts at the
    rounded clamp (density_cells' containment filter) — exactly the
    reference's near-pole behavior (DensityMapCollector never counts
    those nodes either). Fixing it would mean diverging from the
    TestRounding-pinned clamp semantics, not just padding here."""
    bbounds = round_area(exact_area, resolution)
    align = 1 << (24 - resolution)
    clamped_min_lat = max(exact_area.min_lat, to_map_unit(-85.0))
    grow_down = bbounds.min_lat > clamped_min_lat
    grow_right = bbounds.max_long < exact_area.max_long
    if grow_down or grow_right:
        padded = Area(exact_area.min_lat - (align if grow_down else 0),
                      exact_area.min_long,
                      exact_area.max_lat,
                      exact_area.max_long + (align if grow_right else 0))
        bbounds = round_area(padded, resolution)
    return bbounds


def split_area(grid: DensityGrid, exact_area: Area, resolution: int,
               max_nodes: int, first_map_id: int = 63240001) -> List[Area]:
    """Pass-1 tail: round the exact data bbox, subset+trim the planet density
    grid, split, assign sequential map ids (Main.java:177-195 + nodes.
    getRoundedArea, DensityMapCollector.java:80-83). Returns Areas with
    map_id set in reference traversal order."""
    bbounds = rounded_split_bounds(exact_area, resolution)
    if getattr(grid, "_sat", None) is None:
        grid.build_sat()           # one pass; every recursion node O(edge)
    splittable = SplittableDensityArea(grid.subset(bbounds))
    areas = splittable.split(max_nodes)
    if not areas and grid.node_count() > 0:
        # Robustness divergence from the reference: RoundingUtils.round rounds
        # the min-lat edge *up* (RoundingUtils.java:74), so data confined to a
        # sub-alignment sliver can round to a bbox that misses every point and
        # the split yields no tiles (the reference would emit an empty
        # areas.list here). Pad the exact bbox by one alignment and retry so a
        # non-empty input always produces ≥1 tile.
        padded = round_area(exact_area.extend(1 << (24 - resolution)), resolution)
        areas = SplittableDensityArea(grid.subset(padded)).split(max_nodes)
    out = []
    for i, a in enumerate(areas):
        out.append(Area(a.min_lat, a.min_long, a.max_lat, a.max_long,
                        map_id=first_map_id + i))
    return out
