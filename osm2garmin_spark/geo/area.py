"""Tile bounding boxes ("Area") in integer map units.

Mirrors the reference's Area value semantics (Area.java:21-135):
degenerate dimensions are widened to 1 unit at construction, containment is
closed on all four edges, and ``add`` is bbox union. ``round_area`` ports
``RoundingUtils.round(Area,int)`` (RoundingUtils.java:64-105): edges aligned
to 2^(24-resolution) and width/height forced to multiples of twice the
alignment, with the ±85° polar clamp.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .units import round_down, round_up, to_degrees, to_map_unit


@dataclass(frozen=True)
class Area:
    min_lat: int
    min_long: int
    max_lat: int
    max_long: int
    map_id: int = field(default=0, compare=False)
    name: str = field(default="", compare=False)

    def __post_init__(self):
        # degenerate dims widened to 1 map unit (Area.java:40-51)
        if self.max_lat == self.min_lat:
            object.__setattr__(self, "max_lat", self.min_lat + 1)
        if self.max_long == self.min_long:
            object.__setattr__(self, "max_long", self.min_long + 1)

    @property
    def width(self) -> int:
        return self.max_long - self.min_long

    @property
    def height(self) -> int:
        return self.max_lat - self.min_lat

    def contains(self, lat: int, lon: int) -> bool:
        """Closed containment on all edges (Area.java:121-126)."""
        return (
            lat >= self.min_lat
            and lat <= self.max_lat
            and lon >= self.min_long
            and lon <= self.max_long
        )

    def add(self, other: "Area") -> "Area":
        """Bbox union (Area.java:128-135)."""
        return Area(
            min(self.min_lat, other.min_lat),
            min(self.min_long, other.min_long),
            max(self.max_lat, other.max_lat),
            max(self.max_long, other.max_long),
        )

    def extend(self, extra: int) -> "Area":
        """Extended (overlap-inflated) bounds, OSMXMLWriter.initForWrite:45-49.

        Note: built directly, NOT via the widening constructor — the four
        corners are shifted outward so no degenerate-dim logic can trigger.
        """
        return Area(
            self.min_lat - extra,
            self.min_long - extra,
            self.max_lat + extra,
            self.max_long + extra,
        )

    def to_degrees_tuple(self):
        return (
            to_degrees(self.min_lat),
            to_degrees(self.min_long),
            to_degrees(self.max_lat),
            to_degrees(self.max_long),
        )

    def __str__(self) -> str:  # Area.java toString analogue
        a, b, c, d = self.to_degrees_tuple()
        return f"({a},{b}) to ({c},{d})"


#: the empty area — all-zero corners, 0 width/height (Area.java:23,54-61).
#: Constructed via object.__new__ to bypass the degenerate-dim widening.
EMPTY_AREA = object.__new__(Area)
object.__setattr__(EMPTY_AREA, "min_lat", 0)
object.__setattr__(EMPTY_AREA, "min_long", 0)
object.__setattr__(EMPTY_AREA, "max_lat", 0)
object.__setattr__(EMPTY_AREA, "max_long", 0)
object.__setattr__(EMPTY_AREA, "map_id", 0)
object.__setattr__(EMPTY_AREA, "name", "")


_LAT_CLAMP_LO = to_map_unit(-85.0)
_LAT_CLAMP_HI = to_map_unit(85.0)


def round_area(b: Area, resolution: int) -> Area:
    """Exact port of RoundingUtils.round(Area, int) (RoundingUtils.java:64-105).

    Latitude edges round *up*; longitude edges round *down*; whichever edge
    moved least is pushed out by one more alignment unit when the resulting
    span is not a multiple of twice the alignment. Latitudes clamped to ±85°.
    """
    shift = 24 - resolution
    alignment = 1 << shift

    # identity fast path (round 7): the quadtree recursion re-rounds every
    # subset/trim area (~2 calls per node, tens of thousands per split at
    # resolution 13), and split boundaries are alignment multiples by
    # construction — when all four edges are already aligned, inside the
    # clamp, and parity-matched, every branch below is a no-op, so return
    # the input unchanged (the numpy-backed scalar rounding helpers cost
    # ~100 µs per call).
    mask = alignment - 1
    if ((b.min_lat & mask) == 0 and (b.max_lat & mask) == 0
            and (b.min_long & mask) == 0 and (b.max_long & mask) == 0
            and b.min_lat >= _LAT_CLAMP_LO and b.max_lat <= _LAT_CLAMP_HI
            and (b.min_lat & alignment) == (b.max_lat & alignment)
            and (b.min_long & alignment) == (b.max_long & alignment)):
        return b

    min_lat = max(b.min_lat, to_map_unit(-85.0))
    max_lat = min(b.max_lat, to_map_unit(85.0))

    r_min_lat = round_up(min_lat, shift)
    r_max_lat = round_up(max_lat, shift)
    if (r_min_lat & alignment) != (r_max_lat & alignment):
        if min_lat - r_min_lat < max_lat - r_max_lat:
            r_min_lat -= alignment
        else:
            r_max_lat += alignment

    r_min_lon = round_down(b.min_long, shift)
    r_max_lon = round_down(b.max_long, shift)
    if (r_min_lon & alignment) != (r_max_lon & alignment):
        if b.min_long - r_min_lon < r_max_lon - b.max_long:
            r_min_lon -= alignment
        else:
            r_max_lon += alignment

    return Area(r_min_lat, r_min_lon, r_max_lat, r_max_lon)


#: whole-planet bounds used when no explicit bbox is given
#: (DensityMapCollector.java:30-31)
PLANET = Area(-0x400000, -0x800000, 0x400000, 0x800000)
