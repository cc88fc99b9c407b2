"""Tile-list sources/sinks in the reference's exchange formats.

- areas.list: ``%08d: minLat,minLon to maxLat,maxLon`` in map units with a
  degree comment line (AreaList.write:55-84 / read:150-200). This is the
  reference's canonical tile artifact — emitting it byte-compatible lets
  reference tooling consume our splits directly.
- KML polygon export (AreaList.writeKml:92-148 observable format), a KML
  READER matching the reference parser's contract (KmlParser.java:24-125:
  Placemark name = integer map id, outerBoundaryIs LinearRing with
  exactly 5 lon,lat pairs → map-unit Area), and a GeoJSON twin.
- Osmosis .poly region source: full polygon sections incl. "!"-prefixed
  holes (feeds operators/pip.pip_join) plus the reference's envelope
  semantics (Region.envelope:163-187 — bbox over 3-field lines).
- SRTM-style cell naming N50E014 (srtm2osm/Srtm.getName:59-79).

All driver-side (tile lists are tiny); the at-scale artifacts are the
parquet/lineage tables.
"""

from __future__ import annotations

import math
import re
from typing import List, Sequence

from ..geo.area import Area
from ..geo.units import to_degrees

_LINE = re.compile(
    r"^(\d{8}):\s*(-?\d+),(-?\d+)\s+to\s+(-?\d+),(-?\d+)\s*$")


def write_areas_list(tiles: Sequence[Area], path: str) -> None:
    with open(path, "w") as f:
        for t in tiles:
            f.write(f"{t.map_id:08d}: {t.min_lat},{t.min_long} to {t.max_lat},{t.max_long}\n")
            f.write(f"#       : {to_degrees(t.min_lat)},{to_degrees(t.min_long)}"
                    f" to {to_degrees(t.max_lat)},{to_degrees(t.max_long)}\n")
            f.write("\n")


def read_areas_list(path: str) -> List[Area]:
    tiles: List[Area] = []
    with open(path) as f:
        for line in f:
            m = _LINE.match(line.strip())
            if m:
                map_id, a, b, c, d = (int(g) for g in m.groups())
                tiles.append(Area(a, b, c, d, map_id=map_id))
    return tiles


def write_tiles_kml(tiles: Sequence[Area], path: str) -> None:
    def ring(t: Area) -> str:
        lo1, la1 = to_degrees(t.min_long), to_degrees(t.min_lat)
        lo2, la2 = to_degrees(t.max_long), to_degrees(t.max_lat)
        pts = [(lo1, la1), (lo2, la1), (lo2, la2), (lo1, la2), (lo1, la1)]
        return " ".join(f"{x:.6f},{y:.6f}" for x, y in pts)

    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<kml xmlns="http://earth.google.com/kml/2.1">\n<Document>\n')
        for t in tiles:
            f.write(f"  <Placemark><name>{t.map_id:08d}</name>"
                    f"<Polygon><outerBoundaryIs><LinearRing><coordinates>"
                    f"{ring(t)}</coordinates></LinearRing></outerBoundaryIs>"
                    f"</Polygon></Placemark>\n")
        f.write("</Document>\n</kml>\n")


def read_tiles_kml(path: str) -> List[Area]:
    """KML area source (KmlParser.java:24-125 contract): every Placemark
    must carry an integer <name> (the map id) and a Polygon/
    outerBoundaryIs/LinearRing/coordinates ring of EXACTLY five lon,lat
    pairs (a closed rectangle); corner pairs 0 and 2 become the min/max
    map-unit corners. Raises ValueError on contract violations, like the
    reference parser does."""
    import xml.etree.ElementTree as ET

    from ..geo.units import to_map_unit

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    tiles: List[Area] = []
    root = ET.parse(path).getroot()
    for pm in root.iter():
        if local(pm.tag) != "Placemark":
            continue
        map_id = None
        coords_text = None
        for el in pm.iter():
            if local(el.tag) == "name":
                try:
                    map_id = int(el.text.strip())
                except (TypeError, ValueError):
                    raise ValueError(
                        f"Unexpected area name: expected a valid number, "
                        f"found {el.text!r}")
            elif local(el.tag) == "coordinates":
                coords_text = el.text or ""
        if coords_text is None:
            continue
        if map_id is None:
            # KmlParser.java fails on a Placemark without a parseable
            # <name>; silently emitting map_id=None was laxer (ADVICE r2)
            raise ValueError(
                "Unexpected area name: Placemark with coordinates has no "
                "<name> element")
        pairs = coords_text.strip().split()
        if len(pairs) != 5:
            raise ValueError(
                f"Unexpected number of coordinates: expected 5, found "
                f"{len(pairs)}")
        cc = []
        for p in pairs:
            parts = p.split(",")
            if len(parts) != 2:
                # KmlParser.java raises on pairs != 2 — a lon,lat,alt
                # triple is a contract violation, not a tolerated extra
                raise ValueError(f"Unexpected coordinate pair {p!r}")
            cc.extend([int(to_map_unit(float(parts[0]))),
                       int(to_map_unit(float(parts[1])))])
        # pair 0 = (minLon, minLat), pair 2 = (maxLon, maxLat)
        tiles.append(Area(cc[1], cc[0], cc[5], cc[4], map_id=map_id))
    return tiles


def read_poly(path: str) -> dict:
    """Osmosis .poly region source: {"name": str, "rings": [...],
    "holes": [...]} where each ring/hole is a [(lon, lat), ...] list of
    degree vertices. Sections whose header starts with "!" are holes.
    The vertex lists feed operators/pip.pip_join directly."""
    name = None
    rings: List[list] = []
    holes: List[list] = []
    cur: list | None = None
    cur_hole = False
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if name is None:
                name = line
                continue
            if not line:
                continue
            if line == "END":
                if cur is not None:          # section end
                    (holes if cur_hole else rings).append(cur)
                    cur = None
                continue                      # trailing file END is a no-op
            parts = line.split()
            if cur is None:
                cur_hole = line.startswith("!")
                cur = []
                continue
            if len(parts) >= 2:
                cur.append((float(parts[0]), float(parts[1])))
    return {"name": name or "", "rings": rings, "holes": holes}


def poly_envelope(path: str) -> tuple:
    """(lon_min, lat_min, lon_max, lat_max) over the .poly file with the
    REFERENCE's exact line discipline (Region.envelope:163-187): only
    lines splitting into exactly 3 fields on runs of spaces count, with
    field[1]=lon and field[2]=lat (leading whitespace yields the empty
    first field)."""
    lon1, lon2, lat1, lat2 = 181.0, -181.0, 91.0, -91.0
    with open(path) as f:
        for raw in f:
            s = re.split(" +", raw.rstrip("\n"))
            if len(s) != 3:
                continue
            lon, lat = float(s[1]), float(s[2])
            lon1, lon2 = min(lon, lon1), max(lon, lon2)
            lat1, lat2 = min(lat, lat1), max(lat, lat2)
    return (lon1, lat1, lon2, lat2)


def read_regions_txt(path: str, poly_dir: str | None = None) -> List[dict]:
    """regions.txt source (Osm2garmin.java:219-275 semantics): lines of
    ``lon1 lat1 lon2 lat2 name`` split on runs of spaces; ``#``-comment
    lines are skipped; ``x``-prefixed (GUI-excluded) lines are skipped but
    STILL consume a family id; family ids start at 5001. If
    ``poly_dir/<name>.poly`` exists it overrides the bbox with the poly
    envelope and attaches the parsed polygon (Region.envelope +
    polygonFile behavior)."""
    import os as _os

    regions: List[dict] = []
    family_id = 5001
    with open(path) as f:
        for raw in f:
            l = re.split(" +", raw.strip())
            if len(l) >= 5 and not (l[0].startswith("#") or l[0].startswith("x")):
                reg = {"name": l[4], "family_id": family_id,
                       "lon1": float(l[0]), "lat1": float(l[1]),
                       "lon2": float(l[2]), "lat2": float(l[3]),
                       "poly": None}
                family_id += 1
                if poly_dir is not None:
                    pf = _os.path.join(poly_dir, reg["name"] + ".poly")
                    if _os.path.exists(pf):
                        reg["poly"] = read_poly(pf)
                        lon1, lat1, lon2, lat2 = poly_envelope(pf)
                        reg.update(lon1=lon1, lat1=lat1,
                                   lon2=lon2, lat2=lat2)
                regions.append(reg)
            elif l and l[0].startswith("x"):
                family_id += 1
    return regions


def write_tiles_geojson(tiles: Sequence[Area], path: str) -> None:
    import json
    feats = []
    for t in tiles:
        lo1, la1 = to_degrees(t.min_long), to_degrees(t.min_lat)
        lo2, la2 = to_degrees(t.max_long), to_degrees(t.max_lat)
        feats.append({
            "type": "Feature",
            "properties": {"tile_id": t.map_id, "name": t.name},
            "geometry": {"type": "Polygon", "coordinates": [[
                [lo1, la1], [lo2, la1], [lo2, la2], [lo1, la2], [lo1, la1]]]},
        })
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)


def write_template_args(tiles: Sequence[Area], path: str,
                        description: str = "OSM Map") -> None:
    """mkgmap job manifest (Main.writeArgsFile:494-533 observable format):
    one mapname/description/input-file stanza per tile."""
    with open(path, "w") as f:
        f.write(f"description: {description}\n\n")
        for t in tiles:
            f.write(f"mapname: {t.map_id:08d}\n")
            name = t.name or f"{t.map_id:08d}"
            f.write(f"description: {name}\n")
            f.write(f"input-file: {t.map_id:08d}.parquet\n\n")


def load_cities(spark, path: str):
    """GeoNames-style tab-delimited city source (geo/CityLoader.java:29-89):
    columns name, country, lat, lon, population — small table meant for
    broadcast into name_tiles."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("population", T.LongType()),
    ])
    return spark.read.csv(path, sep="\t", schema=schema, header=False)


def contour_cell_id(lon: float, lat: float) -> int:
    """8-digit per-degree cell id ((lat+90)*360 + lon+180)*1000
    (ContoursUpdater.java:82) — the contour cache key."""
    ilat = math.floor(lat)
    ilon = math.floor(lon)
    return int(((ilat + 90) * 360 + (ilon + 180)) * 1000)


def srtm_cell_name(lon: float, lat: float) -> str:
    """1°×1° raster cell name, e.g. N50E014 (Srtm.getName semantics:
    floor to the south-west corner, N/S + 2-digit lat, E/W + 3-digit lon)."""
    ilat = math.floor(lat)
    ilon = math.floor(lon)
    ns = "N" if ilat >= 0 else "S"
    ew = "E" if ilon >= 0 else "W"
    return f"{ns}{abs(ilat):02d}{ew}{abs(ilon):03d}"
