"""Tile-list sources/sinks in the reference's exchange formats.

- areas.list: ``%08d: minLat,minLon to maxLat,maxLon`` in map units with a
  degree comment line (AreaList.write:55-84 / read:150-200). This is the
  reference's canonical tile artifact — emitting it byte-compatible lets
  reference tooling consume our splits directly.
- KML polygon export (AreaList.writeKml:92-148 observable format) and a
  GeoJSON twin for modern consumers.
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
