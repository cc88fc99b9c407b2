"""areas.list round-trip, KML/GeoJSON export, SRTM cell names, tile naming,
multi-polygon PIP join."""

import json
import os

import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.geo.area import Area
from osm2garmin_spark.sources.io import (
    write_areas_list, read_areas_list, write_tiles_kml, write_tiles_geojson,
    srtm_cell_name,
)
from osm2garmin_spark.operators.naming import name_tiles
from osm2garmin_spark.operators.pip import pip_join

TILES = [Area(-100000, -200000, 300000, 400000, map_id=63240001),
         Area(300000, -200000, 700000, 400000, map_id=63240002)]


def test_areas_list_roundtrip(tmp_path):
    p = str(tmp_path / "areas.list")
    write_areas_list(TILES, p)
    back = read_areas_list(p)
    assert [(t.map_id, t.min_lat, t.min_long, t.max_lat, t.max_long) for t in back] \
        == [(t.map_id, t.min_lat, t.min_long, t.max_lat, t.max_long) for t in TILES]
    # format is the reference's `%08d: a,b to c,d` (AreaList.java:55-84)
    first = open(p).readline()
    assert first == "63240001: -100000,-200000 to 300000,400000\n"


def test_kml_geojson(tmp_path):
    k = str(tmp_path / "t.kml")
    g = str(tmp_path / "t.geojson")
    write_tiles_kml(TILES, k)
    write_tiles_geojson(TILES, g)
    assert "<Placemark><name>63240001</name>" in open(k).read()
    gj = json.load(open(g))
    assert len(gj["features"]) == 2
    assert gj["features"][0]["properties"]["tile_id"] == 63240001


def test_srtm_cell_name():
    assert srtm_cell_name(14.2, 50.7) == "N50E014"
    assert srtm_cell_name(-0.5, -0.5) == "S01W001"
    assert srtm_cell_name(-122.4, 37.7) == "N37W123"


def test_name_tiles_argmax(spark):
    cities = spark.createDataFrame(
        [("small", 10, 1.0, 1.0), ("big", 100, 2.0, 2.0),
         ("north", 50, 8.0, 3.0), ("outside", 999, 50.0, 50.0)],
        "name string, population long, lat double, lon double")
    out = {r["tile_id"]: r["name"]
           for r in name_tiles(cities, TILES).collect()}
    assert out == {63240001: "big", 63240002: "north"}


def test_pip_join_multi_polygon(spark):
    tri1 = [(0.0, 0.0), (0.0, 10.0), (10.0, 5.0)]
    tri2 = [(5.0, 0.0), (5.0, 10.0), (15.0, 5.0)]  # overlaps tri1
    pts = spark.createDataFrame(
        [(1, 2.0, 5.0), (2, 7.0, 5.0), (3, 40.0, 40.0)],
        "pid int, lat double, lon double")
    out = sorted((r["pid"], r["poly_id"])
                 for r in pip_join(pts, [(10, tri1), (20, tri2)]).collect())
    # point 1 inside tri1 only; point 2 inside both; point 3 in none
    assert out == [(1, 10), (2, 10), (2, 20)]


def test_template_args(tmp_path):
    from osm2garmin_spark.sources.io import write_template_args
    p = str(tmp_path / "template.args")
    write_template_args(TILES, p)
    content = open(p).read()
    assert "mapname: 63240001" in content
    assert "input-file: 63240002.parquet" in content


def test_load_cities(spark, tmp_path):
    from osm2garmin_spark.sources.io import load_cities
    p = str(tmp_path / "cities.txt")
    with open(p, "w") as f:
        f.write("Praha\tCZ\t50.08\t14.43\t1300000\n")
        f.write("Brno\tCZ\t49.19\t16.61\t380000\n")
    df = load_cities(spark, p)
    rows = {r["name"]: r["population"] for r in df.collect()}
    assert rows == {"Praha": 1300000, "Brno": 380000}


def test_contour_cell_id():
    from osm2garmin_spark.sources.io import contour_cell_id
    assert contour_cell_id(14.43, 50.08) == ((50 + 90) * 360 + (14 + 180)) * 1000
    assert contour_cell_id(-0.5, -0.5) == ((-1 + 90) * 360 + (-1 + 180)) * 1000
