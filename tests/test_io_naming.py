"""areas.list round-trip, KML/GeoJSON export, SRTM cell names, tile naming,
multi-polygon PIP join."""

import json
import os

import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.geo.area import Area
from osm2garmin_spark.sources.io import (
    write_areas_list, read_areas_list, write_tiles_kml, write_tiles_geojson,
    read_tiles_kml, read_poly, poly_envelope, srtm_cell_name,
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


def test_kml_reader_roundtrip(tmp_path):
    """KML source (KmlParser.java contract): our own writer's output reads
    back to the same map-unit tiles (±1 map unit through the 6-decimal
    degree text representation)."""
    k = str(tmp_path / "rt.kml")
    write_tiles_kml(TILES, k)
    back = read_tiles_kml(k)
    assert [t.map_id for t in back] == [t.map_id for t in TILES]
    for got, want in zip(back, TILES):
        for a, b in ((got.min_lat, want.min_lat), (got.min_long, want.min_long),
                     (got.max_lat, want.max_lat), (got.max_long, want.max_long)):
            assert abs(a - b) <= 1


def test_kml_reader_contract_violations(tmp_path):
    p = str(tmp_path / "bad.kml")
    with open(p, "w") as f:
        f.write('<kml><Document><Placemark><name>notanumber</name>'
                '<Polygon><outerBoundaryIs><LinearRing><coordinates>'
                '0,0 1,0 1,1 0,1 0,0</coordinates></LinearRing>'
                '</outerBoundaryIs></Polygon></Placemark></Document></kml>')
    with pytest.raises(ValueError, match="valid number"):
        read_tiles_kml(p)
    with open(p, "w") as f:
        f.write('<kml><Document><Placemark><name>1</name>'
                '<Polygon><outerBoundaryIs><LinearRing><coordinates>'
                '0,0 1,1 0,0</coordinates></LinearRing>'
                '</outerBoundaryIs></Polygon></Placemark></Document></kml>')
    with pytest.raises(ValueError, match="Expected 5|expected 5"):
        read_tiles_kml(p)


_POLY = """australia_v
first_area
     0.1446763E+03    -0.3825659E+02
     0.1446693E+03    -0.3826255E+02
     0.1446627E+03    -0.3825661E+02
     0.1446763E+03    -0.3825659E+02
END
!hole1
     0.1446700E+03    -0.3825800E+02
     0.1446710E+03    -0.3825900E+02
     0.1446705E+03    -0.3825850E+02
END
END
"""


def test_poly_reader_and_envelope(tmp_path):
    p = str(tmp_path / "r.poly")
    with open(p, "w") as f:
        f.write(_POLY)
    r = read_poly(p)
    assert r["name"] == "australia_v"
    assert len(r["rings"]) == 1 and len(r["holes"]) == 1
    assert len(r["rings"][0]) == 4
    assert r["rings"][0][0] == (144.6763, -38.25659)
    # envelope with the reference's exact 3-field line discipline
    lon1, lat1, lon2, lat2 = poly_envelope(p)
    assert lon1 == 144.6627 and lon2 == 144.6763
    assert lat1 == -38.26255 and lat2 == -38.25659


def test_poly_feeds_pip_join(spark, tmp_path):
    """.poly rings are pip_join-ready vertex lists (Region → PIP path)."""
    p = str(tmp_path / "sq.poly")
    with open(p, "w") as f:
        f.write("sq\narea\n  0.0  0.0\n  4.0  0.0\n  4.0  4.0\n  0.0  4.0\nEND\nEND\n")
    r = read_poly(p)
    ring_latlon = [(la, lo) for lo, la in r["rings"][0]]  # .poly is lon lat
    pts = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 5.0, 5.0)], "id long, lon double, lat double")
    got = {row["id"] for row in
           pip_join(pts, [(7, ring_latlon)],
                    lat_col="lat", lon_col="lon").collect()}
    assert got == {1}


def test_regions_txt_source(tmp_path):
    """Osm2garmin.java:219-275: 5-field lines, # comments skipped,
    x-excluded lines skipped but still consuming a family id (5001+),
    sibling <name>.poly overrides the bbox with its envelope."""
    from osm2garmin_spark.sources.io import read_regions_txt
    d = tmp_path
    (d / "regions.txt").write_text(
        "# comment line\n"
        "55.0 -50.0 180.0 10.0 australia_nz\n"
        "x-180.0 41.0 -13.0 85.0 excluded_region\n"
        "-24.0 46.0 9.0 85.0 western_europe\n")
    (d / "western_europe.poly").write_text(
        "western_europe\narea\n  -20.0  47.0\n  5.0  47.0\n  5.0  60.0\nEND\nEND\n")
    regs = read_regions_txt(str(d / "regions.txt"), poly_dir=str(d))
    assert [r["name"] for r in regs] == ["australia_nz", "western_europe"]
    assert regs[0]["family_id"] == 5001
    assert regs[1]["family_id"] == 5003      # x line consumed 5002
    assert regs[0]["poly"] is None
    assert (regs[0]["lon1"], regs[0]["lat1"]) == (55.0, -50.0)
    # poly envelope override
    assert regs[1]["poly"] is not None
    assert (regs[1]["lon1"], regs[1]["lat1"], regs[1]["lon2"], regs[1]["lat2"]) \
        == (-20.0, 47.0, 5.0, 60.0)


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


def _region_points(spark, n=5000):
    from osm2garmin_spark.expressions import derived_lat, derived_lon
    return spark.range(0, n).select(
        F.col("id").alias("pid"),
        derived_lat(F.col("id")).alias("lat"),
        derived_lon(F.col("id")).alias("lon"))


def _region_polys_df(spark):
    from osm2garmin_spark.queries import _REGION_POLYS
    return spark.createDataFrame(
        [(pid, [v[0] for v in pv], [v[1] for v in pv])
         for pid, pv in _REGION_POLYS],
        "poly_id int, vlats array<double>, vlons array<double>")


def test_pip_partitioned_matches_broadcast(spark):
    """Range-partitioned PIP is bit-identical to the broadcast twin on the
    region set (convex hexagons + concave stars + an overlapping pair),
    and independent of the grid cell size."""
    from osm2garmin_spark.operators.pip import pip_join_partitioned
    from osm2garmin_spark.queries import _REGION_POLYS

    pts = _region_points(spark)
    want = sorted((r["pid"], r["poly_id"])
                  for r in pip_join(pts, _REGION_POLYS).collect())
    assert want, "region set must catch some points for the test to bite"
    polys = _region_polys_df(spark)
    for cell_deg in (10.0, 3.0):
        got = sorted(
            (r["pid"], r["poly_id"])
            for r in pip_join_partitioned(pts, polys,
                                          cell_deg=cell_deg).collect())
        assert got == want
    # at least one point sits in two overlapping polygons
    from collections import Counter
    assert Counter(p for p, _ in want).most_common(1)[0][1] >= 2


def test_pip_partitioned_covering_guard(spark):
    """A polygon whose bbox explodes past max_cells_per_poly fails loudly
    instead of quietly fanning out the shuffle."""
    from osm2garmin_spark.operators.pip import pip_join_partitioned

    pts = _region_points(spark, 10)
    polys = _region_polys_df(spark)
    with pytest.raises(Exception, match="covers > 4 cells"):
        pip_join_partitioned(pts, polys, cell_deg=1.0,
                             max_cells_per_poly=4).collect()


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


def test_kml_reader_strictness_advice_r2(tmp_path):
    """ADVICE r2: KmlParser.java contract — lon,lat,alt triples and a
    missing <name> are violations, not tolerated laxness."""
    p = str(tmp_path / "bad2.kml")
    with open(p, "w") as f:
        f.write('<kml><Document><Placemark><name>1</name>'
                '<Polygon><outerBoundaryIs><LinearRing><coordinates>'
                '0,0,99 1,0 1,1 0,1 0,0</coordinates></LinearRing>'
                '</outerBoundaryIs></Polygon></Placemark></Document></kml>')
    with pytest.raises(ValueError, match="coordinate pair"):
        read_tiles_kml(p)
    with open(p, "w") as f:
        f.write('<kml><Document><Placemark>'
                '<Polygon><outerBoundaryIs><LinearRing><coordinates>'
                '0,0 1,0 1,1 0,1 0,0</coordinates></LinearRing>'
                '</outerBoundaryIs></Polygon></Placemark></Document></kml>')
    with pytest.raises(ValueError, match="no\\s*<name>|name"):
        read_tiles_kml(p)


def test_points_in_region_with_holes(spark, tmp_path):
    """.poly holes flow through points_in_region: a point inside the outer
    ring but inside the hole is OUTSIDE the region (osmosis --polygon-file
    semantics), and a second disjoint outer ring still counts."""
    from osm2garmin_spark.operators.pip import points_in_region
    p = str(tmp_path / "donut.poly")
    with open(p, "w") as f:
        f.write("donut\n"
                "outer\n  0.0 0.0\n  10.0 0.0\n  10.0 10.0\n  0.0 10.0\nEND\n"
                "!hole\n  4.0 4.0\n  6.0 4.0\n  6.0 6.0\n  4.0 6.0\nEND\n"
                "island\n  20.0 0.0\n  24.0 0.0\n  24.0 4.0\n  20.0 4.0\nEND\n"
                "END\n")
    r = read_poly(p)
    assert len(r["rings"]) == 2 and len(r["holes"]) == 1
    pts = spark.createDataFrame(
        [(1, 2.0, 2.0),    # in outer, not in hole -> inside
         (2, 5.0, 5.0),    # in the hole -> outside
         (3, 2.0, 22.0),   # in the island ring -> inside
         (4, 15.0, 15.0)], # nowhere
        "id long, lat double, lon double")
    got = {row["id"] for row in
           points_in_region(pts, r).filter(F.col("inside")).collect()}
    assert got == {1, 3}
