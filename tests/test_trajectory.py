"""Track stats: leg math vs a numpy haversine reference, tie ordering,
singleton keys, and the one-Exchange plan claim."""

import io
import contextlib
import math
import re

from pyspark.sql import Row, functions as F

from osm2garmin_spark.operators.trajectory import track_stats

R_EARTH = 6371.0088


def _hav_km(a, b):
    la1, lo1 = map(math.radians, a)
    la2, lo2 = map(math.radians, b)
    h = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
    return 2 * R_EARTH * math.asin(math.sqrt(h))


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=float(t), eid=i, lat=la, lon=lo)
         for i, (k, t, la, lo) in enumerate(rows)]).withColumn(
        "ts", F.col("ts").cast("timestamp"))


def test_track_stats_matches_reference(spark):
    rows = [("a", 1, 0.0, 0.0), ("a", 2, 0.0, 1.0), ("a", 3, 1.0, 1.0),
            ("b", 1, 50.0, 10.0), ("b", 2, 50.0, 10.0)]
    got = {r.k: r for r in track_stats(
        _df(spark, rows), "k", "ts", "lat", "lon", "eid").collect()}
    legs_a = [_hav_km((0, 0), (0, 1)), _hav_km((0, 1), (1, 1))]
    want_a = sum(round(l * 1000) for l in legs_a)
    assert got["a"].n_points == 3 and got["a"].n_legs == 2
    assert got["a"].total_m == want_a
    assert got["a"].max_leg_m == max(round(l * 1000) for l in legs_a)
    assert got["b"].total_m == 0 and got["b"].n_legs == 1


def test_track_stats_ts_tie_broken_by_seq(spark):
    """Two points at one timestamp: the seq column decides the path."""
    rows = [("a", 1, 0.0, 0.0), ("a", 2, 0.0, 2.0), ("a", 2, 0.0, 1.0)]
    got = track_stats(_df(spark, rows), "k", "ts", "lat", "lon",
                      "eid").collect()[0]
    # path is eid order at ts=2: (0,0) -> (0,2) -> (0,1)
    want = round(_hav_km((0, 0), (0, 2)) * 1000) + round(
        _hav_km((0, 2), (0, 1)) * 1000)
    assert got.total_m == want


def test_track_stats_singleton_key(spark):
    got = track_stats(_df(spark, [("z", 1, 10.0, 20.0)]),
                      "k", "ts", "lat", "lon", "eid").collect()[0]
    assert (got.n_points, got.n_legs, got.total_m, got.max_leg_m) == (1, 0, 0, None)


def test_track_stats_single_exchange(spark):
    """The groupBy must reuse the window's hash partitioning: ONE
    Exchange in the whole plan."""
    df = _df(spark, [("a", i, float(i % 5), float(i % 7)) for i in range(40)])
    out = track_stats(df, "k", "ts", "lat", "lon", "eid")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    exchange_ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(exchange_ids) == 1, plan
