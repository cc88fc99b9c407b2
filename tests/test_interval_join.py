"""Interval point-in-window join: brute-force parity, bucket-boundary
edges, span guard, collision validation, plan shape (equi-join on the
bucket, no NLJ/cartesian)."""

import io
import contextlib

import pytest
from pyspark.sql import Row, functions as F

from osm2garmin_spark.operators.interval_join import interval_point_join


def _pts(spark, ts_list):
    df = spark.createDataFrame([Row(pid=i, pt=float(t))
                                for i, t in enumerate(ts_list)])
    return df.withColumn("pt", F.col("pt").cast("timestamp"))


def _ivs(spark, rows):
    df = spark.createDataFrame([Row(iid=i, s=float(s), span=float(sp))
                                for i, (s, sp) in enumerate(rows)])
    return df.withColumn("s", F.col("s").cast("timestamp"))


def _run(spark, pts, ivs, w):
    out = interval_point_join(_pts(spark, pts), _ivs(spark, ivs),
                              point_ts="pt", start_ts="s",
                              span_sec=F.col("span"), max_span_sec=w)
    return {(r.pid, r.iid) for r in out.collect()}


def _brute(pts, ivs):
    return {(i, j) for i, t in enumerate(pts)
            for j, (s, sp) in enumerate(ivs) if s <= t < s + sp}


def test_matches_brute_force_randomized(spark):
    import random
    rng = random.Random(9)
    pts = [rng.uniform(0, 5000) for _ in range(200)]
    ivs = [(rng.uniform(0, 5000), rng.uniform(1, 600)) for _ in range(60)]
    assert _run(spark, pts, ivs, 600) == _brute(pts, ivs)


def test_bucket_boundary_edges(spark):
    # interval straddling a bucket boundary; points at start (inclusive)
    # and end (exclusive) exactly
    w = 100.0
    ivs = [(95.0, 50.0)]                      # covers buckets 0 and 1
    pts = [95.0, 144.999, 145.0, 94.999, 100.0]
    got = _run(spark, pts, ivs, w)
    assert got == {(0, 0), (1, 0), (4, 0)}    # start in, end out, t=100 in


def test_no_duplicate_pairs_on_straddle(spark):
    # a pair meeting in a straddling interval must appear exactly once
    out = interval_point_join(_pts(spark, [150.0]),
                              _ivs(spark, [(95.0, 100.0)]),
                              point_ts="pt", start_ts="s",
                              span_sec=F.col("span"), max_span_sec=100.0)
    assert out.count() == 1


def test_span_guard_raises(spark):
    with pytest.raises(Exception, match="exceeds max_span_sec"):
        _run(spark, [10.0], [(0.0, 500.0)], 100)


def test_column_collision_raises(spark):
    a = _pts(spark, [1.0])
    with pytest.raises(ValueError, match="collision"):
        interval_point_join(a, a, point_ts="pt", start_ts="pt",
                            span_sec=F.lit(1.0), max_span_sec=1.0)


def test_plan_is_bucket_equi_join(spark):
    pts = _pts(spark, [float(i) for i in range(50)])
    ivs = _ivs(spark, [(float(i * 7), 60.0) for i in range(10)])
    out = interval_point_join(pts, ivs, point_ts="pt", start_ts="s",
                              span_sec=F.col("span"), max_span_sec=60.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan      # a real equi-join on the bucket key
