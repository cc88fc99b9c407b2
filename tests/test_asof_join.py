"""As-of join semantics: predecessor-or-equal, tie resolution, tolerance
NULL-out, forward mirror — each pinned against a brute-force pandas
reference; plus the union-merge plan shape (ONE Exchange)."""

import io
import contextlib

import pytest
from pyspark.sql import Row, functions as F

from osm2garmin_spark.operators.asof_join import asof_join


def _mk(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [Row(eid=i, k=k, t=float(t)) for i, (k, t) in enumerate(left_rows)])
    right = spark.createDataFrame(
        [Row(k=k, rt=float(t), rid=rid) for (k, t, rid) in right_rows])
    return (left.withColumn("t", F.col("t").cast("timestamp")),
            right.withColumn("rt", F.col("rt").cast("timestamp")))


def _brute(left_rows, right_rows, direction="backward", tol=None):
    out = {}
    for i, (k, t) in enumerate(left_rows):
        if direction == "backward":
            cand = [(rt, rid) for (rk, rt, rid) in right_rows
                    if rk == k and rt <= t]
            # nearest ts, then MAX rid at equal ts
            best = max(cand, key=lambda c: (c[0], c[1])) if cand else None
        else:
            cand = [(rt, rid) for (rk, rt, rid) in right_rows
                    if rk == k and rt >= t]
            # nearest ts, then MIN rid at equal ts
            best = min(cand, key=lambda c: (c[0], c[1])) if cand else None
        if best is not None and tol is not None and abs(best[0] - t) > tol:
            best = None
        out[i] = best[1] if best else None
    return out


def _run(spark, left_rows, right_rows, **kw):
    left, right = _mk(spark, left_rows, right_rows)
    got = asof_join(left, right, key="k", left_ts="t", right_ts="rt",
                    payload=["rid"], tiebreak_col="rid", **kw).collect()
    return {r.eid: r.rid for r in got}


def test_backward_basic_and_no_match(spark):
    left = [("a", 100), ("a", 5), ("b", 50)]
    right = [("a", 10, 1), ("a", 99, 2), ("a", 101, 3), ("b", 50, 7)]
    got = _run(spark, left, right)
    assert got == _brute(left, right)
    assert got[1] is None          # before first right row
    assert got[2] == 7             # exact-equal match visible


def test_backward_equal_ts_tie_takes_max_rid(spark):
    left = [("a", 10)]
    right = [("a", 10, 3), ("a", 10, 9), ("a", 10, 5)]
    assert _run(spark, left, right) == {0: 9}


def test_forward_equal_ts_tie_takes_min_rid(spark):
    left = [("a", 10), ("a", 11)]
    right = [("a", 11, 8), ("a", 11, 2), ("a", 30, 1)]
    got = _run(spark, left, right, direction="forward")
    assert got == _brute(left, right, direction="forward") == {0: 2, 1: 2}


def test_tolerance_nulls_out_far_matches(spark):
    left = [("a", 100), ("a", 200)]
    right = [("a", 90, 1), ("a", 50, 2)]
    got = _run(spark, left, right, tolerance_sec=20)
    assert got == _brute(left, right, tol=20) == {0: 1, 1: None}


def test_randomized_vs_brute_both_directions(spark):
    import random
    rng = random.Random(42)
    keys = ["a", "b", "c", "d"]
    left = [(rng.choice(keys), rng.randrange(0, 1000)) for _ in range(120)]
    right = [(rng.choice(keys), rng.randrange(0, 1000), rid)
             for rid in range(80)]
    for direction in ("backward", "forward"):
        got = _run(spark, left, right, direction=direction)
        assert got == _brute(left, right, direction=direction), direction
    got = _run(spark, left, right, tolerance_sec=30)
    assert got == _brute(left, right, tol=30)


def test_payload_collision_raises(spark):
    left, right = _mk(spark, [("a", 1)], [("a", 1, 1)])
    with pytest.raises(ValueError, match="collides"):
        asof_join(left.withColumnRenamed("eid", "rid"), right,
                  key="k", left_ts="t", right_ts="rt", payload=["rid"])


def test_asof_plan_single_exchange_no_join(spark):
    """The scale claim: union-merge = ONE hash Exchange on the key, and no
    join operator at all (the naive equi-join + argmax would explode on
    hot keys)."""
    import re
    left, right = _mk(spark, [("a", i) for i in range(50)],
                      [("a", i, i) for i in range(50)])
    df = asof_join(left, right, key="k", left_ts="t", right_ts="rt",
                   payload=["rid"], tiebreak_col="rid")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    exchange_ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(exchange_ids) == 1, plan
