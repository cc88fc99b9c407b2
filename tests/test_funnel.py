"""Windowed funnel: brute-force chain-search parity, causality edges,
repeated-step support, stage monotonicity, one-exchange plan shape."""

import itertools

import pytest
from pyspark.sql import Row, functions as F

from osm2garmin_spark.operators.funnel import (funnel_stages,
                                               funnel_user_counts)


def _ev(spark, rows):
    """rows: (user, t_seconds, type)"""
    df = spark.createDataFrame(
        [Row(user_id=u, event_id=i, ts=float(t), event_type=ty)
         for i, (u, t, ty) in enumerate(rows)])
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _brute_reached(events_by_user, steps, within):
    """Exhaustive chain search: user reaches stage k iff SOME
    subsequence e1<=...<=ek (by (ts, seq)) matches steps[0..k-1] with
    every consecutive gap <= within."""
    out = {}
    for u, evs in events_by_user.items():
        evs = sorted(evs)  # (ts, seq, type)
        best = 0
        for k in range(1, len(steps) + 1):
            for sub in itertools.combinations(range(len(evs)), k):
                if all(evs[sub[j]][2] == steps[j] for j in range(k)) and \
                   all(evs[sub[j + 1]][0] - evs[sub[j]][0] <= within
                       for j in range(k - 1)):
                    best = max(best, k)
                    break
        out[u] = best
    return out


def _counts(spark, rows, steps, within):
    out = funnel_user_counts(_ev(spark, rows), "user_id", "ts",
                             "event_id", steps, "event_type", within)
    return {r.stage: r.n_users for r in out.collect()}


def test_matches_brute_force_randomized(spark):
    import random
    rng = random.Random(17)
    types = ["a", "b", "c", "x"]
    rows = [(u, rng.randrange(0, 100), rng.choice(types))
            for u in range(12) for _ in range(8)]
    by_user = {}
    for i, (u, t, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t, i, ty))
    for within in (5, 20, 60):
        got = _counts(spark, rows, ["a", "b", "c"], within)
        want_best = _brute_reached(by_user, ["a", "b", "c"], within)
        want = {k: sum(1 for b in want_best.values() if b >= k)
                for k in (1, 2, 3)}
        assert got == want, f"within={within}"


def test_order_is_causal(spark):
    # b before a: stage 2 never fires even though both types exist
    assert _counts(spark, [(1, 10, "b"), (1, 20, "a")],
                   ["a", "b"], 100) == {1: 1, 2: 0}
    # a then b inside the bound
    assert _counts(spark, [(1, 10, "a"), (1, 20, "b")],
                   ["a", "b"], 100) == {1: 1, 2: 1}
    # a then b OUTSIDE the bound
    assert _counts(spark, [(1, 10, "a"), (1, 200, "b")],
                   ["a", "b"], 100) == {1: 1, 2: 0}


def test_boundary_gap_inclusive(spark):
    assert _counts(spark, [(1, 0, "a"), (1, 100, "b")],
                   ["a", "b"], 100) == {1: 1, 2: 1}


def test_same_timestamp_seq_breaks_tie(spark):
    # a and b at the identical timestamp: event_id order decides
    assert _counts(spark, [(1, 10, "a"), (1, 10, "b")],
                   ["a", "b"], 100) == {1: 1, 2: 1}


def test_greedy_latest_predecessor_is_complete(spark):
    # a@0, b@90 qualifies (gap 90); a@80 refreshes stage 1; c needs a b
    # within 50: b@130 qualifies via a@80; the 50-bound c@170 must match
    rows = [(1, 0, "a"), (1, 90, "b"), (1, 80, "a"), (1, 130, "b"),
            (1, 170, "c")]
    assert _counts(spark, rows, ["a", "b", "c"], 100)[3] == 1


def test_repeated_step_names(spark):
    # pattern a -> a needs TWO a events (the exclusive predecessor
    # frame stops an event satisfying its own predecessor)
    assert _counts(spark, [(1, 10, "a")], ["a", "a"], 100) == {1: 1, 2: 0}
    assert _counts(spark, [(1, 10, "a"), (1, 50, "a")],
                   ["a", "a"], 100) == {1: 1, 2: 1}
    # tied timestamps: the earlier-seq twin still counts as predecessor
    assert _counts(spark, [(1, 10, "a"), (1, 10, "a")],
                   ["a", "a"], 100) == {1: 1, 2: 1}


def test_validation(spark):
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel_user_counts(_ev(spark, [(1, 0, "a")]), "user_id", "ts",
                           "event_id", ["a"], "event_type", 10)


def test_plan_single_user_exchange(spark):
    rows = [(u, t, ty) for u in range(4)
            for t, ty in [(0, "a"), (5, "b"), (9, "c")]]
    staged = funnel_stages(_ev(spark, rows), "user_id", "ts", "event_id",
                           ["a", "b", "c"], "event_type", 10)
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # the whole funnel is join-free