"""Bloom-pruned semi join: zero false negatives, fpp sanity, exact
equality with the plain semi join, parameter validation, and the plan
guard that the probe filter sits below the join."""

import pytest
from pyspark.sql import Row, functions as F

from osm2garmin_spark.operators.bloom_join import (
    MAX_BLOOM_WORDS, bloom_bits, bloom_params, bloom_semi_join, in_bloom)


def _keys(spark, vals, name="k"):
    return spark.createDataFrame([Row(**{name: int(v)}) for v in vals])


def test_params_standard_formula():
    m, k = bloom_params(1000, 0.01)
    # optimum: ~9.59 bits/key, k ~ 7
    assert 9 * 1000 <= m <= 11 * 1000 and m % 64 == 0
    assert k == 7
    with pytest.raises(ValueError, match="fpp"):
        bloom_params(10, 1.5)
    with pytest.raises(ValueError, match="n_keys"):
        bloom_params(0, 0.01)


def test_no_false_negatives(spark):
    keys = list(range(0, 5000, 3))
    m, k = bloom_params(len(keys), 0.01)
    words = bloom_bits(_keys(spark, keys), "k", m, k)
    df = _keys(spark, keys)
    assert df.filter(in_bloom(F.col("k"), words, k)).count() == len(keys)


def test_fpp_in_expected_band(spark):
    keys = list(range(2000))
    m, k = bloom_params(len(keys), 0.01)
    words = bloom_bits(_keys(spark, keys), "k", m, k)
    absent = _keys(spark, range(1_000_000, 1_020_000))
    fp = absent.filter(in_bloom(F.col("k"), words, k)).count()
    assert fp / 20000 < 0.05  # target 0.01, generous margin


def test_semi_join_exact(spark):
    import random
    rng = random.Random(5)
    fact = _keys(spark, [rng.randrange(500) for _ in range(3000)], "fk")
    dim = _keys(spark, rng.sample(range(500), 60), "dk")
    got = bloom_semi_join(fact, dim, "fk", "dk", n_keys=100, fpp=0.01)
    want = fact.join(dim.select(F.col("dk").alias("fk")).distinct(),
                     "fk", "left_semi")
    assert sorted(r.fk for r in got.collect()) == \
        sorted(r.fk for r in want.collect())


def test_overestimated_n_keys_still_exact(spark):
    fact = _keys(spark, range(100), "fk")
    dim = _keys(spark, range(0, 100, 7), "dk")
    got = bloom_semi_join(fact, dim, "fk", "dk", n_keys=50_000, fpp=0.01)
    assert sorted(r.fk for r in got.collect()) == list(range(0, 100, 7))


def test_bloom_bits_validation(spark):
    df = _keys(spark, [1])
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bits(df, "k", 100, 3)
    with pytest.raises(ValueError, match="MAX_BLOOM_WORDS"):
        bloom_bits(df, "k", (MAX_BLOOM_WORDS + 1) * 64, 3)


def test_plan_probe_filter_below_join(spark):
    """The bloom probe must run in a Filter on the fact SCAN side,
    before any join/exchange — pruning after the shuffle would defeat
    the semi-join reduction."""
    fact = _keys(spark, range(1000), "fk")
    dim = _keys(spark, range(0, 1000, 11), "dk")
    out = bloom_semi_join(fact, dim, "fk", "dk", n_keys=200, fpp=0.01)
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_at = min(plan.find("BroadcastHashJoin") % 10**9,
                  plan.find("SortMergeJoin") % 10**9,
                  plan.find("ShuffledHashJoin") % 10**9)
    probe_at = plan.find("shiftleft")
    assert 0 <= probe_at and join_at < 10**9
    assert probe_at > join_at  # textual plan: children print BELOW parents
