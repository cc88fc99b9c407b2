"""Deterministic sampling for training-data pipelines.

Spark's built-in ``df.sample`` is seeded per-PARTITION: the selected
rows change whenever the input is re-partitioned, re-ordered, or re-read
from a differently-split file layout — unacceptable for a reproducible
training corpus (two runs of the same pipeline must pick the same rows,
and a resumed run must agree with the killed one). These samplers hash
the row's own KEY instead, so membership is a pure function of
(key, seed) with three properties the tests pin:

- **reshard-invariant**: any partitioning/ordering gives the same set;
- **nested**: rate r1 <= r2 implies sample(r1) is a subset of
  sample(r2) (grow a corpus without resampling from scratch);
- **cross-engine exact**: the hash is integer arithmetic chosen so the
  identical expression runs on Spark (JVM codegen) and ANSI SQL
  (DuckDB) with bit-equal results — every intermediate stays under
  2^54, so no overflow on engines that raise instead of wrapping.

Hash: two rounds of split-multiply-accumulate mod the Mersenne prime
M = 2^31 - 1. Round 1 splits the 63-bit key into three 21-bit limbs and
combines them with distinct odd multipliers (+ the seed); round 2
re-splits the 31-bit state and mixes again, making the final value
non-linear in the key (one linear round would map sequential ids onto
a lattice). Knuth's multiplicative scheme (TAOCP vol. 3 §6.4) with the
golden-ratio-derived constant 2654435761 reduced into the <2^31
multiplier budget; not cryptographic, and documented as such.

Scale shape: ``hash_sample``/``stratified_rate_sample`` are pure row
filters — zero shuffle, zero state, prunable scan. ``balanced_sample``
(exactly k per stratum) ranks by hash inside each stratum: ONE shuffle
on the stratum key, and the rank<=k predicate lowers to Spark's
WindowGroupLimit, which keeps a k-row heap map-side instead of sorting
whole strata (plan-pinned in tests/test_plans.py). At a billion rows
per stratum the shuffle moves only the map-side-surviving k rows per
task, not the stratum.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

#: Mersenne prime 2^31-1: mod is cheap, and any value below it times a
#: 21-bit limb stays under 2^52 (exact even in double arithmetic).
M31 = 2147483647
_C1 = 2654435761 % M31          # Knuth multiplicative constant, reduced
_C2 = 1779033703                # fractional-sqrt constants (SHA-2 IVs,
_C3 = 3144134277 % M31          # public), reduced below M31
_C4 = 1013904223                # Numerical Recipes LCG increment
_MASK21 = (1 << 21) - 1


def det_hash(key: Column, seed: int = 0) -> Column:
    """Deterministic [0, M31) hash of a non-negative int64 key column —
    pure JVM arithmetic (shifts, multiplies, pmod), no UDF."""
    k = key.cast("long")
    lo = k.bitwiseAND(F.lit(_MASK21))
    mid = F.shiftright(k, 21).bitwiseAND(F.lit(_MASK21))
    hi = F.shiftright(k, 42)
    # the seed term is a driver-side constant — fold it in Python so the
    # plan carries one long literal (two int32 literals would multiply in
    # 32-bit and overflow under ANSI mode)
    seed_term = ((int(seed) % M31) * _C4) % M31
    h1 = F.pmod(lo * F.lit(_C1) + mid * F.lit(_C2) + hi * F.lit(_C3)
                + F.lit(seed_term).cast("long"), F.lit(M31))
    # round 2: re-split the 31-bit state so the result is non-linear in k
    h_lo = h1.bitwiseAND(F.lit(_MASK21))
    h_hi = F.shiftright(h1, 21)
    return F.pmod(h_lo * F.lit(_C3) + h_hi * F.lit(_C1) + F.lit(_C4),
                  F.lit(M31))


def det_hash_sql(key: str, seed: int = 0) -> str:
    """ANSI-SQL twin of :func:`det_hash` (DuckDB-safe BIGINT casts)."""
    s = (int(seed) % M31) * _C4
    h1 = (f"(((CAST({key} AS BIGINT) & {_MASK21}) * {_C1} "
          f"+ ((CAST({key} AS BIGINT) >> 21) & {_MASK21}) * {_C2} "
          f"+ (CAST({key} AS BIGINT) >> 42) * {_C3} "
          f"+ CAST({s} AS BIGINT)) % {M31})")
    return (f"((({h1} & {_MASK21}) * {_C3} + ({h1} >> 21) * {_C1} "
            f"+ {_C4}) % {M31})")


def _threshold(rate: float) -> int:
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * M31)


def hash_sample(df: DataFrame, key_col: str, rate: float,
                seed: int = 0) -> DataFrame:
    """Keep rows with det_hash(key) < rate * M31 — reshard-invariant,
    nested across rates (module docstring). Zero shuffle."""
    return df.filter(det_hash(F.col(key_col), seed) < F.lit(_threshold(rate)))


def hash_sample_sql(table: str, key_col: str, rate: float,
                    seed: int = 0) -> str:
    return (f"SELECT * FROM {table} "
            f"WHERE {det_hash_sql(key_col, seed)} < {_threshold(rate)}")


def stratified_rate_sample(df: DataFrame, stratum_col: str, key_col: str,
                           rates: Dict[str, float],
                           default_rate: float = 0.0,
                           seed: int = 0) -> DataFrame:
    """Per-stratum keep rates (the rebalancing pass of a training mix:
    downsample the over-represented class, keep all of the rare one).
    Still a pure row filter — zero shuffle; still nested per stratum."""
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value,
                     F.lit(_threshold(rate))).otherwise(thr)
    return df.filter(det_hash(F.col(key_col), seed) < thr)


def stratified_rate_sample_sql(table: str, stratum_col: str, key_col: str,
                               rates: Dict[str, float],
                               default_rate: float = 0.0,
                               seed: int = 0) -> str:
    branches = " ".join(
        f"WHEN '{v}' THEN {_threshold(r)}" for v, r in sorted(rates.items()))
    case = (f"CASE {stratum_col} {branches} "
            f"ELSE {_threshold(default_rate)} END")
    return (f"SELECT * FROM {table} "
            f"WHERE {det_hash_sql(key_col, seed)} < {case}")


def balanced_sample(df: DataFrame, stratum_col: str, key_col: str, k: int,
                    seed: int = 0, rank_col: Optional[str] = None) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — the k smallest hash
    values, id tie-broken, so the pick is deterministic AND uniform
    within the stratum. One shuffle; rank<=k lowers to WindowGroupLimit
    (map-side top-k heap)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = det_hash(F.col(key_col), seed)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    out = df.withColumn("_rnk", F.row_number().over(w)).filter(
        F.col("_rnk") <= k)
    if rank_col is None:
        return out.drop("_rnk")
    return out.withColumnRenamed("_rnk", rank_col)


def balanced_sample_sql(table: str, stratum_col: str, key_col: str, k: int,
                        seed: int = 0) -> str:
    h = det_hash_sql(key_col, seed)
    return f"""
SELECT * EXCLUDE (_rnk) FROM (
  SELECT *, row_number() OVER (PARTITION BY {stratum_col}
            ORDER BY {h} ASC, {key_col} ASC) AS _rnk
  FROM {table}
) WHERE _rnk <= {int(k)}
"""
