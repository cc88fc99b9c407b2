"""Interval point-in-window join (temporal containment, no equi key).

Joins a table of timestamped POINTS to a table of time INTERVALS on
``start <= t < start + span`` with NO shared key — the "which events
fell inside which incident/maintenance/session window" join. A naive
inequality join is a nested loop (|points| × |intervals| comparisons);
this operator is the 1-D twin of the spatial range join
(operators/range_join.py): block time into fixed buckets, equi-join on
the bucket id, refine with the exact predicate.

Blocking correctness: bucket width = ``max_span_sec`` (the declared
upper bound on interval length, guarded by raise_error just like the
range join's latitude cap). An interval [s, e) with e - s <=
max_span_sec covers at most TWO buckets (floor(s/w) and floor(e/w)),
so the interval side explodes <= 2x and every containing pair meets in
exactly the point's own bucket — once, so no dedup pass is needed
(unlike the spatial ring, where a pair can meet in several cells).

Scale shape: one hash shuffle of each side on the bucket id; candidate
volume = points x (intervals overlapping their bucket), never the full
cross product. Time-skewed data (everything in the latest buckets) is
join-key skew like any other — AQE skew-join splitting handles it, and
the bucket id salts naturally by narrowing max_span_sec. All
expressions JVM-side; timestamps compare via the same micros-exact
ntz->ltz->double cast the as-of join uses, so the SQL twin is an
equality oracle, not an approximation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _epoch(col: Column) -> Column:
    # TIMESTAMP_NTZ has no numeric cast; via-TIMESTAMP is micros/1e6 —
    # the same IEEE double DuckDB's epoch() returns (asof_join.py)
    return col.cast("timestamp").cast("double")


def interval_point_join(points: DataFrame, intervals: DataFrame,
                        point_ts: str, start_ts: str,
                        span_sec: Column, max_span_sec: float) -> DataFrame:
    """Pairs (every column of ``points``, every column of ``intervals``)
    where ``start_ts <= point_ts < start_ts + span_sec``. ``span_sec``
    is a Column (per-interval length in seconds, may be an expression);
    any interval longer than ``max_span_sec`` raises at runtime rather
    than silently dropping pairs. Column names must not collide."""
    if max_span_sec <= 0:
        raise ValueError(f"max_span_sec must be > 0, got {max_span_sec}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    w = float(max_span_sec)

    # project the epoch doubles ONCE PER INPUT ROW, before the join: the
    # containment refine runs per CANDIDATE pair, and the TimestampNTZ →
    # Timestamp → double cast chain is a per-value timezone conversion —
    # recomputing it inside the refine charged two conversions to every
    # candidate (at sf1.0 that is ~220M conversions for ~400k input rows).
    # The join now compares two precomputed doubles per candidate, and
    # both sides carry only (payload key columns + epoch + bucket) through
    # the exchange (guide §2.3: project before the exchange).
    p_ep = _epoch(F.col(point_ts))
    pts = (points.withColumn("_p_ep", p_ep)
           .withColumn("_bkt", F.floor(F.col("_p_ep") / F.lit(w)).cast("long")))

    s_ep = _epoch(F.col(start_ts))
    span = span_sec.cast("double")
    guard = F.when(
        span > F.lit(w),
        F.raise_error(F.concat(
            F.lit(f"interval span exceeds max_span_sec={w}: "),
            span.cast("string")))
    ).otherwise(F.lit(0.0))
    b0 = F.floor((s_ep + guard) / F.lit(w)).cast("long")
    b1 = F.floor((s_ep + span) / F.lit(w)).cast("long")
    # span <= w  =>  b1 - b0 in {0, 1}: explode to at most two buckets
    ivs = (intervals
           .withColumn("_s_ep", s_ep)
           .withColumn("_end_ep", F.col("_s_ep") + span)
           .withColumn("_bkt", F.explode(F.array_distinct(F.array(b0, b1)))))

    cond = ((F.col("_p_ep") >= F.col("_s_ep"))
            & (F.col("_p_ep") < F.col("_end_ep")))
    return (pts.join(ivs, on=["_bkt"], how="inner")
            .filter(cond)
            .drop("_bkt", "_p_ep", "_s_ep", "_end_ep"))


def interval_point_join_sql(points_table: str, intervals_table: str,
                            point_ts: str, start_ts: str,
                            span_sec_sql: str) -> str:
    """DuckDB twin: the plain inequality join (the semantics, without the
    blocking — the oracle checks WHAT, the engine plan is the HOW)."""
    return f"""
SELECT *
FROM {points_table} p JOIN {intervals_table} i
  ON epoch(p.{point_ts}) >= epoch(i.{start_ts})
 AND epoch(p.{point_ts}) < epoch(i.{start_ts}) + ({span_sec_sql})
"""
