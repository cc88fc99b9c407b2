"""Trajectory analytics: per-key geodesic track statistics.

Orders each key's points in time, measures every consecutive leg with
the exact haversine twins from operators/range_join.py, and aggregates
— the GPS-track / movement-log summary (total distance travelled,
longest hop, leg count) that complements the engine's spatial joins
with a TEMPORAL-spatial operator. The reference's nearest analogue is
contour line stitching (consecutive-point geometry); tracks apply the
same lag-window shape to moving entities.

Determinism across engines: each leg is rounded to integer METERS
before aggregation — the leg expression tree is bit-identical in Spark
and the SQL twin (same IEEE op order, see range_join.haversine_km), so
the rounded legs are equal integers and the sums are EXACT regardless
of aggregation order. Emitting a float sum instead would depend on
reduction order and could never hash-match.

Scale shape: ONE hash Exchange on the key for the lag window, then the
groupBy reuses that partitioning (no second shuffle — Spark sees the
child output partitioning satisfies the aggregation distribution).
State per task is one previous row per key. No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .range_join import haversine_km, haversine_km_sql


def track_stats(df: DataFrame, key_col: str, ts_col: str, lat_col: str,
                lon_col: str, seq_col: str) -> DataFrame:
    """Per-key track summary: (key, n_points, n_legs, total_m,
    max_leg_m). ``seq_col`` breaks timestamp ties so the leg sequence is
    total-ordered (a duplicate (key, ts) without it would make the path
    — and its length — nondeterministic)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(seq_col).asc())
    plat, plon = F.lag(lat_col).over(w), F.lag(lon_col).over(w)
    leg_km = haversine_km(plat, plon, F.col(lat_col), F.col(lon_col))
    # explicit NULL guard: LEAST() inside hav_to_km SKIPS nulls (in both
    # engines), so a missing predecessor would otherwise become asin(1)
    # — a phantom 20,015 km first leg on every key
    leg_m = F.when(plat.isNotNull(),
                   F.round(leg_km * F.lit(1000.0)).cast("long"))
    legs = df.withColumn("_leg_m", leg_m)
    return (legs.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.count("_leg_m").alias("n_legs"),
                 F.coalesce(F.sum("_leg_m"), F.lit(0)).alias("total_m"),
                 F.max("_leg_m").alias("max_leg_m")))


def track_stats_sql(points_cte: str, key_col: str, ts_col: str,
                    lat_col: str, lon_col: str, seq_col: str) -> str:
    """DuckDB twin over a CTE named ``points`` with the same columns —
    identical leg expression tree, identical integer-meter rounding."""
    leg = haversine_km_sql(f"lag({lat_col}) OVER w", f"lag({lon_col}) OVER w",
                           lat_col, lon_col)
    return f"""
WITH {points_cte},
legs AS (
  SELECT {key_col},
         CASE WHEN lag({lat_col}) OVER w IS NOT NULL
              THEN CAST(ROUND({leg} * 1000.0) AS BIGINT) END AS leg_m
  FROM points
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col} ASC, {seq_col} ASC)
)
SELECT {key_col}, COUNT(*) AS n_points, COUNT(leg_m) AS n_legs,
       COALESCE(SUM(leg_m), 0) AS total_m, MAX(leg_m) AS max_leg_m
FROM legs GROUP BY {key_col}
"""
