"""Polyline vertex decimation (map generalization before rendering).

The reference pipeline hands its ways to mkgmap, which generalizes
geometry per zoom (douglas-peucker filters in the style output); the
engine's equivalent is an effective-area decimation over polyline
tables — Visvalingam-Whyatt's area criterion applied in deterministic
batched passes:

- pass: every INTERIOR vertex whose doubled triangle area
  ``|x1(y2-y3) + x2(y3-y1) + x3(y1-y2)|`` against its current neighbors
  is below ``eps2`` drops; endpoints always survive. All drops in a
  pass are simultaneous (classic VW re-evaluates after every single
  removal — a sequential dependency that cannot scale; the batched
  variant is the standard distributed adaptation, converges to a
  VW-like result in a few passes, and is exactly reproducible).
- ``passes`` fixed rounds; a vertex surviving pass k is re-judged in
  pass k+1 against its NEW neighbors.

Coordinates are integer map units, so the area arithmetic is EXACT
int64 (|x| <= 2^23, |y| <= 2^22: each product <= 2^46, the 3-term sum
< 2^48 — no rounding anywhere, which is what makes the SQL oracle an
equality check, not an approximation).

Scale shape: one hash shuffle on the way id for the first window; every
later pass reuses that partitioning and ordering (filter preserves
both), so K passes cost ONE Exchange total (pinned in
tests/test_plans.py). State per task is bounded by the longest way in
its partition, never by the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def decimate_pass(df: DataFrame, eps2: int, id_col: str = "way_id",
                  seq_col: str = "seq", x_col: str = "lon_mu",
                  y_col: str = "lat_mu") -> DataFrame:
    """One batched effective-area pass (see module docstring).
    ``seq_col`` must be unique within each way — duplicate seq values
    make the window order (and thus neighbor pairing) nondeterministic.
    """
    w = Window.partitionBy(id_col).orderBy(seq_col)
    px, py = F.lag(x_col).over(w), F.lag(y_col).over(w)
    nx, ny = F.lead(x_col).over(w), F.lead(y_col).over(w)
    x, y = F.col(x_col), F.col(y_col)
    area2 = F.abs(px * (y - ny) + x * (ny - py) + nx * (py - y))
    keep = px.isNull() | nx.isNull() | (area2 >= F.lit(int(eps2)))
    return df.withColumn("_keep", keep).filter("_keep").drop("_keep")


def simplify_polylines(df: DataFrame, eps2: int, passes: int = 3,
                       id_col: str = "way_id", seq_col: str = "seq",
                       x_col: str = "lon_mu", y_col: str = "lat_mu") -> DataFrame:
    """``passes`` decimation rounds; returns the surviving vertex rows
    (a subsequence of the input — seq values are preserved, not
    renumbered, so the output joins back to the source table)."""
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    out = df
    for _ in range(passes):
        out = decimate_pass(out, eps2, id_col, seq_col, x_col, y_col)
    return out


def decimate_pass_sql_cte(src: str, out: str, eps2: int,
                          id_col: str = "way_id", seq_col: str = "seq",
                          x_col: str = "lon_mu", y_col: str = "lat_mu") -> str:
    """The identical pass as an ANSI-SQL CTE (oracle twin; exact integer
    arithmetic, so equality is bit-for-bit)."""
    return f"""{out} AS (
  SELECT {id_col}, {seq_col}, {x_col}, {y_col} FROM (
    SELECT {id_col}, {seq_col}, {x_col}, {y_col},
           LAG({x_col})  OVER w AS px, LAG({y_col})  OVER w AS py,
           LEAD({x_col}) OVER w AS nx, LEAD({y_col}) OVER w AS ny
    FROM {src}
    WINDOW w AS (PARTITION BY {id_col} ORDER BY {seq_col})
  )
  WHERE px IS NULL OR nx IS NULL
     OR ABS(px * ({y_col} - ny) + {x_col} * (ny - py)
            + nx * (py - {y_col})) >= {int(eps2)}
)"""
