"""Distributed as-of join (temporal nearest-predecessor join).

For every left row, attach the most recent right row with the same key
whose timestamp is <= (``"backward"``, default) or >= (``"forward"``)
the left timestamp — the point-in-time lookup every training-data and
feature-store pipeline needs (label a sample with the latest upstream
state known at sample time) and the temporal twin of the engine's
spatial kNN (k=1 in time instead of space). The reference pipeline has
no temporal operator at all — its nearest analogue is the freshness
gating of `PlanetUpdater.java` (min-age diff selection), which
`streaming/incremental.py` already covers; this operator generalizes
"latest state at time t" to arbitrary key/timestamp pairs.

Algorithm — union-merge, NOT a join. The naive formulation (equi-join
on key + inequality + argmax) explodes to |left_per_key| ×
|right_per_key| intermediate pairs before the argmax prunes them; at a
hot key with 10^5 rows per side that is 10^10 pairs. Instead:

- tag both inputs with a side marker and union them into one table with
  a shared (key, ts) layout, right-side payload columns NULL on left
  rows;
- one window per key ordered by (ts, side, right-tiebreak):
  ``last(payload, ignorenulls=True)`` over rows unbounded-preceding
  carries each right row's payload forward to every later left row —
  the running "latest known state";
- keep the left rows; optionally filter by ``tolerance``.

Cost: ONE hash Exchange on the key (the union of two scans shuffles
once) + a per-key sort, zero intermediate blowup — the running state
per task is one payload row per key. This is the standard distributed
merge_asof shape (two-sides-union + ordered window), fully JVM-side:
no Python UDF anywhere, and the window's frame is running-unbounded so
Spark uses the streaming UnboundedPreceding frame evaluator (O(1) per
row), not a re-scan.

Determinism: within one key, ties are resolved by a total order —
right rows at the SAME timestamp as a left row are visible to it
(predecessor-or-equal semantics, matching pandas ``merge_asof``
``allow_exact_matches=True``), and among right rows sharing a
timestamp the one greatest under ``tiebreak_col`` wins (it sorts last,
so ``last()`` carries it). Both facts are pinned by the SQL oracle and
pytest.

``direction="forward"`` is the mirror: earliest right row with
ts >= left ts, resolved by reversing the timestamp order (ties among
right rows then resolve to the SMALLEST tiebreak, keeping "first in
the reversed order" = "nearest then lowest id" — also pinned).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              payload: Sequence[str],
              direction: str = "backward",
              tiebreak_col: Optional[str] = None,
              tolerance_sec: Optional[float] = None,
              matched_ts_col: str = "matched_ts") -> DataFrame:
    """As-of join ``left`` to ``right`` on ``key`` (see module docstring).

    Returns every left row (all its columns) plus ``payload`` columns
    from the matched right row (NULL when no right row qualifies) and
    ``matched_ts_col`` = the matched right timestamp. ``payload`` names
    must not collide with left column names. ``tiebreak_col`` (a right
    column, may be in ``payload``) makes same-timestamp right rows
    deterministic; required when right (key, ts) pairs can repeat.
    ``tolerance_sec`` drops matches farther than this many seconds from
    the left timestamp (match columns become NULL, left row stays).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = list(payload)
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload collides with left columns: {sorted(overlap)}")
    if tiebreak_col is None:
        tiebreak_col = right_ts  # degenerate but total when (key, ts) unique

    l_tag = (left
             .withColumn("_k", F.col(key))
             .withColumn("_t", F.col(left_ts))
             .withColumn("_side", F.lit(1))
             .withColumn("_tb", F.lit(None).cast("long"))
             .withColumn(matched_ts_col,
                         F.lit(None).cast(right.schema[right_ts].dataType)))
    for p in payload:
        l_tag = l_tag.withColumn(p, F.lit(None).cast(right.schema[p].dataType))
    if key not in right.columns:
        raise ValueError(f"key {key!r} must exist in both inputs "
                         f"(rename the right side first)")
    r_tag = (right
             .withColumn("_k", F.col(key))
             .withColumn("_t", F.col(right_ts))
             .withColumn("_side", F.lit(0))
             .withColumn("_tb", F.col(tiebreak_col).cast("long"))
             .withColumn(matched_ts_col, F.col(right_ts)))
    keep = ["_k", "_t", "_side", "_tb", matched_ts_col] + payload
    l_cols = [c for c in left.columns]
    merged = (l_tag.select(*keep, *l_cols)
              .unionByName(
                  r_tag.select(*keep,
                               *[F.lit(None).cast(l_tag.schema[c].dataType)
                                 .alias(c) for c in l_cols])))

    if direction == "backward":
        # right rows at a left row's exact ts sort BEFORE it (side 0 < 1)
        # → visible; larger tiebreak sorts later → last() carries it.
        order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc()]
    else:
        # reversed time: the nearest future right row is the latest seen;
        # among equal-ts right rows the SMALLEST tiebreak sorts last.
        order = [F.col("_t").desc(), F.col("_side").asc(), F.col("_tb").desc()]
    w = (Window.partitionBy("_k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = [F.last(matched_ts_col, ignorenulls=True).over(w)
               .alias("_m_ts")]
    carried += [F.last(p, ignorenulls=True).over(w).alias(f"_m_{p}")
                for p in payload]
    out = (merged.select("*", *carried)
           .filter(F.col("_side") == 1))

    within: Column = F.lit(True)
    if tolerance_sec is not None:
        # cast via TIMESTAMP: TIMESTAMP_NTZ has no direct numeric cast, and
        # ntz->ltz->double is micros/1e6 — the same IEEE value DuckDB's
        # epoch() produces, so the oracle's boundary cases agree exactly
        gap = F.abs(F.col("_t").cast("timestamp").cast("double")
                    - F.col("_m_ts").cast("timestamp").cast("double"))
        within = gap <= F.lit(float(tolerance_sec))
    sel = [F.col(c) for c in l_cols]
    sel.append(F.when(within, F.col("_m_ts")).alias(matched_ts_col))
    sel += [F.when(within, F.col(f"_m_{p}")).alias(p) for p in payload]
    return out.select(*sel)


def asof_join_sql(left_table: str, right_table: str, key_left: str,
                  key_right: str, left_ts: str, right_ts: str,
                  payload: Sequence[str], left_cols: Sequence[str],
                  direction: str = "backward",
                  tiebreak_col: Optional[str] = None,
                  tolerance_sec: Optional[float] = None,
                  matched_ts_col: str = "matched_ts") -> str:
    """ANSI-SQL twin of :func:`asof_join` (same union-merge plan, so the
    oracle checks the SEMANTICS — predecessor-or-equal, tie resolution,
    tolerance NULL-out — not just row counts). DuckDB-compatible:
    BIGINT tiebreak casts, IGNORE NULLS window frames."""
    if tiebreak_col is None:
        tiebreak_col = right_ts
    payload = list(payload)
    left_cols = list(left_cols)
    if direction == "backward":
        order = "_t ASC, _side ASC, _tb ASC"
    elif direction == "forward":
        order = "_t DESC, _side ASC, _tb DESC"
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols_l = ",\n         ".join(left_cols)
    lcols_r = ",\n         ".join(f"NULL AS {c}" for c in left_cols)
    srcs_r = ",\n         ".join(
        [f"{right_ts} AS _m_src_ts"] + [f"{p} AS _m_src_{p}" for p in payload])
    srcs_l = ",\n         ".join(
        ["NULL AS _m_src_ts"] + [f"NULL AS _m_src_{p}" for p in payload])
    if tolerance_sec is None:
        cond = "TRUE"
    else:
        cond = (f"abs(epoch(_t) - epoch(_m_ts)) <= {float(tolerance_sec)!r}")
    outs = ", ".join(
        left_cols
        + [f"CASE WHEN {cond} THEN _m_ts END AS {matched_ts_col}"]
        + [f"CASE WHEN {cond} THEN _m_{p} END AS {p}" for p in payload])
    return f"""
WITH merged AS (
  SELECT {key_right} AS _k, {right_ts} AS _t, 0 AS _side,
         CAST({tiebreak_col} AS BIGINT) AS _tb,
         {srcs_r},
         {lcols_r}
  FROM {right_table}
  UNION ALL
  SELECT {key_left} AS _k, {left_ts} AS _t, 1 AS _side,
         NULL AS _tb,
         {srcs_l},
         {lcols_l}
  FROM {left_table}
), carried AS (
  SELECT *,
         last_value(_m_src_ts IGNORE NULLS) OVER w AS _m_ts,
         {",".join(f"last_value(_m_src_{p} IGNORE NULLS) OVER w AS _m_{p}"
                   for p in payload)}
  FROM merged
  WINDOW w AS (PARTITION BY _k ORDER BY {order} ROWS UNBOUNDED PRECEDING)
)
SELECT {outs}
FROM carried WHERE _side = 1
"""
