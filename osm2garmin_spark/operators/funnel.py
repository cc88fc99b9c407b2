"""Windowed funnel matching: which users completed step A → step B →
step C, each transition within a time bound, using ONLY window
functions over one user-keyed sort — no self-joins, no pair blowup.

The standard product-analytics funnel ("signup, then click within an
hour, then purchase within an hour") is naively an m-way self-join
whose candidate space explodes on active users. The window formulation
is linear: scan each user's events in time order carrying "the latest
timestamp at which stage k was reached":

  stage1_ts = running max of A-event timestamps
  stage2_ts = running max of B-event timestamps where the B event saw a
              stage1_ts within `within_sec` (evaluated left of the
              current row, so ordering is causal: A strictly-or-equal
              before B before C by the window frame)
  stage3 hit = C event with stage2_ts within `within_sec`

Each stage is a pair of running-MAX window columns over the same
(user, ts, seq) sort — an inclusive frame for "stage reached as of this
row" and a current-row-EXCLUSIVE frame for the next stage's
predecessor test (so an event can never satisfy its own predecessor;
with repeated step names, one "a" must not complete a → a) — and
Catalyst plans a single sort + ONE exchange on the user key for the
whole funnel, any depth. Greedy "latest qualifying predecessor" is
complete for existence queries: if any A≤B chain reaches a C within
bounds, the latest-qualifying chain does too (timestamps only move
forward, deadlines only relax).

Scale shape: one hash exchange of the events on user_id + an in-
partition sort (Spark window); per-row state is `steps` longs. Hot
users are window skew, not join skew — millions of rows per user sort
within a partition; beyond that, sessionize first and funnel within
sessions. Determinism: ties in ts break by a caller-named sequence
column so both engines sort identically.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def funnel_stages(events: DataFrame, user_col: str, ts_col: str,
                  seq_col: str, steps: Sequence[str], type_col: str,
                  within_sec: float) -> DataFrame:
    """Adds ``_s{k}_ts`` (k = 1..len(steps)): for every event row, the
    latest timestamp at which the user had completed steps[0..k-1] with
    every consecutive gap <= within_sec, considering only rows up to
    and including the current one. Epoch doubles (micros-exact, the
    same cast chain as the as-of/interval joins)."""
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {len(steps)}")
    order = [F.col(ts_col).asc(), F.col(seq_col).asc()]
    w_incl = (Window.partitionBy(user_col).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # the predecessor frame EXCLUDES the current row: a step event must
    # not satisfy its own predecessor requirement, which matters when
    # step names repeat (a single "a" must not complete a -> a); rows
    # tied on ts but earlier by seq remain eligible
    w_prev = (Window.partitionBy(user_col).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, -1))
    ep = F.col(ts_col).cast("timestamp").cast("double")
    out = events
    prev = None
    for k, step in enumerate(steps, start=1):
        if k == 1:
            reached = F.when(F.col(type_col) == step, ep)
        else:
            reached = F.when(
                (F.col(type_col) == step)
                & F.col(prev).isNotNull()
                & (ep - F.col(prev) <= F.lit(float(within_sec))), ep)
        # reached values are this row's ep when set, i.e. monotone in
        # the window order, so running MAX == last-non-null; MAX is the
        # form every engine's window MAX reproduces bit-for-bit
        out = (out.withColumn(f"_s{k}_ts", F.max(reached).over(w_incl))
               .withColumn(f"_s{k}_prev", F.max(reached).over(w_prev)))
        prev = f"_s{k}_prev"
    return out.drop(*[f"_s{k}_prev" for k in range(1, len(steps) + 1)])


def funnel_user_counts(events: DataFrame, user_col: str, ts_col: str,
                       seq_col: str, steps: Sequence[str], type_col: str,
                       within_sec: float) -> DataFrame:
    """(stage, n_users): how many distinct users reached each funnel
    stage (stage k = completed steps[0..k-1] within bounds). The
    classic funnel report; stage counts are non-increasing."""
    staged = funnel_stages(events, user_col, ts_col, seq_col, steps,
                           type_col, within_sec)
    per_user = staged.groupBy(user_col).agg(*[
        F.max(F.col(f"_s{k}_ts").isNotNull().cast("int")).alias(f"_r{k}")
        for k in range(1, len(steps) + 1)])
    counts = per_user.select([
        F.sum(f"_r{k}").alias(f"_n{k}") for k in range(1, len(steps) + 1)])
    stages = F.array(*[
        F.struct(F.lit(k).alias("stage"),
                 F.col(f"_n{k}").cast("long").alias("n_users"))
        for k in range(1, len(steps) + 1)])
    return (counts.select(F.explode(stages).alias("s"))
            .select("s.stage", "s.n_users"))
