"""Fixed-point integer PageRank: the power-iteration graph algorithm
in EXACT integer arithmetic, so every iteration is value-oracle-able.

Floating PageRank cannot pass a cross-engine equality gate (per-node
float sums in engine-dependent order); this variant quantizes rank
mass to int64 at ``SCALE`` and makes every step deterministic:

  R_0(v)    = SCALE
  R_{k+1}(v) = (15 * SCALE) // 100
             + (85 * Σ_{(u,v) ∈ E} (R_k(u) // outdeg(u))) // 100

— the standard damping-0.85 update with floor divisions in place of
float ratios. Floor-div loses ≤ outdeg(u) units of mass per node per
round (bounded, one-sided, identical in every engine); dangling nodes
(outdeg 0) simply emit nothing, the usual simplification. Ranks are
therefore NOT normalized to sum to SCALE·|V| — callers compare ranks,
not probabilities, which is how PageRank is consumed anyway.

Overflow: Σ contributions ≤ Σ R_k ≤ |V| · SCALE · (1 + ε), so with
SCALE = 10^9 the int64 aggregate is safe to |V| ≈ 10^8; past that,
lower SCALE or swap the sum to DECIMAL(38,0) like
functions/checksum.py does (noted, not needed at gate scale).

Shape per iteration: ranks ⋈ outdeg (co-keyed on the node — one
shuffle each, then co-partitioned), explode along edges via an
edge-keyed join, partial-agg sum onto dst, left join back onto the
node set so sinks keep the base rank. K iterations = K chained
(join + agg) stages over lineage — no driver round-trips at all
(unlike kmeans, whose centroids must come to the driver; rank state
stays distributed, which is why this plan survives 10^10 edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000


def pagerank_int(edges: DataFrame, iters: int,
                 src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, rank) after ``iters`` exact integer power iterations over
    the distinct edge set. Nodes = every id appearing as src or dst."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node"))).distinct())
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = (15 * SCALE) // 100
    ranks = nodes.withColumn("rank", F.lit(SCALE).cast("long"))
    for _ in range(iters):
        # `div` is bigint integer division (truncation == floor on the
        # non-negative ranks) — no double round-trip, exact at any
        # magnitude int64 holds
        shares = (ranks.alias("r")
                  .join(outdeg.alias("o"),
                        F.col("r.node") == F.col("o.src"))
                  .select(F.col("o.src").alias("_u"),
                          F.expr("r.rank div o.deg").alias("share")))
        contrib = (shares.alias("sh")
                   .join(e.alias("eg"),
                         F.col("sh._u") == F.col("eg.src"))
                   .groupBy(F.col("eg.dst").alias("_d"))
                   .agg(F.sum("sh.share").alias("insum")))
        ranks = (nodes.alias("n")
                 .join(contrib.alias("c"),
                       F.col("n.node") == F.col("c._d"), "left")
                 .select(F.col("n.node").alias("node"),
                         (F.lit(base).cast("long")
                          + F.expr("(85 * coalesce(c.insum, 0L)) div 100"))
                         .alias("rank")))
    return ranks


def pagerank_sql(iters: int, edges_cte: str) -> str:
    """DuckDB oracle: the same update unrolled ``iters`` times.
    ``edges_cte`` must be a SELECT yielding (src, dst). Integer '//'
    on non-negative values matches the pmod-subtract floor-div."""
    base = (15 * SCALE) // 100
    ctes = [f"e AS (SELECT DISTINCT src, dst FROM ({edges_cte}))",
            "nodes AS (SELECT src AS node FROM e UNION "
            "SELECT dst AS node FROM e)",
            "outdeg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
            f"r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS rank "
            "FROM nodes)"]
    for k in range(iters):
        ctes.append(f"""c{k} AS (
  SELECT e.dst, SUM(r.rank // o.deg) AS insum
  FROM r{k} r JOIN outdeg o ON r.node = o.src JOIN e ON e.src = o.src
  GROUP BY e.dst)""")
        ctes.append(f"""r{k + 1} AS (
  SELECT n.node,
         CAST({base} + (85 * COALESCE(c.insum, 0)) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.dst)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank FROM r{iters}")
