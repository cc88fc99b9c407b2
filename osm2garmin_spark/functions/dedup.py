"""Deduplication operators for a large-scale training-data pipeline.

- ``exact_dedup``        hash/groupBy keep-first (one shuffle on the key)
- ``ngram_jaccard_pairs``  exact n-gram Jaccard via shingle-explode
                           candidate join (shared-shingle equi-join prunes
                           the quadratic pair space)
- ``simhash``            64→16-bit sign-sum fingerprint from an arithmetic
                         word hash — pure column expressions, so a SQL
                         oracle reproduces it exactly
- ``minhash_lsh_pairs``  MinHash signatures + banded LSH bucket join —
                         the 100 TB-scale near-dup path (candidates only
                         ever meet inside a bucket)

All content hashing is explicit integer arithmetic (no engine-private hash
functions) so results are engine-portable and stable across versions.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import FP_BASE, FP_MOD, word_shingles_from

#: MinHash permutation modulus — 2^31-1 keeps (h % P) * a + b inside int64
MH_PRIME = 2147483647  # 2^31 - 1 (Mersenne)


def exact_dedup(df: DataFrame, key_cols: List[str], id_col: str) -> DataFrame:
    """Keep the min-id row per duplicate group (deterministic winner)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def word_hash(word: Column) -> Column:
    """base-131 polynomial over the first 8 chars — portable to SQL
    (fixed-position substr/ascii, fits int64: 131^7·255 < 2^63)."""
    h = F.lit(0).cast("long")
    for k in range(1, 9):
        c = F.when(F.length(word) >= k, F.ascii(F.substring(word, k, 1))).otherwise(F.lit(0))
        h = h * F.lit(FP_BASE) + c
    return h


def word_hash_sql(col: str) -> str:
    expr = "CAST(0 AS BIGINT)"
    for k in range(1, 9):
        c = (f"(CASE WHEN length({col}) >= {k} "
             f"THEN ascii(substr({col}, {k}, 1)) ELSE 0 END)")
        expr = f"({expr} * {FP_BASE} + {c})"
    return expr


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace words: mix each word hash with an LCG,
    sum ±1 per bit position, fingerprint bit = sign. Near-duplicate docs
    differ in few bits (compare via hamming distance ≤ t)."""
    words = F.split(text, " ")
    mixed = F.transform(words, lambda wd: (word_hash(wd) % F.lit(1 << 31)) * F.lit(2654435761) % F.lit(1 << 32))

    # ONE fold with a 16-slot array accumulator: each word hashes once and
    # contributes ±1 to every bit lane via zip_with (the round-1 shape ran
    # 16 separate aggregates, re-evaluating word_hash per word per bit)
    def _merge(acc, m):
        lanes = F.array(*[
            F.when(F.shiftright(m, bit) % 2 == 1, F.lit(1).cast("long"))
             .otherwise(F.lit(-1).cast("long"))
            for bit in range(16)])
        return F.zip_with(acc, lanes, lambda a, b: a + b)

    ones = F.aggregate(mixed,
                       F.array_repeat(F.lit(0).cast("long"), 16),
                       _merge)
    fp = F.lit(0).cast("long")
    for bit in range(16):
        fp = fp + F.when(F.element_at(ones, bit + 1) > 0,
                         F.lit(1 << bit)).otherwise(F.lit(0))
    return fp


def simhash16_sql(col: str) -> str:
    wh = word_hash_sql("wd")
    mixed = f"((({wh}) % {1 << 31}) * 2654435761 % {1 << 32})"
    bits = []
    for bit in range(16):
        ones = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"[CASE WHEN ({mixed} // {1 << bit}) % 2 = 1 THEN CAST(1 AS BIGINT) "
                f"ELSE CAST(-1 AS BIGINT) END for wd in string_split({col}, ' ')]), "
                f"(acc, v) -> acc + v)")
        bits.append(f"CASE WHEN ({ones}) > 0 THEN {1 << bit} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Pairs (a < b) with Jaccard(shingle-set a, shingle-set b) ≥ threshold.

    Shape: explode distinct shingles → self equi-join on shingle →
    per-pair intersection counts → join per-doc set sizes → filter.
    The only quadratic step is within a shingle bucket (skew-prone for very
    common shingles at planetary scale — cap or salt there; see minhash for
    the probabilistic alternative).
    """
    sh = (docs.select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), " ").alias("_w"))
          .select("id", F.explode(F.array_distinct(
              word_shingles_from(F.col("_w"), n))).alias("sh")))
    left = sh.alias("l")
    right = sh.alias("r")
    pairs = (left.join(right, (F.col("l.sh") == F.col("r.sh")) & (F.col("l.id") < F.col("r.id")))
             .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    out = (pairs
           .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sz_a"), "a")
           .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sz_b"), "b"))
    jac_ok = (out["inter"] * (1.0 / threshold)) >= (out["sz_a"] + out["sz_b"] - out["inter"])
    return out.filter(jac_ok).select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"),
                                     "inter", "sz_a", "sz_b")


def shingle_hash(sh: Column) -> Column:
    """Full polynomial hash of a shingle string (mod FP_MOD)."""
    return F.aggregate(
        F.split(sh, ""), F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_BASE) + F.ascii(c)) % F.lit(FP_MOD),
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 32) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) - sig[i] = min over shingles of
    (a_i*h + b_i) mod 2^31-1, deterministic fixed coefficients.

    Shape: explode distinct shingles -> hash each ONCE per row -> per-doc
    min of every permutation in a single aggregation. (Nesting the
    char-fold hash inside num_hashes array transforms blew the codegen
    expression tree up ~16x: measured 55 s -> ~2 s at sf0.1.)"""
    a = [(2 * i + 1) * 40503 + 1 for i in range(num_hashes)]          # odd multipliers
    b = [(i * 2654435761 + 17) % MH_PRIME for i in range(num_hashes)]
    exploded = (docs.select(F.col(id_col).alias("id"),
                            F.split(F.col(text_col), " ").alias("_w"))
                .select("id", F.explode(F.array_distinct(
                    word_shingles_from(F.col("_w"), n))).alias("_sh"))
                .withColumn("_h", shingle_hash(F.col("_sh")) % F.lit(MH_PRIME)))
    aggs = [F.min((F.col("_h") * F.lit(a[i]) + F.lit(b[i])) % F.lit(MH_PRIME))
            .alias(f"_s{i}") for i in range(num_hashes)]
    per_doc = exploded.groupBy("id").agg(*aggs)
    return per_doc.select(
        "id", F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs sharing any band of
    minhash values meet in a bucket. Returns distinct (doc_a < doc_b) pairs
    with their estimated Jaccard (matching signature fraction)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes)
    band_arrays = F.array(*[
        F.concat_ws("_", F.lit(bi), *[F.element_at("sig", bi * rows_per_band + j + 1)
                                      for j in range(rows_per_band)])
        for bi in range(bands)])
    buckets = sigs.select("id", "sig", F.explode(band_arrays).alias("bucket"))
    l = buckets.alias("l")
    r = buckets.alias("r")
    cand = (l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
             .select(F.col("l.id").alias("doc_a"), F.col("r.id").alias("doc_b"),
                     F.col("l.sig").alias("sig_a"), F.col("r.sig").alias("sig_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    eq_cnt = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0))),
        F.lit(0), lambda acc, v: acc + v)
    return cand.select("doc_a", "doc_b",
                       (eq_cnt.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"))


def edit_refine(pairs: DataFrame, docs: DataFrame, max_dist: int,
                id_col: str = "doc_id", text_col: str = "text",
                a_col: str = "doc_a", b_col: str = "doc_b",
                prefix: int = 120,
                dist_col: str = "edit_dist") -> DataFrame:
    """Second-stage verification of LSH candidate pairs by bounded edit
    distance — the precision pass after minhash recall (candidates share
    hashed shingles; edit distance certifies character-level closeness
    and kills the shingle-collision false positives).

    Distance is computed on the first ``prefix`` characters of each text
    (a standard corpus-dedup bound: full-document Levenshtein is O(n*m)
    per pair and documents run to megabytes; the prefix cap makes the
    per-pair cost a CONSTANT O(prefix * max_dist), independent of
    document length). The threshold form of Spark's ``levenshtein``
    (JVM-side, 3-arg since Spark 3.5) abandons a pair's DP early once
    the banded diagonal exceeds ``max_dist`` — cost O(p*d), not O(p^2).

    Scale shape: two shuffle joins keyed on the pair ids pull the two
    prefixes next to each other (SUBSTRING happens in the scan
    projection, so only ``prefix`` chars per doc move through the
    shuffle, not whole documents), then a pure-JVM filter. Cost is
    proportional to CANDIDATES (already bucketed by LSH), never all
    pairs. No Python UDF.

    Returns (a_col, b_col, dist_col) for pairs with distance <=
    ``max_dist``.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if prefix < 1:
        raise ValueError(f"prefix must be >= 1, got {prefix}")
    # decouple the DP's parallelism from the upstream layout: the LSH
    # candidate output is small in BYTES, so AQE coalesces it toward one
    # partition — and then every O(prefix·max_dist) Levenshtein runs on
    # one core (measured ~6 s single-task for 40k pairs at p=120/d=80).
    # The exchange must sit BELOW the prefix joins: placed above them,
    # the optimizer pushes the distance filter (and the DP inside it)
    # back under the exchange and the single-task stage returns.
    # REPARTITION_BY_NUM is exempt from AQE coalescing, and the
    # levenshtein predicate cannot be pushed below joins it depends on.
    pairs = pairs.repartition(
        pairs.sparkSession.sparkContext.defaultParallelism)
    txt = docs.select(F.col(id_col).alias("_eid"),
                      F.substring(F.col(text_col), 1, prefix).alias("_ep"))
    joined = (pairs
              .join(txt.withColumnRenamed("_eid", a_col)
                    .withColumnRenamed("_ep", "_pa"), a_col)
              .join(txt.withColumnRenamed("_eid", b_col)
                    .withColumnRenamed("_ep", "_pb"), b_col))
    d = F.levenshtein(F.col("_pa"), F.col("_pb"), max_dist)
    return (joined.withColumn(dist_col, d)
            .filter(F.col(dist_col) >= 0)
            .select(a_col, b_col, dist_col))


def edit_refine_sql(pairs_cte: str, max_dist: int, prefix: int = 120,
                    docs_table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`edit_refine` over a candidate-pairs CTE named
    ``pairs`` with columns (doc_a, doc_b). DuckDB's levenshtein counts
    BYTES where Spark counts codepoints — equal on ASCII corpora (the
    gate corpus is verified ASCII; the unicode divergence is pinned
    Spark-side in pytest instead)."""
    return f"""
WITH {pairs_cte},
prefixes AS (
  SELECT {id_col} AS pid, substr({text_col}, 1, {int(prefix)}) AS p
  FROM {docs_table}
)
SELECT doc_a, doc_b, levenshtein(a.p, b.p) AS edit_dist
FROM pairs
JOIN prefixes a ON a.pid = doc_a
JOIN prefixes b ON b.pid = doc_b
WHERE levenshtein(a.p, b.p) <= {int(max_dist)}
"""


def dedup_clusters(ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   a_col: str = "doc_a", b_col: str = "doc_b",
                   max_iters: int = 50, stats: dict = None,
                   method: str = "auto") -> DataFrame:
    """Connected-component cluster resolution over a near-dup pair graph:
    (id, cluster_id) where cluster_id = the minimum id in the component —
    the canonical-survivor rule of a training-data dedup pass ("keep one
    doc per duplicate cluster"; the row with id == cluster_id survives).
    ``ids`` supplies the vertex universe, so documents with no pair come
    back as their own singleton cluster.

    Three methods, bit-identical results (pytest pins parity):

    - ``method="auto"`` (default): min-label rounds first — one cheap
      shuffle each — and, if the graph has not converged after a few
      rounds, contract every edge through the current labels and finish
      with star alternation on the (strictly smaller) condensed graph.
      Measured three ways before being made the default (BENCH.md
      round-6): on a 1M-doc corpus of planted small clusters
      (diameter ≤ 3) min-label 15.5 s / star 58.8 s / auto 18.9 s,
      while on the sf0.1 pHash collision graph (chainier components)
      star 7.6 s / min-label 13.4 s / auto 8.4 s — auto converges
      early on the first shape, pays the star rounds only on the
      condensed residual of the second, and stays within ~20% of the
      per-shape winner while being ~1.6–3× ahead of the per-shape
      loser, labels identical everywhere (digest-asserted).
    - ``method="star"``: alternating large-star / small-star
      rounds (Kiveris et al., "Connected Components in MapReduce and
      Beyond", SoCC'14 — public algorithm). Each alternation rewires
      edges toward component minima; the edge set converges to disjoint
      stars centered at each component's minimum id in O(log^2 n) rounds
      (O(log d) in practice), vs the O(diameter) rounds of label
      propagation — the win for chain-shaped components that banded-LSH
      transitivity produces at corpus scale.
    - ``method="minlabel"``: iterative min-label propagation (each round
      every vertex takes the min of its own and its neighbors' labels;
      rounds = component diameter). The parity twin; fastest on graphs
      known to be small-diameter (dedup clusters usually are).

    ``max_iters`` is a divergence guard, not a tuning knob, and
    non-convergence raises instead of returning wrong labels. ``stats``:
    optional dict filled with {"rounds": n, "method": m} on return
    (bench instrumentation — rounds-to-fixpoint is the scale-relevant
    number).

    100 TB shape (both methods): per-round cost is O(|E|/cores) with no
    growth across rounds — every round's plan starts from the previous
    localCheckpoint (the standard iterative-algorithm discipline used
    by knn_grid). Star rounds additionally SHRINK |E| monotonically
    toward one edge per non-min vertex, so late rounds are cheaper than
    early ones; the convergence probe is a left-anti join on the edge
    key both sides are already hashed on.
    """
    if stats is not None:
        stats["method"] = method
    if method == "auto":
        return _clusters_auto(ids, pairs, id_col, a_col, b_col,
                              max_iters, stats)
    if method == "star":
        return _clusters_star(ids, pairs, id_col, a_col, b_col,
                              max_iters, stats)
    if method == "minlabel":
        return _clusters_minlabel(ids, pairs, id_col, a_col, b_col,
                                  max_iters, stats)
    raise ValueError(f"unknown method {method!r} (auto | star | minlabel)")


#: min-label rounds the hybrid runs before contracting to star rounds.
#: Components of diameter <= this converge inside the cheap phase; the
#: value covers the overwhelmingly common dedup shape (small clusters)
#: while bounding the wasted cheap rounds on chain graphs to a constant.
_AUTO_SWITCH_AFTER = 3


def _clusters_auto(ids, pairs, id_col, a_col, b_col, max_iters, stats):
    """Hybrid resolution: up to _AUTO_SWITCH_AFTER min-label rounds; on
    non-convergence, contract edges through the current labels and
    delegate the condensed graph to star alternation, composing
    final(v) = star_label(minlabel_label(v)).

    Correctness of the composition: after K min-label rounds label(v)
    is the minimum id within distance K of v — in particular each label
    is a vertex of the same component, and a component's true minimum m
    always has label(m) = m, so m survives contraction as a condensed
    vertex and star's per-component minimum over condensed vertices IS
    the true minimum. Edges (a, b) map to (label(a), label(b)); dropped
    self-loops are exactly the pairs already known to share a label."""
    edges = (pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
             .unionByName(
                 pairs.select(F.col(b_col).alias("src"),
                              F.col(a_col).alias("dst")))
             .repartition("src").localCheckpoint())
    labels = (ids.select(F.col(id_col).alias("v"),
                         F.col(id_col).alias("lbl"))
              .localCheckpoint())
    for it in range(_AUTO_SWITCH_AFTER):
        nbr = (edges.join(labels.withColumnRenamed("v", "src"), "src")
               .groupBy("dst").agg(F.min("lbl").alias("_nlbl"))
               .withColumnRenamed("dst", "v"))
        nlbl = F.coalesce(F.col("_nlbl"), F.col("lbl"))
        new = (labels.join(nbr, "v", "left")
               .select("v",
                       F.least(F.col("lbl"), nlbl).alias("lbl"),
                       (nlbl < F.col("lbl")).cast("long").alias("_chg"))
               .localCheckpoint())
        changed = new.agg(F.sum("_chg")).first()[0]
        labels = new.drop("_chg")
        if not changed:
            if stats is not None:
                stats["rounds"] = it + 1
                stats["switched"] = False
            return labels.select(F.col("v").alias(id_col),
                                 F.col("lbl").alias("cluster_id"))
    # not converged: condense and finish with star on the residual.
    # Built from the CHECKPOINTED directed edge list, not from ``pairs``
    # — re-reading pairs would re-evaluate its (possibly expensive LSH /
    # band-join) lineage a second time. Each undirected edge appears in
    # both directions here; star's distinct() collapses them.
    la = labels.select(F.col("v").alias("src"), F.col("lbl").alias("_la"))
    lb = labels.select(F.col("v").alias("dst"), F.col("lbl").alias("_lb"))
    condensed = (edges.join(la, "src").join(lb, "dst")
                 .select(F.col("_la").alias("ca"), F.col("_lb").alias("cb"))
                 .filter(F.col("ca") != F.col("cb")))
    cvs = labels.select(F.col("lbl").alias("cv")).distinct()
    sub = {}
    star = _clusters_star(cvs, condensed, "cv", "ca", "cb", max_iters, sub)
    if stats is not None:
        stats["rounds"] = _AUTO_SWITCH_AFTER + sub.get("rounds", 0)
        stats["switched"] = True
        stats["star_rounds"] = sub.get("rounds", 0)
    return (labels.join(star.withColumnRenamed("cv", "lbl"), "lbl")
            .select(F.col("v").alias(id_col), "cluster_id"))


def _clusters_star(ids, pairs, id_col, a_col, b_col, max_iters, stats):
    """Large-star/small-star alternation (SoCC'14). Edge state is the
    canonical (hi > lo) distinct pair set; fixpoint = the alternation
    returns the same set, at which point the edges form disjoint stars
    (hi = member, lo = component minimum)."""
    hi, lo = F.greatest(F.col(a_col), F.col(b_col)), \
        F.least(F.col(a_col), F.col(b_col))
    E = (pairs.select(hi.alias("hi"), lo.alias("lo"))
         .filter(F.col("hi") != F.col("lo"))
         .repartition("hi", "lo").distinct().localCheckpoint())

    def canon(x, y):
        return [F.greatest(x, y).alias("hi"), F.least(x, y).alias("lo")]

    it = 0
    while not E.isEmpty():
        it += 1
        if it > max_iters:
            raise RuntimeError(
                f"dedup_clusters: no fixpoint after {max_iters} star "
                "rounds")
        # large-star: u's star minimum m = min(u, neighbors); every
        # STRICTLY LARGER neighbor v re-wires to (v, m)
        sym = (E.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
               .unionByName(
                   E.select(F.col("lo").alias("u"), F.col("hi").alias("v"))))
        mins = (sym.groupBy("u")
                .agg(F.min("v").alias("_mn"))
                .select("u", F.least(F.col("_mn"), F.col("u")).alias("m")))
        large = (sym.join(mins, "u")
                 .filter(F.col("v") > F.col("u"))
                 .filter(F.col("v") != F.col("m"))
                 .select(*canon(F.col("v"), F.col("m"))))
        E1 = large.repartition("hi", "lo").distinct().localCheckpoint()
        # small-star: canonical edges already point larger -> smaller, so
        # Γ(u) here is exactly u's smaller neighbors; all of them plus u
        # re-wire to m = min(Γ(u))
        mins2 = E1.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (E1.join(mins2, "hi")
                 .filter(F.col("lo") != F.col("m"))
                 .select(*canon(F.col("lo"), F.col("m")))
                 .unionByName(mins2.select(F.col("hi").alias("hi"),
                                           F.col("m").alias("lo"))))
        E2 = small.repartition("hi", "lo").distinct().localCheckpoint()
        # fixpoint probe: one anti-join each way on the already-hashed key
        if (E2.join(E, ["hi", "lo"], "left_anti").isEmpty()
                and E.join(E2, ["hi", "lo"], "left_anti").isEmpty()):
            E = E2
            break
        E = E2
    if stats is not None:
        stats["rounds"] = it
    members = E.select(F.col("hi").alias("v"), F.col("lo").alias("lbl"))
    centers = E.select(F.col("lo").alias("v"),
                       F.col("lo").alias("lbl")).distinct()
    labeled = members.unionByName(centers)
    univ = ids.select(F.col(id_col).alias("v"))
    single = (univ.join(labeled.select("v"), "v", "left_anti")
              .select("v", F.col("v").alias("lbl")))
    return (labeled.unionByName(single)
            .select(F.col("v").alias(id_col), F.col("lbl").alias("cluster_id")))


def _clusters_minlabel(ids, pairs, id_col, a_col, b_col, max_iters, stats):
    """Min-label propagation; rounds = component diameter. The per-round
    improvement counter is a 0/1 sum (bounded by the row count — safe for
    64-bit hash/snowflake ids under ANSI arithmetic, where summing the
    labels themselves would overflow). Edges are iteration-invariant —
    pre-partitioned by src ONCE (localCheckpoint pins the layout), so
    each round is one shuffle of the (id, label) table against
    co-located edges plus a map-side partial min."""
    edges = (pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
             .unionByName(
                 pairs.select(F.col(b_col).alias("src"),
                              F.col(a_col).alias("dst")))
             .repartition("src").localCheckpoint())
    labels = (ids.select(F.col(id_col).alias("v"),
                         F.col(id_col).alias("lbl"))
              .localCheckpoint())
    for it in range(max_iters):
        nbr = (edges.join(labels.withColumnRenamed("v", "src"), "src")
               .groupBy("dst").agg(F.min("lbl").alias("_nlbl"))
               .withColumnRenamed("dst", "v"))
        nlbl = F.coalesce(F.col("_nlbl"), F.col("lbl"))
        new = (labels.join(nbr, "v", "left")
               .select("v",
                       F.least(F.col("lbl"), nlbl).alias("lbl"),
                       (nlbl < F.col("lbl")).cast("long").alias("_chg"))
               .localCheckpoint())
        changed = new.agg(F.sum("_chg")).first()[0]
        labels = new.drop("_chg")
        if not changed:
            if stats is not None:
                stats["rounds"] = it + 1
            return labels.select(F.col("v").alias(id_col),
                                 F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"dedup_clusters: no fixpoint after {max_iters} rounds "
        "(component diameter exceeds max_iters)")
