"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation/blocklist set.

The published method behind every serious LLM training corpus (GPT-3
appendix C's 13-gram overlap filter, The Pile, Dolma's decontamination
pass): build the set of word n-grams appearing in the held-out eval
suite, then drop (or flag) any training document containing one. The
operator returns the FLAGGED documents with hit counts — callers
anti-join the flags against the corpus to decontaminate.

Scale shape (the part that matters at 100 TB):
- the eval side is small by construction (benchmarks are MBs, the
  corpus is TBs) → its distinct n-grams are **broadcast**; the corpus
  side joins map-side and NEVER shuffles its text.
- the corpus computes its shingle array **in-row** (JVM
  ``word_shingles`` + ``array_distinct``, whole-stage codegen), carries
  the per-doc gram count through the explode, and LEFT-joins the
  broadcast gram set; the unconditional ``groupBy(doc)`` then sends one
  map-side partial-agg row per corpus doc (hit or not) through the
  exchange — a doc's grams all live in one input row, hence one
  partition, so the partial agg collapses each doc to a single row —
  and the hits filter applies after aggregation.
- for eval sets too big to broadcast, compose with
  ``operators.bloom_join.bloom_bits``: pre-filter corpus grams through
  a bloom of the eval grams, then shuffle only candidates.

Reference scope note: the reference engine (mantlik/osm2garmin) has no
text pipeline; this module belongs to the brief's "training-data
pipeline" extension family alongside functions/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import word_shingles_from


def contamination_hits(corpus: DataFrame, evalset: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 5) -> DataFrame:
    """Flagged corpus documents: (id, hit_grams, total_grams) for every
    corpus doc sharing >= 1 distinct word n-gram with ``evalset``.

    ``hit_grams`` counts the doc's DISTINCT n-grams that appear anywhere
    in the eval set; ``total_grams`` is the doc's distinct n-gram count,
    so hit_grams/total_grams is the contamination rate. Docs shorter
    than ``n`` words have no n-grams and can never be flagged.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ev_grams = (evalset
                .select(F.split(F.col(text_col), " ").alias("_w"))
                .select(F.explode(F.array_distinct(
                    word_shingles_from(F.col("_w"), n))).alias("g"))
                .distinct()
                .withColumn("_hit", F.lit(1)))
    doc_grams = (corpus
                 .select(F.col(id_col).alias("id"),
                         F.split(F.col(text_col), " ").alias("_w"))
                 .select("id", F.explode(F.array_distinct(
                     word_shingles_from(F.col("_w"), n))).alias("g")))
    # LEFT broadcast join + one aggregation counts hits AND the doc's
    # total distinct grams in a single text pass. (Carrying
    # size(grams) as a column through the explode instead re-evaluates
    # the full shingle expression per exploded row — Catalyst inlines
    # the multiply-referenced alias across the Generate boundary;
    # measured 6.4 s vs 0.4 s over 5k docs. The exchange now carries
    # one partial-agg row per doc rather than per flagged doc — still
    # narrow and linear.)
    return (doc_grams
            .join(F.broadcast(ev_grams), "g", "left")
            .groupBy("id")
            .agg(F.count("_hit").alias("hit_grams"),
                 F.count(F.lit(1)).alias("total_grams"))
            .filter(F.col("hit_grams") > 0)
            .select(F.col("id").alias(id_col), "hit_grams", "total_grams"))


def decontaminate(corpus: DataFrame, evalset: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """The corpus with contaminated documents REMOVED (left anti join
    against the flags — the shape a training-data pipeline actually
    ships; the flags side is tiny so the anti join broadcasts)."""
    flags = contamination_hits(corpus, evalset, id_col, text_col, n)
    return corpus.join(F.broadcast(flags.select(id_col)), id_col,
                       "left_anti")


def contamination_hits_sql(n: int = 5, eval_pred: str = "doc_id < 50",
                           corpus_pred: str = "doc_id >= 50",
                           table: str = "documents") -> str:
    """DuckDB value oracle: identical n-gram extraction (split on single
    spaces, space-rejoined windows, per-doc distinct) via
    list_transform(range(...)) — no engine hash involved, the join key
    is the gram string itself, so equality is exact by construction."""
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {n}
              THEN list_distinct(list_transform(range(1, len(w) - {n} + 2),
                                 i -> array_to_string(w[i : i + {n - 1}], ' ')))
              ELSE [] END AS gl
  FROM tok),
ev AS (SELECT DISTINCT UNNEST(gl) AS g FROM grams WHERE {eval_pred}),
cg AS (SELECT doc_id, len(gl) AS total_grams, UNNEST(gl) AS g
       FROM grams WHERE {corpus_pred})
SELECT cg.doc_id, COUNT(*) AS hit_grams, ANY_VALUE(cg.total_grams) AS total_grams
FROM cg JOIN ev ON cg.g = ev.g
GROUP BY cg.doc_id
"""
