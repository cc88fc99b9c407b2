"""Sparse lexical retrieval: integer tf dot-product top-k over an
inverted-index join.

The third member of the engine's similarity family — minhash/simhash
cover set overlap, the embedding stack covers dense vectors; this
covers the classic sparse term-vector space (the Lucene/BM25 family)
with EXACT integer scoring so a SQL oracle pins every score: the score
of (q, c) is Σ_t tf_q(t)·tf_c(t) — raw term-frequency dot product,
rank ties broken by candidate id. (tf-idf/BM25 weighting multiplies
per-term floats into the sum and is NOT cross-engine exact; the
integer dot is, and §"doc_top_terms" already pins the idf ORDERING
trick separately.)

Shape: tokenize → (doc, term, tf) postings → self equi-join on term
restricted to the query subset → groupBy (q, c) summing the products →
WindowGroupLimit top-k. The posting-list join only ever pairs docs
sharing a term — the inverted-index pruning that makes sparse
retrieval sub-quadratic.

Scale levers at 100 TB:
- ``max_df`` drops terms appearing in more than max_df documents — the
  published stop-list/df-cutoff trick. Stop-word heads are exactly the
  quadratic buckets (a term in f docs contributes f·|q-side| pairs),
  so the cutoff bounds the worst bucket; it changes SEMANTICS
  (documented, deterministic, reproduced by the oracle), unlike
  salting which only rebalances.
- the df cutoff applies as a broadcast LEFT ANTI join against the
  df > max_df stop-head — the head is bounded by the cutoff's
  selectivity, while the kept set approaches the whole vocabulary at
  corpus scale and could never broadcast.
- remaining head skew after the cutoff is ordinary join-key skew: AQE
  skew-split handles it (the engine-wide default).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def tf_postings(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                max_df: Optional[int] = None) -> DataFrame:
    """(id, term, tf) inverted-index postings; terms present in more
    than ``max_df`` documents are dropped (None keeps everything)."""
    toks = (docs.select(F.col(id_col).alias("id"),
                        F.explode(F.split(F.col(text_col), " ")).alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    if max_df is None:
        return tf
    if max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    # broadcast the DROPPED stop-head (df > max_df), not the kept set: at
    # corpus scale the kept terms are essentially the whole vocabulary
    # while the head is bounded by the cutoff's selectivity, so the
    # anti-join's broadcast side is the small one (ADVICE r6). Identical
    # semantics: keep df <= max_df ⟺ drop df > max_df.
    head = (tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df))
    return tf.join(F.broadcast(head.select("term")), "term", "left_anti") \
        .select("id", "term", "tf")


def similar_topk(docs: DataFrame, query_ids: DataFrame, k: int,
                 id_col: str = "doc_id", text_col: str = "text",
                 max_df: Optional[int] = None) -> DataFrame:
    """Top-k corpus docs per query doc by integer tf dot product
    (self excluded; ties -> lower candidate id). ``query_ids`` is a
    one-column DataFrame of ids (small — it broadcasts onto the
    postings to carve out the query side without rescanning text)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    post = tf_postings(docs, id_col, text_col, max_df)
    qpost = (post.join(F.broadcast(query_ids.select(
        F.col(query_ids.columns[0]).alias("id"))), "id")
        .select(F.col("id").alias("q_id"), "term",
                F.col("tf").alias("tf_q")))
    pairs = (qpost.join(post.select(F.col("id").alias("c_id"), "term",
                                    F.col("tf").alias("tf_c")), "term")
             .filter(F.col("q_id") != F.col("c_id"))
             .groupBy("q_id", "c_id")
             .agg(F.sum(F.col("tf_q") * F.col("tf_c")).alias("dot")))
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(),
                                           F.col("c_id").asc())
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("q_id", "c_id", "dot", "rnk"))


def similar_topk_sql(k: int, query_pred: str = "doc_id < 20",
                     max_df: Optional[int] = None,
                     table: str = "documents") -> str:
    """DuckDB oracle — identical tokenization, pruning, integer scores,
    and tie order."""
    prune = (f"HAVING COUNT(*) <= {max_df}" if max_df is not None else
             "HAVING TRUE")
    return f"""
WITH toks AS (
  SELECT doc_id AS id, w AS term
  FROM {table}, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''),
tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY id, term),
keep AS (SELECT term FROM tf GROUP BY term {prune}),
post AS (SELECT tf.* FROM tf JOIN keep USING (term)),
pairs AS (
  SELECT q.id AS q_id, c.id AS c_id, SUM(q.tf * c.tf) AS dot
  FROM post q JOIN post c ON q.term = c.term AND q.id <> c.id
  WHERE q.id IN (SELECT doc_id FROM {table} WHERE {query_pred})
  GROUP BY q.id, c.id)
SELECT q_id, c_id, dot, rnk FROM (
  SELECT q_id, c_id, dot,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dot DESC, c_id ASC) AS rnk
  FROM pairs)
WHERE rnk <= {k}
"""
