"""Sparse tf dot-product retrieval: brute-force parity, df pruning
semantics, tie order, validation, broadcast-df plan shape."""

from collections import Counter

import pytest
from pyspark.sql import Row

from osm2garmin_spark.functions.retrieval import similar_topk, tf_postings


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def _qids(spark, ids):
    return spark.createDataFrame([Row(doc_id=i) for i in ids])


def _brute(texts, qids, k, max_df=None):
    tfs = [Counter(w for w in t.split(" ") if w) for t in texts]
    if max_df is not None:
        df = Counter()
        for c in tfs:
            df.update(c.keys())
        keep = {t for t, d in df.items() if d <= max_df}
        tfs = [Counter({t: v for t, v in c.items() if t in keep})
               for c in tfs]
    out = []
    for q in qids:
        scored = []
        for c in range(len(texts)):
            if c == q:
                continue
            dot = sum(tfs[q][t] * tfs[c][t] for t in tfs[q])
            if dot > 0:
                scored.append((-dot, c))
        for rnk, (nd, c) in enumerate(sorted(scored)[:k], start=1):
            out.append((q, c, -nd, rnk))
    return sorted(out)


def test_matches_brute_force(spark):
    import random
    rng = random.Random(23)
    vocab = [f"w{j}" for j in range(15)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25)))
             for _ in range(40)]
    qids = [0, 3, 7, 11]
    for max_df in (None, 20, 35):
        got = sorted((r.q_id, r.c_id, r.dot, r.rnk) for r in
                     similar_topk(_docs(spark, texts), _qids(spark, qids),
                                  k=3, max_df=max_df).collect())
        assert got == _brute(texts, qids, 3, max_df), f"max_df={max_df}"


def test_tie_breaks_to_lower_id(spark):
    texts = ["x y", "x y z", "x y q", "unrelated words here"]
    got = {(r.rnk): r.c_id for r in
           similar_topk(_docs(spark, texts), _qids(spark, [0]),
                        k=3).collect()}
    assert got[1] == 1 and got[2] == 2  # both dot=2, lower id first


def test_max_df_prunes_exactly(spark):
    texts = ["the a", "the b", "the c"]  # 'the' has df 3
    post = tf_postings(_docs(spark, texts), max_df=2)
    assert sorted(r.term for r in post.collect()) == ["a", "b", "c"]
    # and retrieval over the pruned postings finds nothing
    assert similar_topk(_docs(spark, texts), _qids(spark, [0]), k=3,
                        max_df=2).count() == 0


def test_zero_dot_pairs_absent(spark):
    texts = ["a b c", "d e f"]
    assert similar_topk(_docs(spark, texts), _qids(spark, [0]),
                        k=3).count() == 0


def test_validation(spark):
    d = _docs(spark, ["a"])
    with pytest.raises(ValueError, match="k must be"):
        similar_topk(d, _qids(spark, [0]), k=0)
    with pytest.raises(ValueError, match="max_df"):
        tf_postings(d, max_df=0)


def test_plan_broadcasts_df_and_query_ids(spark):
    texts = ["a b", "b c", "c d"]
    out = similar_topk(_docs(spark, texts), _qids(spark, [0]), k=2,
                       max_df=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # df filter + query ids