"""Decontamination: brute-force parity, short-doc exclusion, removal
semantics, broadcast plan shape."""

import pytest
from pyspark.sql import Row

from osm2garmin_spark.functions.decontam import (contamination_hits,
                                                 decontaminate)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def _grams(text, n):
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def _brute(corpus, evalset, n):
    ev = set().union(*[_grams(t, n) for t in evalset]) if evalset else set()
    out = {}
    for i, t in corpus:
        g = _grams(t, n)
        hits = len(g & ev)
        if hits:
            out[i] = (hits, len(g))
    return out


def test_matches_brute_force(spark):
    import random
    rng = random.Random(31)
    vocab = [f"w{k}" for k in range(40)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30)))
             for _ in range(60)]
    ev_texts, corpus_texts = texts[:12], texts[12:]
    for n in (2, 3, 5):
        got = {r.doc_id: (r.hit_grams, r.total_grams)
               for r in contamination_hits(
                   _docs(spark, corpus_texts), _docs(spark, ev_texts),
                   n=n).collect()}
        want = _brute(list(enumerate(corpus_texts)), ev_texts, n)
        assert got == want, f"n={n}"


def test_exact_substring_plant(spark):
    ev = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
    corpus = _docs(spark, [
        "padding quick brown fox jumps over tail words here",  # 5-gram hit
        "quick brown fox is too short a match for five",       # only 3 shared
        "totally unrelated text with no overlap at all",
    ])
    got = {r.doc_id: r.hit_grams
           for r in contamination_hits(corpus, ev, n=5).collect()}
    # exactly one eval 5-gram ("quick brown fox jumps over") survives the
    # sliding window into doc 0; docs 1-2 share at most 3 consecutive words
    assert got == {0: 1}


def test_short_docs_never_flag(spark):
    ev = _docs(spark, ["a b c d e"])
    corpus = _docs(spark, ["a b c d", "a b", ""])
    assert contamination_hits(corpus, ev, n=5).count() == 0


def test_decontaminate_removes_exactly_flagged(spark):
    ev = _docs(spark, ["one two three four five six"])
    corpus = _docs(spark, ["x one two three four five y",
                           "clean document with other words entirely now"])
    kept = decontaminate(corpus, ev, n=5)
    assert [r.doc_id for r in kept.collect()] == [1]


def test_n_validation(spark):
    with pytest.raises(ValueError, match="n must be"):
        contamination_hits(_docs(spark, ["a"]), _docs(spark, ["b"]), n=0)


def test_plan_broadcasts_eval_grams(spark):
    ev = _docs(spark, ["one two three four five six"])
    corpus = _docs(spark, ["x one two three four five y"] * 3)
    plan = (contamination_hits(corpus, ev, n=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
