"""Unit tests for text/dedup/similarity against independent numpy/python
oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.functions import text as T
from osm2garmin_spark.functions import dedup as D
from osm2garmin_spark.functions import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "spark engines shuffle data across many executors"),
        (3, "the quick brown fox jumps over the lazy dog"),  # dup of 0
        (4, "a b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count_and_fingerprint(spark, docs):
    out = {r["doc_id"]: (r["n"], r["fp"]) for r in docs.select(
        "doc_id", T.token_count(F.col("text")).alias("n"),
        T.fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[0][0] == 9 and out[4][0] == 2
    # python oracle for the rolling hash
    def fp(s):
        acc = 0
        for c in s:
            acc = (acc * T.FP_BASE + ord(c)) % T.FP_MOD
        return acc
    assert out[0][1] == fp("the quick brown fox jumps over the lazy dog")
    assert out[0][1] == out[3][1]  # identical docs → identical fp
    assert out[0][1] != out[1][1]


def test_word_shingles(spark, docs):
    out = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", T.word_shingles(F.col("text"), 3).alias("sh")).collect()}
    assert out[4] == []  # shorter than n
    assert out[0][0] == "the quick brown"
    assert out[0][-1] == "the lazy dog"
    assert len(out[0]) == 7


def test_simhash_similar_docs_close(spark, docs):
    out = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", D.simhash16(F.col("text")).alias("sh")).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert out[0] == out[3]                      # identical
    assert ham(out[0], out[1]) <= 6              # 1-word diff → close
    assert ham(out[0], out[2]) >= ham(out[0], out[1])  # unrelated no closer


def test_minhash_estimates_jaccard(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, n=1, num_hashes=32, bands=8).collect()
    est = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs}
    assert est[(0, 3)] == 1.0                    # exact dup pair found
    if (0, 1) in est:                            # true unigram jaccard = 8/10
        assert est[(0, 1)] >= 0.4


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 5").select(F.col("vec_id").alias("q_id"),
                                       F.col("embedding").alias("q_vec"))
    c = df.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    got = {(r["q_id"], r["rnk"]): r["c_id"]
           for r in S.cosine_topk(q, c, 3).collect()}

    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms.T
    np.fill_diagonal(sims, -np.inf)
    for qi in range(5):
        order = sorted(range(40), key=lambda j: (-sims[qi, j], j))[:3]
        for k in range(3):
            assert got[(qi, k + 1)] == order[k]


def test_ann_lsh_recall(spark):
    rng = np.random.default_rng(12)
    base = rng.normal(size=(60, 16)).astype(np.float32)
    # plant near-duplicates so ANN has true positives in-bucket
    base[50] = base[0] + 0.01
    base[51] = base[1] + 0.01
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(60)],
        "vec_id long, embedding array<float>")
    q = df.filter("vec_id IN (0, 1)").select(F.col("vec_id").alias("q_id"),
                                             F.col("embedding").alias("q_vec"))
    c = df.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    got = {(r["q_id"], r["c_id"]) for r in
           S.ann_lsh_topk(q, c, 1, dim=16, num_planes=4).collect()}
    assert (0, 50) in got and (1, 51) in got


def test_ann_multitable_recall_planted_near_dups(spark):
    """Scale-shape check (VERDICT round 1, item 4): banded multi-table LSH
    with corpus-sized planes must find planted near-duplicates with recall
    >= 0.9, while per-bucket population stays bounded by the planes knob."""
    rng = np.random.default_rng(13)
    n, dim, nq = 2000, 32, 60
    base = rng.normal(size=(n, dim)).astype(np.float32)
    for i in range(nq):  # row 1000+i is a near-dup of row i
        base[1000 + i] = base[i] + 0.02 * rng.normal(size=dim).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    c = df.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    top1 = {r["q_id"]: r["c_id"] for r in
            S.ann_lsh_topk(q, c, 1, dim=dim).collect()}
    hits = sum(1 for i in range(nq) if top1.get(i) == 1000 + i)
    assert hits / nq >= 0.9

    # bucket populations bounded: planes sized so E[bucket] ~ target
    planes, tables = S.plan_lsh(n)
    b = S.lsh_bucket_table(c, "c_id", "c_vec", dim, planes, tables)
    max_bucket = b.groupBy("tbl", "bucket").count().agg(
        F.max("count")).first()[0]
    assert max_bucket < 6 * 256  # random-projection buckets are uneven but bounded


def test_ivf_recall_planted_near_dups(spark):
    """IVF ANN: planted near-duplicates must surface as top-1 with recall
    >= 0.9 at nprobe=4, and inverted-list populations stay ~n/nlist."""
    rng = np.random.default_rng(21)
    n, dim, nq = 1500, 32, 50
    base = rng.normal(size=(n, dim)).astype(np.float32)
    for i in range(nq):
        base[700 + i] = base[i] + 0.02 * rng.normal(size=dim).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    c = df.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    top1 = {r["q_id"]: r["c_id"] for r in
            S.ivf_topk(q, c, 1, dim=dim, nprobe=4).collect()}
    hits = sum(1 for i in range(nq) if top1.get(i) == 700 + i)
    assert hits / nq >= 0.9

    # list populations bounded around n/nlist
    C = S.train_ivf_centroids(c, "c_vec", dim, nlist=38, id_col="c_id")
    lists = S.ivf_assign(c, "c_id", "c_vec", C, nprobe=1)
    counts = [r["count"] for r in lists.groupBy("list_id").count().collect()]
    assert max(counts) < 12 * (n / 38)


def test_plan_lsh_scales_with_corpus():
    """Planes (and so bucket count) must grow with the corpus so the
    within-bucket quadratic join never sees unbounded populations."""
    p_small, _ = S.plan_lsh(1_000)
    p_big, _ = S.plan_lsh(1_000_000)
    p_huge, _ = S.plan_lsh(10 ** 12)
    assert p_small < p_big < p_huge
    assert p_huge <= 30
    # expected bucket population is flat: n / 2^planes ~ target
    for n in (10 ** 4, 10 ** 7, 10 ** 10):
        planes, _ = S.plan_lsh(n)
        assert n / (2 ** planes) <= 2 * 256


def test_bpe_pretokenizer(spark):
    rows = [(1, "I'll go to 123 places!"), (2, "hello   world"), (3, "a")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (list(r["t"]), r["n"]) for r in df.select(
        "id", T.bpe_pretokens(F.col("text")).alias("t"),
        T.bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got[1][0] == ["I", "'ll", " go", " to", " 123", " places", "!"]
    assert got[1][1] == 7
    assert got[2][0] == ["hello", "  ", " world"] or got[2][1] == 3
    assert got[3][1] == 1


def test_exact_dedup(spark, docs):
    kept = sorted(r["doc_id"] for r in
                  D.exact_dedup(docs, ["text"], "doc_id").collect())
    assert kept == [0, 1, 2, 4]


def test_ngram_jaccard_pairs(spark, docs):
    out = {(r["doc_a"], r["doc_b"]) for r in
           D.ngram_jaccard_pairs(docs, n=1, threshold=0.7).collect()}
    assert (0, 3) in out           # identical
    assert (0, 1) in out           # jaccard 8/10
    assert (0, 2) not in out


def test_stopword_hits_adjacent_and_sql_parity(spark):
    """ADVICE r2: adjacent stopword occurrences must each count — the old
    replace-length trick consumed the shared delimiter (' the the ' → 1).
    The DuckDB twin must agree token-for-token."""
    import duckdb
    rows = [(0, "the the and of of of"), (1, "the quick the"),
            (2, "nothing here"), (3, "the"), (4, "and  and")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", T.stopword_hits(F.col("text")).alias("n")).collect()}
    assert got[0] == 6          # 2×the + 1×and + 3×of
    assert got[1] == 2
    assert got[2] == 0
    assert got[3] == 1
    assert got[4] == 2          # double space between must not merge tokens
    con = duckdb.connect()
    for _id, txt in rows:
        sql_n = con.execute(
            f"SELECT {T.stopword_hits_sql('$1')}", [txt]).fetchone()[0]
        assert sql_n == got[_id], (txt, sql_n, got[_id])


def test_lang_guess_split_semantics(spark):
    rows = [(0, "the the und"), (1, "der und die der"), (2, "zzz qqq")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lg"] for r in df.select(
        "id", T.lang_guess(F.col("text")).alias("lg")).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "unknown"


def test_ann_recall_vs_exact_twin_on_testdata(spark):
    """The two rows-only driver queries (ann_lsh_top3 / ann_ivf_top3) are
    pinned against their EXACT twin (embed_top3) on the driver's own
    testdata: recall floors that a bucket-sizing or probe regression
    would break. The embeddings here are near-random (not near-dups), the
    regime where hyperplane LSH is inherently weakest — its near-dup
    contract, recall >= 0.9 on planted duplicates, is pinned by the
    planted tests above; IVF's nprobe probing holds high recall in both
    regimes. At this corpus size (500 rows <= 2·target_bucket_rows)
    plan_lsh sizes ONE plane, so coverage is near-exhaustive and recall
    ~1.0 (a fixed 4-plane floor used to cut it to 0.58)."""
    from osm2garmin_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    exact = {(r["q_id"], r["c_id"]) for r in Q.embed_top3(spark, sf).collect()}
    lsh = {(r["q_id"], r["c_id"])
           for r in Q.ann_lsh_top3(spark, sf).collect()}
    ivf = {(r["q_id"], r["c_id"])
           for r in Q.ann_ivf_top3(spark, sf).collect()}
    assert len(exact) == 60
    assert len(lsh & exact) / len(exact) >= 0.9
    assert len(ivf & exact) / len(exact) >= 0.75


def test_dedup_clusters_matches_union_find(spark):
    """dedup_clusters (iterative min-label propagation) must equal a
    driver-side union-find on random graphs, including chain components
    (worst-case diameter) and isolated vertices."""
    import numpy as np
    import pandas as pd
    from osm2garmin_spark.functions.dedup import dedup_clusters

    rng = np.random.default_rng(23)
    n = 400
    # random sparse edges + one long chain (ids 300..349) for diameter
    ea = rng.integers(0, 280, 120)
    eb = rng.integers(0, 280, 120)
    chain_a = np.arange(300, 349)
    chain_b = chain_a + 1
    pairs = pd.DataFrame({
        "doc_a": np.concatenate([np.minimum(ea, eb), chain_a]),
        "doc_b": np.concatenate([np.maximum(ea, eb), chain_b]),
    })
    pairs = pairs[pairs.doc_a != pairs.doc_b]
    ids = pd.DataFrame({"doc_id": np.arange(n)})

    # driver-side union-find oracle
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}

    out = dedup_clusters(spark.createDataFrame(ids),
                         spark.createDataFrame(pairs))
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == want
    # both methods must agree bit-for-bit with the oracle (and thus with
    # each other) on the same graph
    got_ml = {r["doc_id"]: r["cluster_id"] for r in
              dedup_clusters(spark.createDataFrame(ids),
                             spark.createDataFrame(pairs),
                             method="minlabel").collect()}
    assert got_ml == want


def test_dedup_clusters_star_beats_diameter_rounds(spark):
    """The SoCC'14 large-star/small-star alternation must converge in
    O(log d) rounds where min-label propagation needs O(d): on a 64-node
    path graph (diameter 63) minlabel takes ~32 rounds, star must finish
    in <= 8 alternations — with identical labels."""
    from osm2garmin_spark.functions.dedup import dedup_clusters

    ids = spark.range(0, 64).selectExpr("id AS doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long")
    s_star, s_ml = {}, {}
    out_star = dedup_clusters(ids, pairs, stats=s_star, method="star")
    out_ml = dedup_clusters(ids, pairs, stats=s_ml, method="minlabel",
                            max_iters=100)
    rows_star = {r["doc_id"]: r["cluster_id"] for r in out_star.collect()}
    rows_ml = {r["doc_id"]: r["cluster_id"] for r in out_ml.collect()}
    assert rows_star == rows_ml == {i: 0 for i in range(64)}
    assert s_ml["rounds"] >= 16
    assert s_star["rounds"] <= 8, s_star
    assert s_star["rounds"] < s_ml["rounds"]


def test_dedup_clusters_star_edge_cases(spark):
    """Star method: empty edge set (all singletons), duplicate and
    reversed input pairs, and a component whose min id only ever appears
    on the doc_b side."""
    from osm2garmin_spark.functions.dedup import dedup_clusters

    ids = spark.range(0, 8).selectExpr("id AS doc_id")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = dedup_clusters(ids, empty, method="star")
    assert {r["doc_id"]: r["cluster_id"] for r in out.collect()} == \
        {i: i for i in range(8)}
    pairs = spark.createDataFrame(
        [(5, 3), (3, 5), (5, 3), (7, 0), (4, 7)],
        "doc_a long, doc_b long")
    out = dedup_clusters(ids, pairs, method="star")
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 0, 5: 3, 6: 6, 7: 0}
    # exactly one row per id (fixpoint stars are disjoint)
    assert out.count() == 8


def test_dedup_clusters_64bit_ids_no_overflow(spark):
    """Fixpoint detection must not sum raw labels: with 64-bit
    hash/snowflake-scale ids the label sum exceeds Long.MAX and ANSI
    arithmetic would throw before one propagation round. The detector
    sums a 0/1 improvement flag instead (bounded by the row count)."""
    import pandas as pd
    from osm2garmin_spark.functions.dedup import dedup_clusters

    base = 9_100_000_000_000_000_000
    ids = pd.DataFrame({"doc_id": [base + i for i in range(40)]})
    pairs = pd.DataFrame(
        {"doc_a": [base + i for i in range(0, 38, 2)],
         "doc_b": [base + i + 1 for i in range(0, 38, 2)]})
    out = dedup_clusters(spark.createDataFrame(ids),
                         spark.createDataFrame(pairs))
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert all(got[base + i] == base + (i - i % 2) for i in range(38))
    assert got[base + 38] == base + 38 and got[base + 39] == base + 39


def test_dedup_clusters_auto_switches_on_chain(spark):
    """The hybrid default: a 64-node path (diameter 63) cannot converge
    inside the cheap min-label phase, so auto must contract and finish
    with star rounds — labels identical to both pure methods, total
    rounds far below the diameter."""
    from osm2garmin_spark.functions.dedup import dedup_clusters

    ids = spark.range(0, 64).selectExpr("id AS doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long")
    s = {}
    out = dedup_clusters(ids, pairs, stats=s)          # default = auto
    assert {r["doc_id"]: r["cluster_id"] for r in out.collect()} == \
        {i: 0 for i in range(64)}
    assert s["method"] == "auto" and s["switched"] is True
    assert s["star_rounds"] >= 1
    assert s["rounds"] <= 12                           # << diameter 63


def test_dedup_clusters_auto_no_switch_on_small_components(spark):
    """Small-diameter components (triangles + an edge + singletons — the
    common dedup shape) converge inside the cheap phase: no contraction,
    no star rounds, labels equal to the star twin."""
    from osm2garmin_spark.functions.dedup import dedup_clusters

    ids = spark.range(0, 12).selectExpr("id AS doc_id")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (5, 6), (8, 9), (9, 10)],
        "doc_a long, doc_b long")
    s = {}
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(ids, pairs, stats=s).collect()}
    want = {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7,
            8: 8, 9: 8, 10: 8, 11: 11}
    assert out == want
    assert s["switched"] is False
    got_star = {r["doc_id"]: r["cluster_id"]
                for r in dedup_clusters(ids, pairs,
                                        method="star").collect()}
    assert got_star == want


def test_dedup_clusters_auto_min_only_on_b_side_after_switch(spark):
    """Regression guard for the contraction step: a long chain whose
    component minimum appears only on the doc_b side and unsorted pair
    order — auto (switched) must still label everything with the true
    minimum."""
    from osm2garmin_spark.functions.dedup import dedup_clusters

    n = 40
    ids = spark.range(0, n).selectExpr("id AS doc_id")
    pairs = spark.createDataFrame(
        [(i + 1, i) for i in range(n - 1)][::-1], "doc_a long, doc_b long")
    s = {}
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(ids, pairs, stats=s).collect()}
    assert s["switched"] is True
    assert out == {i: 0 for i in range(n)}


def test_edit_refine_matches_python_dp(spark):
    """Surviving pairs + distances equal a reference DP Levenshtein."""
    from osm2garmin_spark.functions.dedup import edit_refine

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = {0: "the quick brown fox", 1: "the quick brown fax",
             2: "lorem ipsum dolor", 3: "the quick brwn fox jumps",
             4: "completely different content here"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    cand = [(a, b) for a in texts for b in texts if a < b]
    pairs = spark.createDataFrame(cand, "doc_a long, doc_b long")
    got = {(r.doc_a, r.doc_b): r.edit_dist
           for r in edit_refine(pairs, docs, max_dist=6, prefix=50).collect()}
    want = {(a, b): lev(texts[a][:50], texts[b][:50])
            for a, b in cand if lev(texts[a][:50], texts[b][:50]) <= 6}
    assert got == want and (0, 1) in got and got[(0, 1)] == 1


def test_edit_refine_prefix_caps_cost_and_distance(spark):
    """Distance is computed on the PREFIX: two texts identical in the
    first `prefix` chars but wildly different after must survive at 0."""
    from osm2garmin_spark.functions.dedup import edit_refine

    docs = spark.createDataFrame(
        [(0, "x" * 30 + "a" * 500), (1, "x" * 30 + "b" * 500)],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    got = edit_refine(pairs, docs, max_dist=2, prefix=30).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in got] == [(0, 1, 0)]


def test_edit_refine_counts_codepoints_not_bytes(spark):
    """Spark levenshtein is codepoint-based; pin it so the documented
    ASCII-only oracle-parity assumption stays explicit."""
    from osm2garmin_spark.functions.dedup import edit_refine

    docs = spark.createDataFrame([(0, "résumé"), (1, "resume")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    got = edit_refine(pairs, docs, max_dist=5, prefix=20).collect()
    assert got[0].edit_dist == 2     # é→e twice; bytes would give 4


def test_edit_refine_bad_args(spark):
    import pytest
    from osm2garmin_spark.functions.dedup import edit_refine

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 0)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="max_dist"):
        edit_refine(pairs, docs, max_dist=-1)
    with pytest.raises(ValueError, match="prefix"):
        edit_refine(pairs, docs, max_dist=1, prefix=0)


def test_pq_topk_recall_and_exact_rerank(spark):
    """PQ ADC shortlist + exact re-rank vs the brute-force twin on the
    driver testdata: recall floor at sf0.001 (near-random embeddings, the
    hard regime), plus survivors must carry the EXACT cosine ranking (the
    re-rank stage, not the approximate order)."""
    from osm2garmin_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    exact = {(r["q_id"], r["c_id"], r["rnk"])
             for r in Q.embed_top3(spark, sf).collect()}
    pq = {(r["q_id"], r["c_id"], r["rnk"])
          for r in Q.ann_pq_top3(spark, sf).collect()}
    e_pairs = {(a, b) for a, b, _ in exact}
    p_pairs = {(a, b) for a, b, _ in pq}
    assert len(exact) == 60
    assert len(p_pairs & e_pairs) / len(e_pairs) >= 0.75
    # where PQ found the true top-3 for a query, ranks must agree exactly
    by_q_exact = {}
    for a, b, r in exact:
        by_q_exact.setdefault(a, set()).add((b, r))
    for a, b, r in pq:
        if {(bb, rr) for bb, rr in by_q_exact[a]
            if (a, bb) in p_pairs} == by_q_exact[a]:
            assert (b, r) in by_q_exact[a], (a, b, r)


def test_pq_codebooks_deterministic_and_shaped():
    import numpy as np
    from osm2garmin_spark.functions.similarity import train_pq_codebooks

    rng = np.random.RandomState(5)
    sample = rng.randn(300, 64)
    b1 = train_pq_codebooks(None, "v", 64, 8, 16, "id", sample_vecs=sample)
    b2 = train_pq_codebooks(None, "v", 64, 8, 16, "id", sample_vecs=sample)
    assert b1.shape == (8, 16, 8)
    assert (b1 == b2).all()


def test_pq_encode_codes_bounded(spark):
    import numpy as np
    from osm2garmin_spark.functions.similarity import (pq_encode,
                                                       train_pq_codebooks)

    rng = np.random.RandomState(6)
    sample = rng.randn(200, 16)
    books = train_pq_codebooks(None, "v", 16, 4, 8, "id", sample_vecs=sample)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(16)]) for i in range(50)],
        "c_id long, c_vec array<float>")
    rows = pq_encode(df, "c_id", "c_vec", books).collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["code"]) == 4
        assert all(0 <= c < 8 for c in r["code"])


def test_pq_validation_errors(spark):
    import numpy as np
    import pytest
    from osm2garmin_spark.functions.similarity import (pq_topk,
                                                       train_pq_codebooks)

    with pytest.raises(ValueError, match="must divide"):
        train_pq_codebooks(None, "v", 64, 7, 16, "id",
                           sample_vecs=np.zeros((10, 64)))
    df = spark.createDataFrame([(0, [0.0] * 8)], "q_id long, q_vec array<float>")
    with pytest.raises(ValueError, match="rerank"):
        pq_topk(df, df.selectExpr("q_id as c_id", "q_vec as c_vec"),
                k=5, dim=8, rerank=2, sample_vecs=np.zeros((10, 8)))
