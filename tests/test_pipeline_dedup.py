"""Dedup operator tests: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Oracle strategy: brute-force pure-Python Jaccard / Hamming over the same
tiny corpora; LSH candidate generation is additionally checked for recall
on documents constructed to be near-duplicates."""

from __future__ import annotations

import itertools

import pytest

from neo4j_graph_algorithms_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()

# doc 1 = doc 0 duplicate; doc 2 = doc 0 with one word changed (high overlap);
# doc 3 disjoint vocabulary; doc 4 exact copy of doc 3.
DOCS = [
    (0, " ".join(WORDS)),
    (1, " ".join(WORDS)),
    (2, " ".join(WORDS[:-1] + ["omega"])),
    (3, "uno dos tres cuatro cinco seis siete ocho nueve diez"),
    (4, "uno dos tres cuatro cinco seis siete ocho nueve diez"),
]


def py_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    got = {r.doc_id: (r.canonical_id, r.is_duplicate) for r in exact_dedup(docs).collect()}
    assert got == {
        0: (0, False),
        1: (0, True),
        2: (2, False),
        3: (3, False),
        4: (3, True),
    }


def test_ngram_jaccard_pairs_match_python(spark, docs):
    got = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, n=1, threshold=0.5).collect()}
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = py_jaccard(ta, tb)
        if j >= 0.5:
            want[(ia, ib)] = round(j, 6)
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert got[(0, 2)] == pytest.approx(round(9 / 11, 6))


def test_trigram_jaccard(spark, docs):
    got = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    # identical docs share all 8 trigrams; doc2 differs in last word -> 7/9
    assert got[(0, 1)] == 1.0
    assert got[(3, 4)] == 1.0
    assert got[(0, 2)] == pytest.approx(round(7 / 9, 6))


@pytest.mark.parametrize("hash_mode", ["dict", "xxhash"])
def test_minhash_identical_docs_identical_sigs(spark, docs, hash_mode):
    sigs = minhash_signatures(docs, num_hashes=16, hash_mode=hash_mode).collect()
    by_id = {r.doc_id: tuple(r)[1:] for r in sigs}
    assert by_id[0] == by_id[1]
    assert by_id[3] == by_id[4]
    assert by_id[0] != by_id[3]


def test_minhash_similarity_estimate(spark, docs):
    """Fraction of agreeing minhashes ≈ Jaccard (law of the estimator)."""
    sigs = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(docs, num_hashes=64).collect()}
    agree = sum(x == y for x, y in zip(sigs[0], sigs[2])) / 64
    assert abs(agree - 9 / 11) < 0.2


def test_minhash_lsh_recall_and_verify(spark, docs):
    got = {
        (r.a, r.b): r.jaccard
        for r in minhash_lsh_dedup(docs, num_hashes=16, bands=8, threshold=0.5).collect()
    }
    # near-dup pairs all recovered (identical docs collide in every band)
    assert (0, 1) in got and (3, 4) in got and (0, 2) in got
    # disjoint-vocab pairs never pass verification
    assert all(not (a in (0, 1, 2) and b in (3, 4)) for a, b in got)


def test_lsh_candidates_subset_of_bucket_joins(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=16)
    cands = {(r.a, r.b) for r in minhash_lsh_candidates(sigs, bands=8).collect()}
    assert (0, 1) in cands and (3, 4) in cands
    assert all(a < b for a, b in cands)


@pytest.mark.parametrize("hash_mode", ["dict", "xxhash"])
def test_simhash_properties(spark, docs, hash_mode):
    sh = {r.doc_id: r.simhash for r in simhash(docs, bits=32, hash_mode=hash_mode).collect()}
    assert sh[0] == sh[1] and sh[3] == sh[4]
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far  # similar docs closer in Hamming space


def test_simhash_dedup_finds_duplicates(spark, docs):
    got = {(r.a, r.b): r.hamming for r in simhash_dedup(docs, bits=32, max_hamming=3).collect()}
    assert got[(0, 1)] == 0 and got[(3, 4)] == 0
    for a, b in got:
        assert not (a in (0, 1, 2) and b in (3, 4))


def test_simhash_default_64_bits(spark, docs):
    # bit 63 is the BIGINT sign bit: 2^63 can't ride py4j as a literal, so
    # the weight must be built JVM-side (regression: NumberFormatException)
    sh = {r.doc_id: r.simhash for r in simhash(docs, bits=64).collect()}
    assert sh[0] == sh[1] and sh[3] == sh[4]
    got = {(r.a, r.b): r.hamming for r in simhash_dedup(docs, bits=64, max_hamming=3).collect()}
    assert got[(0, 1)] == 0 and got[(3, 4)] == 0


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert minhash_lsh_dedup(empty, num_hashes=8, bands=4).count() == 0


# -- embedding-cosine near-dup -------------------------------------------------


def test_embedding_near_dedup_exact_groups(spark):
    """Three planted clusters of near-identical vectors + one outlier:
    components = clusters, representative = min id, outlier is its own rep."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import embedding_near_dedup

    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    for vid in range(9):  # cluster c = vid % 3, tiny per-member perturbation
        v = list(base[vid % 3])
        v[3] = 0.001 * (vid + 1)
        rows.append((vid, [float(x) for x in v]))
    rows.append((9, [0.5, 0.5, 0.5, 0.5]))  # outlier: cos ~0.5 to everything
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        r.vec_id: (r.rep_id, r.is_dup)
        for r in embedding_near_dedup(embs, threshold=0.99, exact=True).collect()
    }
    assert len(got) == 10
    for vid in range(9):
        assert got[vid] == (vid % 3, int(vid >= 3))
    assert got[9] == (9, 0)


def test_embedding_near_dedup_lsh_matches_exact_on_planted(spark):
    """On well-separated clusters the SRP-LSH path finds the same groups as
    brute force (bucket recall is exact for near-identical vectors: equal
    signatures share every band)."""
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.dedup import embedding_near_dedup

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16))
    rows = []
    for vid in range(12):
        v = centers[vid % 4] + rng.normal(scale=1e-4, size=16)
        rows.append((vid, [float(x) for x in v]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = sorted(
        map(tuple, embedding_near_dedup(embs, threshold=0.999, exact=True).collect())
    )
    lsh = sorted(
        map(
            tuple,
            embedding_near_dedup(
                embs, threshold=0.999, n_planes=16, bands=4, dim=16
            ).collect(),
        )
    )
    assert exact == lsh
    reps = {r for _, r, _ in exact}
    assert reps == {0, 1, 2, 3}


def test_minhash_near_dup_groups(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import minhash_near_dup_groups

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon eta"),  # near-dup of 0
            (2, "one two three four five six"),
            (3, "one two three four five six"),  # exact dup of 2
            (4, "totally different content here now ok"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.rep_id, r.is_dup)
        for r in minhash_near_dup_groups(
            docs, num_hashes=8, bands=4, threshold=0.5, ngram=1, hash_mode="dict"
        ).collect()
    }
    assert got[2] == (2, 0) and got[3] == (2, 1)  # exact dups always group
    assert got[4] == (4, 0)  # singleton is its own representative
    # 0/1 share 5 of 7 tokens (J=5/7 >= 0.5): grouped under min id 0
    assert got[0] == (0, 0) and got[1] == (0, 1)


def test_semantic_dedup_groups_planted_clusters(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import semantic_dedup

    # two tight clusters + one outlier; copies within a cluster are
    # near-identical (cosine ~1), clusters are orthogonal
    rows = []
    for i in range(4):                      # cluster A around e1
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(4, 7):                   # cluster B around e2
        rows.append((i, [0.0, 0.01 * (i - 4), 1.0, 0.0]))
    rows.append((7, [0.0, 0.0, 0.0, 1.0]))  # outlier
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["rep_id"], r["is_dup"])
           for r in semantic_dedup(embs, threshold=0.99, n_centroids=3,
                                   iterations=2).collect()}
    assert out[0] == (0, 0) and all(out[i] == (0, 1) for i in (1, 2, 3))
    assert out[4] == (4, 0) and all(out[i] == (4, 1) for i in (5, 6))
    assert out[7] == (7, 0)


def test_semantic_dedup_no_dups_below_threshold(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import semantic_dedup

    embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(embs, threshold=0.5, n_centroids=2, iterations=1).collect()
    assert all(r["is_dup"] == 0 for r in out)
    assert {r["vec_id"] for r in out} == {0, 1, 2}


def test_keep_best_in_groups_picks_quality_then_min_id(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import keep_best_in_groups
    from neo4j_graph_algorithms_spark.pipeline.text import quality_score

    # docs 0/1/2 form one near-dup cluster; doc 1 is padded with stopword-free
    # junk words so its quality grade q4 differs from its twins; docs 3/4 are
    # an identical pair (q4 tie -> min id wins); doc 5 is a singleton.
    base = "the a of and " + " ".join(f"w{i}" for i in range(20))
    rows = [
        (0, base),
        (1, base),
        (2, base + " zz"),
        (3, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),
        (4, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),
        (5, "solo document with its own vocabulary entirely disjoint here ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.rep_id, r.q4, r.keep) for r in
           keep_best_in_groups(docs, num_hashes=8, bands=4, threshold=0.5,
                               ngram=1, hash_mode="dict").collect()}
    q4 = {r.doc_id: r.quality * 4 for r in quality_score(docs).collect()}
    # every doc got a row; exactly one keep per rep_id
    assert set(got) == set(range(6))
    reps = {}
    for doc_id, (rep, q, keep) in got.items():
        assert q == int(q4[doc_id])
        reps.setdefault(rep, []).append((doc_id, q, keep))
    for rep, members in reps.items():
        kept = [m for m in members if m[2] == 1]
        assert len(kept) == 1
        best_q = max(q for _, q, _ in members)
        expect = min(d for d, q, _ in members if q == best_q)
        assert kept[0][0] == expect
    # the identical pair 3/4 must share a group and keep doc 3
    assert got[3][0] == got[4][0]
    assert (got[3][2], got[4][2]) == (1, 0)
    # the singleton keeps itself
    assert got[5][2] == 1


def test_span_dedup_duplicated_docs_fully_removed(spark, docs):
    from neo4j_graph_algorithms_spark.pipeline.dedup import span_dedup

    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in span_dedup(docs, n=3, min_count=2).collect()
    }
    # docs 0/1 and 3/4 are exact pairs: every 3-gram is corpus-duplicated,
    # so every token is covered and the rebuilt text is empty
    for d in (0, 1, 3, 4):
        assert got[d] == (10, 10, "")
    # doc 2 shares 3-grams at positions 0-6 with docs 0/1 (covering tokens
    # 0-8); its last gram "theta iota omega" is unique, so only the token
    # outside every duplicated gram's span survives
    assert got[2] == (10, 9, "omega")


def test_span_dedup_within_doc_multiplicity_counts(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import span_dedup

    # a single doc repeating its own 3-gram: "a b c" and "b c a" occur twice
    # WITHIN the doc, so min_count=2 fires without any cross-doc duplicate
    docs = spark.createDataFrame([(0, "a b c a b c a")], "doc_id long, text string")
    row = span_dedup(docs, n=3, min_count=2).collect()[0]
    assert (row.n_tokens, row.n_removed, row.clean_text) == (7, 7, "")


def test_span_dedup_short_docs_untouched(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import span_dedup

    docs = spark.createDataFrame(
        [(0, "x y"), (1, "x y"), (2, "")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in span_dedup(docs, n=3, min_count=2).collect()
    }
    # shorter than n → no grams → nothing can be covered, even for exact pairs
    assert got[0] == (2, 0, "x y")
    assert got[1] == (2, 0, "x y")
    assert got[2] == (0, 0, "")


def test_span_dedup_reshard_invariance(spark, docs):
    from neo4j_graph_algorithms_spark.pipeline.dedup import span_dedup

    a = sorted(map(tuple, span_dedup(docs, n=3, min_count=2).collect()))
    b = sorted(map(tuple, span_dedup(docs.repartition(7), n=3, min_count=2).collect()))
    assert a == b


# ---- n-gram containment -----------------------------------------------------


def test_containment_detects_subset_duplicate(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import ngram_containment_pairs

    short = "q w e r t y u"
    docs = spark.createDataFrame(
        [(1, short), (2, f"a b c {short} d e f g h i j k l m n o p")],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b): r.containment
        for r in ngram_containment_pairs(docs, n=3, threshold=0.5).collect()
    }
    # all 5 of doc-1's 3-grams appear in doc-2: C(1,2)=1.0; the reverse is
    # diluted below threshold — the asymmetry Jaccard cannot express
    assert got == {(1, 2): 1.0}


def test_containment_python_replay(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import ngram_containment_pairs

    texts = {
        1: "a b c d e f",
        2: "c d e f g h",
        3: "a b c d e f",  # exact dup of 1
        4: "zz yy xx",
    }
    def grams(t, n=3):
        toks = t.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    exp = {}
    for a, ta in texts.items():
        for b, tb in texts.items():
            if a == b:
                continue
            ga, gb = grams(ta), grams(tb)
            if ga and round(len(ga & gb) / len(ga), 6) >= 0.5:
                exp[(a, b)] = round(len(ga & gb) / len(ga), 6)
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.a, r.b): r.containment
        for r in ngram_containment_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert got == exp and (1, 3) in got and got[(1, 3)] == 1.0


def test_containment_short_docs_no_shingles(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import ngram_containment_pairs

    docs = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id long, text string")
    assert ngram_containment_pairs(docs, n=3, threshold=0.1).collect() == []
