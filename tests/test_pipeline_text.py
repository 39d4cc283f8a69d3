"""Text-analysis operator tests: token counting, language id, quality,
dictionary, fingerprint — hand-computed expectations on tiny corpora."""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.pipeline.text import (
    HASH_P,
    fingerprint,
    language_id,
    quality_score,
    token_count,
    token_dictionary,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "le chat est sur le tapis et la table"),
    (2, "zzz qqq xxx"),
    (3, "the the the a a of and to in is"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_count(spark, docs):
    got = {r.doc_id: (r.n_tokens, r.n_chars) for r in token_count(docs).collect()}
    assert got[0] == (6, len(DOCS[0][1]))
    assert got[2] == (3, 11)


def test_language_id(spark, docs):
    got = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "fr"
    assert got[2] == "und"  # no marker tokens at all
    assert got[3] == "en"


def test_language_score_is_marker_ratio(spark, docs):
    got = {r.doc_id: r.lang_score for r in language_id(docs).collect()}
    assert got[0] == pytest.approx(2 / 6)  # 'the' twice
    assert got[3] == pytest.approx(1.0)


def test_quality_score(spark, docs):
    got = {r.doc_id: r for r in quality_score(docs).collect()}
    # doc 2: only 3 tokens (<10) -> loses length band; no stopwords
    assert got[2].quality == pytest.approx(0.5)  # alpha + mean_len bands only
    assert got[3].quality == pytest.approx(1.0)
    assert got[0].stopword_ratio == pytest.approx(round(2 / 6, 6))  # 'the' twice


def test_dictionary_is_lexicographic(spark, docs):
    d = {r.tok: r.tid for r in token_dictionary(docs).collect()}
    toks = sorted(d)
    assert [d[t] for t in toks] == list(range(1, len(toks) + 1))


def test_fingerprint_matches_hand_rolled(spark, docs):
    d = {r.tok: r.tid for r in token_dictionary(docs).collect()}
    fps = {r.doc_id: r.fingerprint for r in fingerprint(docs, token_dictionary(docs)).collect()}
    for doc_id, text in DOCS:
        acc = 0
        for t in text.split():
            acc = (acc * 31 + d[t]) % HASH_P
        assert fps[doc_id] == acc, doc_id


def test_fingerprint_order_sensitive(spark):
    docs2 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta alpha")], "doc_id long, text string"
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprint(docs2, token_dictionary(docs2)).collect()}
    assert fps[0] != fps[1]


def test_subword_count_bpe_ish(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import subword_count

    docs = spark.createDataFrame(
        [
            (0, "hello world2 v2.0!"),
            (1, ""),
            (2, "a-b c_d"),  # '_' is punct class here, '-' too
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in subword_count(docs).collect()}
    # "hello world2 v2.0!" -> hello, world, 2, v, 2, '.', 0, '!'
    assert rows[0].n_subwords == 8
    assert rows[0].n_alpha_runs == 3 and rows[0].n_digit_runs == 3
    assert rows[0].n_punct == 2
    assert rows[1].n_subwords == 0
    assert rows[2].n_subwords == 6 and rows[2].n_punct == 2


def test_tf_idf_topk(spark, docs):
    import math

    from neo4j_graph_algorithms_spark.pipeline.text import tf_idf

    rows = tf_idf(docs, top_k=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: 'the' tf=2 df=2 beats the four tf=1 df=1 singletons
    top0 = max(by_doc[0], key=lambda r: r.score)
    assert top0.tok == "the" and top0.tf == 2
    assert top0.score == pytest.approx(round(2 * (math.log(5 / 3) + 1), 6))
    # singleton terms score tf=1 * (ln(5/2)+1)
    single = [r for r in by_doc[0] if r.tok == "cat"][0]
    assert single.score == pytest.approx(round(math.log(5 / 2) + 1, 6))
    # every doc emits at most k rows
    assert all(len(v) <= 5 for v in by_doc.values())


def test_bm25_matches_formula(spark, docs):
    import math

    from neo4j_graph_algorithms_spark.pipeline.text import bm25

    got = {r.doc_id: r for r in bm25(docs, ["the"]).collect()}
    assert set(got) == {0, 3}  # only docs containing 'the'
    n, avgdl, k1, b = 4, (6 + 9 + 3 + 10) / 4, 1.2, 0.75
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def expect(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert got[0].score == pytest.approx(expect(2, 6))
    assert got[3].score == pytest.approx(expect(3, 10))
    assert got[0].matched == 1 and got[3].matched == 1


def test_bm25_multi_term_sums(spark, docs):
    from neo4j_graph_algorithms_spark.pipeline.text import bm25

    got = {r.doc_id: r for r in bm25(docs, ["cat", "mat", "zzz"]).collect()}
    assert got[0].matched == 2  # cat + mat
    assert got[2].matched == 1  # zzz
    assert got[0].score > got[2].score > 0


# -- repetition ratio / decontamination ----------------------------------------


def test_repetition_ratio_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import repetition_ratio

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),        # 2-grams: ab ba ab ba ab → 5 total, 2 distinct
            (1, "x y z"),              # 2-grams: xy yz → all distinct
            (2, "solo"),               # shorter than n → 0 grams, ratio 0
            (3, ""),                   # empty
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_grams, r.n_distinct, r.rep_ratio) for r in
           repetition_ratio(docs, n=2).collect()}
    assert got[0] == (5, 2, 0.6)
    assert got[1] == (2, 2, 0.0)
    assert got[2] == (0, 0, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_decontaminate_explicit_eval_set(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # contains eval 3-gram
            (2, "entirely novel training text here"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in
           decontaminate(train, eval_docs=ev, n=3, threshold=0.3).collect()}
    # doc 1 has 3 distinct 3-grams, one of which ("quick brown fox") collides
    assert got[1].n_hit == 1 and got[1].n_grams == 3
    assert got[1].contaminated is True  # 1/3 >= 0.3
    assert got[2].n_hit == 0 and got[2].contaminated is False


def test_decontaminate_self_sample_excludes_eval_rows(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import decontaminate

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(0, 10)],
        "doc_id long, text string",
    )
    out = decontaminate(docs, n=3, eval_mod=5).collect()
    ids = {r.doc_id for r in out}
    assert 0 not in ids and 5 not in ids  # eval rows excluded from scoring
    assert len(ids) == 8


def test_pii_scrub_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@corp.example.org thanks"),
            (1, "server 192.168.1.10 and 10.0.0.1 are up"),
            (2, "call +1 555-0199 1234 today"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[0].n_email == 1 and "<EMAIL>" in got[0].text_clean
    assert "jane.doe" not in got[0].text_clean
    assert got[1].n_ipv4 == 2 and got[1].text_clean.count("<IP>") == 2
    assert got[2].n_phone == 1 and "<PHONE>" in got[2].text_clean
    assert got[3].text_clean == "clean text only"
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 0)


def test_pii_scrub_ip_not_double_counted_as_phone(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import pii_scrub

    docs = spark.createDataFrame(
        [(0, "ip 172.16.254.113 only")], "doc_id long, text string"
    )
    r = pii_scrub(docs).collect()[0]
    assert r.n_ipv4 == 1 and r.n_phone == 0
    assert r.text_clean == "ip <IP> only"


def test_unigram_logprob_ranks_typical_docs_higher(spark):
    import math

    from neo4j_graph_algorithms_spark.pipeline.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "zyx qwv jkp")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    # corpus: the=2 cat=2 sat=1 ran=1 zyx=1 qwv=1 jkp=1, total 9
    exp1 = (math.log(2 / 9) * 2 + math.log(1 / 9)) / 3
    exp3 = math.log(1 / 9)
    assert out[1]["avg_logp"] == round(exp1, 6)
    assert out[3]["avg_logp"] == round(exp3, 6)
    assert out[1]["avg_logp"] > out[3]["avg_logp"]  # typical beats gibberish
    assert out[1]["n_tokens"] == 3
    # empty docs dropped
    docs2 = spark.createDataFrame([(1, "a"), (2, "")], "doc_id long, text string")
    assert {r["doc_id"] for r in unigram_logprob(docs2).collect()} == {1}


def test_length_stats_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import length_stats

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b c"), (2, "a"), (3, "a b c d e"), (4, "a b c")],
        "doc_id long, text string",
    )
    row = length_stats(docs).collect()[0]
    # lengths sorted [1,2,3,3,5]
    assert row["n_docs"] == 5
    assert (row["min_tokens"], row["max_tokens"], row["sum_tokens"]) == (1, 5, 14)
    assert row["p50_tokens"] == 3   # ceil-rank 3 -> value 3
    assert row["p90_tokens"] == 5
    assert row["p99_tokens"] == 5


def test_chunk_documents_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.chunk_id): r for r in
           chunk_documents(docs, chunk_chars=6, overlap=2).collect()}
    # doc 1: len 10, stride 4 → ceil((10-2)/4) = 2 chunks
    assert out[(1, 0)].chunk_text == "abcdef" and out[(1, 0)].chunk_start == 0
    assert out[(1, 1)].chunk_text == "efghij" and out[(1, 1)].chunk_start == 4
    assert (1, 2) not in out
    # short and empty docs: exactly one chunk
    assert out[(2, 0)].chunk_text == "xy"
    assert out[(3, 0)].chunk_text == ""


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from neo4j_graph_algorithms_spark.pipeline.text import chunk_documents

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_chars=4, overlap=4)


def test_chunk_documents_covers_tail(spark):
    # property: concatenating chunks at stride offsets reconstructs the doc
    from neo4j_graph_algorithms_spark.pipeline.text import chunk_documents

    text = "the quick brown fox jumps over the lazy dog" * 3
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(docs, chunk_chars=20, overlap=5).collect(),
        key=lambda r: r.chunk_id,
    )
    rebuilt = chunks[0].chunk_text + "".join(
        c.chunk_text[5:] for c in chunks[1:]
    )
    assert rebuilt == text
    # every char position is covered by some chunk
    last = chunks[-1]
    assert last.chunk_start + len(last.chunk_text) == len(text)


def test_top_ngrams_counts_and_ties(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import top_ngrams

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b z z")],
        "doc_id long, text string",
    )
    out = top_ngrams(docs, n=2, k=3).collect()
    assert [(r.ngram, r.n_count, r.rank) for r in out] == [
        ("a b", 3, 1),   # doc1 twice + doc2 once
        ("b a", 1, 2),   # count-1 ties broken lexicographically
        ("b c", 1, 3),
    ]


def test_bigram_logprob_hand_values(spark):
    import math

    from neo4j_graph_algorithms_spark.pipeline.text import bigram_logprob

    # corpus bigrams: "a b" ×2, "b a" ×1, "b c" ×1 → heads: a→2, b→2
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b c"), (3, "z")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    # doc 1: ln(p(b|a)) + ln(p(a|b)) = ln(2/2) + ln(1/2), each term rounded
    # to 6dp first, then exact-summed and averaged.  Expected value computed
    # with HALF-UP rounding (the Spark/DuckDB rule — Python round() is
    # half-even and flips the exact -0.3465735 boundary here).
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    t_ab = round(math.log(2 / 2), 6)  # 0.0 — no boundary
    t_ba = round(math.log(1 / 2), 6)  # -0.693147
    expected = r6((round(t_ab * 1e6) + round(t_ba * 1e6)) / (2 * 1e6))
    assert expected == -0.346574  # the half-up side of the .5 boundary
    assert got[1].n_bigrams == 2 and got[1].avg_logp == expected
    assert got[2].n_bigrams == 2 and got[2].avg_logp == expected  # same terms
    assert 3 not in got  # single-token doc has no bigrams


def test_bigram_logprob_partition_invariant(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import bigram_logprob

    docs = spark.createDataFrame(
        [(i, "w x y z w x " * (i % 3 + 1)) for i in range(24)],
        "doc_id long, text string",
    )
    a = sorted(bigram_logprob(docs.repartition(1)).collect())
    b = sorted(bigram_logprob(docs.repartition(16)).collect())
    assert a == b


# ---- collocations ----------------------------------------------------------


def _expected_collocations(texts, min_count, per_head_k):
    """Engine-free lift computation."""
    from collections import Counter

    cxy = Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        for a, b in zip(toks, toks[1:]):
            cxy[(a, b)] += 1
    cx, cy = Counter(), Counter()
    for (a, b), c in cxy.items():
        cx[a] += c
        cy[b] += c
    n = sum(cxy.values())
    scored = [
        (a, b, c, cx[a], cy[b], c * n * 1_000_000 // (cx[a] * cy[b]))
        for (a, b), c in cxy.items()
        if c >= min_count
    ]
    out = {}
    by_head = {}
    for row in sorted(scored, key=lambda r: (r[0], -r[5], r[1])):
        by_head.setdefault(row[0], []).append(row)
    for head, rows in by_head.items():
        for rank, r in enumerate(rows[:per_head_k], start=1):
            out[(r[0], r[1])] = r[2:] + (rank,)
    return out


def test_collocations_exact_vs_python(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import collocations

    texts = (
        ["new york city hall", "new york is big", "new york new jersey"] * 3
        + ["the city hall of new york", "big city lights", "one"]
        + ["york new haven line"] * 2
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.x, r.y): (r.c_xy, r.c_x, r.c_y, r.lift_q6, r.rank)
        for r in collocations(docs, min_count=2, per_head_k=2).collect()
    }
    assert got == _expected_collocations(texts, 2, 2)
    assert got  # non-trivial: at least one surviving pair


def test_collocations_short_docs_and_reshard(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import collocations

    texts = ["one", "", "  ", "a b a b a b", "a b"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.x, r.y): (r.c_xy, r.c_x, r.c_y, r.lift_q6, r.rank)
        for r in collocations(docs, min_count=1, per_head_k=3).collect()
    }
    assert got == _expected_collocations(texts, 1, 3)
    got13 = {
        (r.x, r.y): (r.c_xy, r.c_x, r.c_y, r.lift_q6, r.rank)
        for r in collocations(
            docs.repartition(13), min_count=1, per_head_k=3
        ).collect()
    }
    assert got13 == got


def test_zipf_alpha_matches_python(spark, docs):
    import math
    from collections import Counter

    from neo4j_graph_algorithms_spark.pipeline.text import zipf_alpha

    freqs = Counter()
    for _, text in DOCS:
        freqs.update(t for t in text.split(" ") if t != "")
    fmin = 2
    tail = [f for f in freqs.values() if f >= fmin]
    s = sum(round(math.log(f / (fmin - 0.5)) * 1_000_000) for f in tail) / 1e6
    alpha = 1.0 + len(tail) / s
    row = zipf_alpha(docs, fmin=fmin).collect()[0]
    assert (row["fmin"], row["n_tail"]) == (fmin, len(tail))
    assert row["alpha_q6"] == pytest.approx(alpha, abs=1e-6)
    assert row["sigma_q6"] == pytest.approx(
        (alpha - 1) / math.sqrt(len(tail)), abs=1e-6
    )


# ---- winnowing fingerprints -------------------------------------------------


def _winnow_replay(texts, k, window):
    """Pure-python replay of the winnowing contract (dictionary mode)."""
    from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, WINNOW_POS_CAP

    vocab = sorted({t for x in texts.values() for t in x.split() if t})
    tid = {t: i + 1 for i, t in enumerate(vocab)}
    out = {}
    for did, text in texts.items():
        toks = [t for t in text.split() if t]
        khs = []
        for p in range(len(toks) - k + 1):
            acc = tid[toks[p]]
            for j in range(1, k):
                acc = (acc * 31 + tid[toks[p + j]]) % HASH_P
            khs.append(acc)
        sel = set()
        for s in range(len(khs) - window + 1):
            packed = [
                khs[s + j] * WINNOW_POS_CAP + (WINNOW_POS_CAP - 1 - (s + j))
                for j in range(window)
            ]
            mp = min(packed)
            sel.add((WINNOW_POS_CAP - 1 - mp % WINNOW_POS_CAP, mp >> 20))
        out[did] = sel
    return out


def _winnow_spark(spark, texts, k, window):
    from neo4j_graph_algorithms_spark.pipeline.text import (
        token_dictionary,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    res = winnow_fingerprints(docs, token_dictionary(docs), k=k, window=window)
    out = {}
    for r in res.collect():
        out.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    return out


def test_winnowing_matches_python_replay(spark):
    texts = {
        1: "a b c d e f g a b c d",
        2: "x y a b c d e z z x y",
        3: "q q q q q q",  # constant run: rightmost-min ties exercised
        4: "m n",  # shorter than one k-gram: no fingerprints
    }
    exp = _winnow_replay(texts, k=3, window=3)
    got = _winnow_spark(spark, texts, k=3, window=3)
    exp = {d: s for d, s in exp.items() if s}
    assert got == exp


def test_winnowing_shared_run_guarantee(spark):
    # docs share a run of window + k - 1 = 6 tokens -> must share >= 1 hash
    shared = "s1 s2 s3 s4 s5 s6"
    texts = {1: f"a b {shared} c d", 2: f"x {shared} y z w"}
    got = _winnow_spark(spark, texts, k=3, window=4)
    h1 = {h for _, h in got[1]}
    h2 = {h for _, h in got[2]}
    assert h1 & h2


def test_winnowing_k1_window1_selects_every_token(spark):
    texts = {7: "u v w"}
    got = _winnow_spark(spark, texts, k=1, window=1)
    assert {p for p, _ in got[7]} == {0, 1, 2}


def test_trigram_logprob_python_replay(spark):
    import math
    from collections import Counter

    from neo4j_graph_algorithms_spark.pipeline.text import trigram_logprob

    texts = {1: "a b c a b c", 2: "a b c d", 3: "c b a c b", 4: "x y"}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    # sequential replay of the documented contract
    toks = {i: t.split() for i, t in texts.items()}
    g3 = {i: [" ".join(ts[j : j + 3]) for j in range(len(ts) - 2)] for i, ts in toks.items() if len(ts) >= 3}
    g2 = [" ".join(ts[j : j + 2]) for ts in toks.values() for j in range(len(ts) - 1)]
    g1 = [w for ts in toks.values() for w in ts]
    c3 = Counter(g for gs in g3.values() for g in gs)
    h3 = Counter()
    for g, c in c3.items():
        h3[" ".join(g.split()[:2])] += c
    c2, c1 = Counter(g2), Counter(g1)
    h2 = Counter()
    for g, c in c2.items():
        h2[g.split()[0]] += c
    n = len(g1)
    want = {}
    for i, gs in g3.items():
        lp6 = []
        for g in gs:
            w1, w2, w3 = g.split()
            p = (
                0.6 * (c3[g] / h3[f"{w1} {w2}"])
                + 0.3 * (c2[f"{w2} {w3}"] / h2[w2])
                + 0.1 * (c1[w3] / n)
            )
            lp6.append(round(round(math.log(p), 6) * 1e6))
        want[i] = (len(gs), round(sum(lp6) / (len(gs) * 1e6), 6))
    got = {r.doc_id: (r.n_trigrams, r.avg_logp) for r in trigram_logprob(docs).collect()}
    assert set(got) == set(want)  # doc 4 (< 3 tokens) dropped
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)


def test_trigram_logprob_separates_fluent_from_scrambled(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import trigram_logprob

    fluent = "the quick brown fox jumps over the lazy dog " * 4
    scrambled = "dog the fox lazy quick jumps brown over the " * 4
    docs = spark.createDataFrame(
        [(1, fluent), (2, fluent), (3, fluent), (4, scrambled)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_logp for r in trigram_logprob(docs).collect()}
    assert got[1] == got[2] == got[3]
    assert got[1] > got[4]  # repeated fluent trigrams dominate the model


def test_trigram_logprob_partition_invariant(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import trigram_logprob

    docs = spark.createDataFrame(
        [(i, "u v w x y z u v w " * (i % 3 + 1)) for i in range(18)],
        "doc_id long, text string",
    )
    a = sorted(trigram_logprob(docs.repartition(1)).collect())
    b = sorted(trigram_logprob(docs.repartition(16)).collect())
    assert a == b


def test_readability_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import readability

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),  # 6 words, 2 sentences, 6 syl
            (2, "incomprehensibilities"),  # 1 word, 1 sentence, 8 vowel runs
            (3, ""),  # no tokens -> dropped
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability(docs).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    assert r1.flesch == round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    r2 = got[2]
    # i-o-e-e-i-i-i-ie: vowel runs of "incomprehensibilities"
    assert (r2.n_words, r2.n_sentences, r2.n_syllables) == (1, 1, 8)
    assert 3 not in got


def test_readability_rewards_simple_text(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import readability

    docs = spark.createDataFrame(
        [
            (1, "The cat sat on the mat. It was fun. We ran."),
            (2, "Extraordinarily convoluted circumlocutions invariably obfuscate comprehensibility."),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.flesch for r in readability(docs).collect()}
    assert got[1] > got[2]


def test_token_entropy_hand_values(spark):
    import math

    from neo4j_graph_algorithms_spark.pipeline.text import token_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b"), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert (got[1].n_tokens, got[1].n_distinct, got[1].entropy) == (4, 1, 0.0)
    # uniform over 4 -> ln 4; terms rounded to 6dp first
    t = round(-(0.25 * math.log(0.25)), 6)
    assert got[2].entropy == round(4 * round(t * 1e6) / 1e6, 6)
    t2 = round(-(0.5 * math.log(0.5)), 6)
    assert got[3].entropy == round(2 * round(t2 * 1e6) / 1e6, 6)
    assert 4 not in got  # empty doc dropped


def test_token_entropy_orders_repetitive_below_diverse(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import token_entropy

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam ham"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.entropy for r in token_entropy(docs).collect()}
    assert got[1] < got[2]


def test_source_mix_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.text import source_mix

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "web", 5),
            (2, "dd ee", "en", "web", 5),
            (3, "x", "fr", "web", 1),
            (4, "y z", "en", "code", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.source, r.lang): (r.n_docs, r.total_chars, r.total_tokens)
        for r in source_mix(docs).collect()
    }
    assert got == {
        ("web", "en"): (2, 10, 5),
        ("web", "fr"): (1, 1, 1),
        ("code", "en"): (1, 3, 2),
    }
