"""BPE tokenizer induction (pipeline/bpe.py) vs a pure-Python reference."""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.pipeline.bpe import SEP, bpe_segment, bpe_train


def py_bpe(word_counts: dict[str, int], k: int):
    """Reference: greedy left-to-right merges, (count DESC, lex) winner."""
    hist = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in hist.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0
                ) + c
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, c))
        new: dict[tuple[str, ...], int] = {}
        for syms, cnt in hist.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + cnt
        hist = new
    return merges


DOCS = [
    (0, "low low low lower lowest a"),
    (1, "new newer newest low"),
    (2, "wider wide new newest i a"),
]


def _wc():
    wc: dict[str, int] = {}
    for _, t in DOCS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, num_merges=6).collect()
    ]
    assert got == py_bpe(_wc(), 6)


def test_bpe_overlapping_pair_is_greedy(spark):
    # 'aaaa' holds three (a,a) pairs; greedy merge yields [aa, aa]
    docs = spark.createDataFrame([(0, "aaaa aaaa b")], "doc_id long, text string")
    merges = bpe_train(docs, num_merges=2).collect()
    assert (merges[0].left, merges[0].right, merges[0].pair_count) == ("a", "a", 6)
    # round 2 operates on the GREEDILY merged [aa, aa]: top pair is (aa, aa)
    assert (merges[1].left, merges[1].right) == ("aa", "aa")


def test_bpe_exhausts_vocabulary_early(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges = bpe_train(docs, num_merges=5).collect()
    assert len(merges) == 1  # after (a,b) every word is one symbol


def test_bpe_segment_counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    table = [(l, r) for _, l, r, _ in py_bpe(_wc(), 6)]
    got = {r.doc_id: (r.n_tokens, r.n_subwords)
           for r in bpe_segment(docs, table).collect()}
    # python oracle: apply the same merges per word
    def seg(word):
        syms = list(word)
        for l, r in table:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)
    for doc_id, text in DOCS:
        words = text.split()
        assert got[doc_id] == (len(words), sum(seg(w) for w in words))


def test_bpe_validation(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match=">= 1"):
        bpe_train(docs, num_merges=0)
    assert SEP == "\x1f"


# --- r5: batched merge rounds (identical output, ~k× fewer Spark jobs) ------


def test_bpe_batched_matches_sequential_fixture(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    seq = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, num_merges=6, batch_k=1).collect()
    ]
    for k in (2, 4, 8):
        got = [
            (r.merge_rank, r.left, r.right, r.pair_count)
            for r in bpe_train(docs, num_merges=6, batch_k=k).collect()
        ]
        assert got == seq == py_bpe(_wc(), 6), f"batch_k={k}"


def test_bpe_batched_matches_sequential_overlap_fixture(spark):
    """The 'aaaa' fixture: every candidate shares symbol a, so the batch
    degenerates to size 1 per round — and must STILL match."""
    docs = spark.createDataFrame([(0, "aaaa aaaa b ab ab")], "doc_id long, text string")
    seq = [(r.left, r.right, r.pair_count)
           for r in bpe_train(docs, num_merges=3, batch_k=1).collect()]
    got = [(r.left, r.right, r.pair_count)
           for r in bpe_train(docs, num_merges=3, batch_k=8).collect()]
    assert got == seq


def test_bpe_batched_matches_python_on_random_corpora(spark):
    """Randomized small-alphabet corpora drive deep merge chains where
    multi-char symbols collide and interact — the adversarial regime for
    the batching rule.  12 merges × 3 seeds, batch_k=8 vs the pure-Python
    sequential reference."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        text = " ".join(words)
        wc: dict[str, int] = {}
        for w in words:
            wc[w] = wc.get(w, 0) + 1
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = [
            (r.merge_rank, r.left, r.right, r.pair_count)
            for r in bpe_train(docs, num_merges=12, batch_k=8).collect()
        ]
        assert got == py_bpe(wc, 12), f"seed={seed}"


def test_select_batch_rules():
    """Unit probes of the three batching rules on synthetic count tables."""
    from neo4j_graph_algorithms_spark.pipeline.bpe import _select_batch

    # rule 1: shared symbol stops the prefix
    cands = [("a", "b", 10), ("b", "c", 9), ("x", "y", 8)]
    stats = {("a", "l"): 10, ("b", "r"): 10, ("b", "l"): 9, ("c", "r"): 9,
             ("x", "l"): 8, ("y", "r"): 8}
    assert _select_batch(cands, stats) == [("a", "b", 10)]

    # rule 3: a created pair could outrank the next candidate (nb >= c)
    cands = [("a", "b", 10), ("x", "y", 9)]
    stats = {("a", "l"): 10, ("b", "r"): 10, ("x", "l"): 9, ("y", "r"): 9,
             ("a", "r"): 9}  # some (q, a) pair has count 9 -> (q, ab) may reach 9
    assert _select_batch(cands, stats) == [("a", "b", 10)]

    # rule 3 pass: bounds strictly below the next count
    cands = [("a", "b", 10), ("x", "y", 9)]
    stats = {("a", "l"): 10, ("b", "r"): 10, ("x", "l"): 9, ("y", "r"): 9,
             ("a", "r"): 8, ("b", "l"): 8}
    assert _select_batch(cands, stats) == [("a", "b", 10), ("x", "y", 9)]

    # rule 2: concat collision accepts the merge but stops the batch
    cands = [("a", "b", 10), ("x", "y", 5)]
    stats = {("a", "l"): 10, ("b", "r"): 10, ("x", "l"): 5, ("y", "r"): 5,
             ("ab", "l"): 3}  # symbol "ab" already participates in pairs
    assert _select_batch(cands, stats) == [("a", "b", 10)]
