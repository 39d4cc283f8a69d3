"""BPE tokenizer induction — learn subword merges from the corpus.

The training-data-pipeline step the reference has no analogue for (its
procedures are graph-side, /root/reference/algo/): before a tokenizer
exists, somebody has to TRAIN it, and at 10^12 documents that training is
itself a distributed job.  This is byte-pair encoding in the original
Sennrich/GPT word-level form: operate on the word HISTOGRAM (distinct
words weighted by corpus frequency — the standard trick that makes BPE
corpus-size-independent: |vocab| rows, not |corpus|), repeatedly find the
most frequent adjacent symbol pair and merge it.

Determinism contract (the gate requirement):
  * pair counts are adjacent-position counts weighted by word frequency
    (overlaps counted: [a,a,a] holds two (a,a) pairs) — exact integers;
  * the winning pair per round is (max count, then lexicographic
    (left, right) ascending) — no RNG, no hash;
  * the merge application is GREEDY LEFT-TO-RIGHT NON-OVERLAPPING, and it
    is executed as a literal string replace over a separator-anchored
    rendering ("␟a␟␟b␟" → "␟ab␟", ␟ = U+001F): Spark's F.replace, DuckDB's
    replace(), and Python's str.replace all share exactly these scan
    semantics (probed case-by-case in tests), so the oracle twin replays
    the identical merge — symbol boundaries are unconfusable because every
    symbol is individually ␟-wrapped (a suffix/prefix of a neighboring
    symbol can never fake the pattern).

Scale shape: each round is one explode of the |vocab|-sized histogram +
one map-side-combined count + a 1-row collect (the winning pair — a
scalar per round, never |vocab|-sized), then a pure column-expression
rewrite.  `num_merges` rounds total; vocabularies are O(10^6) rows at any
corpus size, so the whole loop is histogram-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"  # U+001F unit separator: never appears in tokenized text


def _anchored(syms_col):
    """array<string> → '␟s1␟␟s2␟…' — every symbol individually wrapped."""
    return F.concat(F.lit(SEP), F.array_join(syms_col, SEP + SEP), F.lit(SEP))


def _unanchored(s_col):
    """inverse of _anchored (SEP is not a regex metachar, F.split is safe).
    Accepts a Column or column name."""
    c = F.col(s_col) if isinstance(s_col, str) else s_col
    return F.split(c.substr(F.lit(2), F.length(c) - 2), SEP + SEP)


def word_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """[word, cnt] — the weighted vocabulary BPE trains on."""
    from neo4j_graph_algorithms_spark.pipeline.text import tokens_col

    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """[merge_rank, left, right, pair_count] — the learned merge table,
    one row per round in training order (rank 0 first).

    Characters are the initial symbols; each round merges the globally
    most frequent adjacent pair (ties → lexicographic (left, right)).
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    hist = word_histogram(docs, text_col).select(
        F.col("cnt"), F.split("word", "").alias("syms")
    )
    hist = hist.filter(F.size("syms") > 0).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        # slice-zip, not sequence(1, size-1): Spark's sequence(1, 0) is the
        # DESCENDING [1, 0], which indexes out of bounds on 1-symbol words
        pairs = hist.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(syms, 1, size(syms) - 1)").alias("l"),
                    F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged (every word one symbol)
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, l, r, c))
        pat = SEP + l + SEP + SEP + r + SEP
        rep = SEP + l + r + SEP
        hist = hist.select(
            "cnt",
            F.replace(_anchored(F.col("syms")), F.lit(pat), F.lit(rep)).alias("_s"),
        ).select("cnt", _unanchored("_s").alias("syms")).localCheckpoint(eager=True)

    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    merge_table: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, n_tokens, n_subwords] — apply a learned merge table (training
    order) and count the resulting subword units per document.  Pure
    column expressions: the merge table is a compile-time literal chain of
    replaces (tables have O(10^4) entries; each is one codegen'd replace —
    for very large tables, batch offline instead)."""
    from neo4j_graph_algorithms_spark.pipeline.text import tokens_col

    toks = docs.select(F.col(id_col), tokens_col(text_col).alias("toks"))
    exploded = toks.select(
        id_col, F.explode("toks").alias("word")
    ).withColumn("_s", _anchored(F.split("word", "")))
    s = F.col("_s")
    for l, r in merge_table:
        s = F.replace(s, F.lit(SEP + l + SEP + SEP + r + SEP), F.lit(SEP + l + r + SEP))
    per_word = exploded.select(id_col, F.size(_unanchored(s)).alias("_n"))
    return per_word.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.sum("_n").alias("n_subwords")
    )
