"""Text analysis operators: tokenization, counting, language id, quality,
fingerprinting.

All pure column expressions (whole-stage codegen, no Python in the hot
path).  The deterministic hash pieces use universal hashing over a token
dictionary (`token_dictionary`) so results are engine-independent and
oracle-checkable; the scale path swaps the dictionary join for xxhash64
(`hash_mode='xxhash'`) with identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Universal-hash constants: h_i(x) = (A_i * x + B_i) mod P.  P prime; A,B
# derived from small odd multipliers so (A*x+B) stays < 2^62 for x < 2^40.
HASH_P = 1_000_003


def hash_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) pair for the i-th universal hash function."""
    return (2 * i + 3) * 2_654_435_761 % HASH_P or 1, (i * 40_503 + 17) % HASH_P


TOKEN_SPLIT = " "  # corpus text is space-delimited; swap for \W+ regex corpora


def tokens_col(text_col: str = "text"):
    """Array-of-tokens column expression (empty tokens removed)."""
    return F.filter(F.split(F.col(text_col), TOKEN_SPLIT), lambda t: t != "")


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, n_tokens, n_chars] — whitespace token count + char count."""
    return docs.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / single punctuation —
# the GPT-2-family pre-split shape (each match is what a BPE merge table
# would then subdivide).  Pure regex ⇒ JVM-side AND SQL-reproducible.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_count(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_subwords, n_alpha_runs, n_digit_runs, n_punct] — BPE-ish
    pre-token counts (a cheap proxy for LLM token budgeting: alpha runs
    average ~1.3 BPE tokens each, digits/punct ~1).  regexp_extract_all
    stays in whole-stage codegen; no Python."""
    # F.lit keeps the pattern out of SQL string-literal escaping ('\s'
    # inside F.expr quotes would collapse to 's')
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), F.lit(0))
    alpha = F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
    digit = F.filter(toks, lambda t: t.rlike("^[0-9]+$"))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_subwords"),
        F.size(alpha).alias("n_alpha_runs"),
        F.size(digit).alias("n_digit_runs"),
        (F.size(toks) - F.size(alpha) - F.size(digit)).alias("n_punct"),
    )


# -- language id ---------------------------------------------------------------

# Marker-token sets per language (tiny stopword lists — the classic n-gram /
# stopword-ratio heuristic).  Scores are marker-hit ratios; argmax wins,
# ties broken by language code; below `min_ratio` → 'und'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "de", "que", "los", "las", "una", "es"),
    "de": ("der", "die", "und", "das", "ein", "ist", "nicht"),
}


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = 0.01,
) -> DataFrame:
    """[id, lang_pred, lang_score] stopword-ratio language classifier.

    score(lang) = |tokens ∩ markers(lang)| / |tokens|; predicted language is
    the argmax (ties → lexicographically smallest code), or 'und' when the
    best ratio is below `min_ratio`.  One pass, no shuffle: per-row array
    expressions only.
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    scores = [
        (
            F.when(n > 0, F.size(F.filter(toks, lambda t: t.isin(*m))) / n).otherwise(F.lit(0.0))
        ).alias(f"score_{lang}")
        for lang, m in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select(F.col(id_col), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lg}") == best, F.lit(lg)) for lg in langs]
    )  # first (lexicographic) argmax wins
    return scored.select(
        F.col(id_col),
        F.when(best >= min_ratio, pred).otherwise(F.lit("und")).alias("lang_pred"),
        F.round(best, 6).alias("lang_score"),
    )


# -- quality scoring -----------------------------------------------------------


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_tokens, mean_token_len, stopword_ratio, alpha_ratio, quality].

    Heuristic quality in [0,1]: length band + mean-word-length band +
    stopword presence + alphabetic ratio — the standard cheap pre-filter
    ahead of model-based scoring.  Pure column expressions.
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    stop_ratio = F.when(n > 0, F.size(F.filter(toks, lambda t: t.isin(*all_markers))) / n).otherwise(F.lit(0.0))
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    )
    mean_len = F.when(
        n > 0, (F.length(text_col) - (n - 1)) / n  # total chars minus separators
    ).otherwise(F.lit(0.0))
    quality = (
        F.when((n >= 10) & (n <= 100_000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(alpha_ratio >= 0.5, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        quality.alias("quality"),
    )


# -- token dictionary + fingerprint -------------------------------------------


def token_dictionary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """[tok, tid] dense ids by lexicographic rank over the corpus vocabulary.

    Engine-independent (no hash seeds), so DuckDB/any SQL engine derives the
    identical mapping — the oracle-parity mode for MinHash/SimHash/fingerprints.
    Vocabulary is Zipf-bounded (≪ corpus size), so the dense_rank sort is
    cheap relative to the corpus scan; the scale path replaces tid with
    xxhash64(tok) and skips this entirely.
    """
    from neo4j_graph_algorithms_spark.functions.rank import dense_ids

    toks = docs.select(F.explode(tokens_col(text_col)).alias("tok")).distinct()
    # distributed two-phase ranking — no single-partition global window
    # (1-based to match SQL dense_rank)
    return dense_ids(toks, "tok", start=1).select("tok", F.col("_rk").alias("tid"))


def doc_tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", with_pos: bool = False
) -> DataFrame:
    """Exploded [id, tok] (+pos) rows."""
    if with_pos:
        return docs.select(
            F.col(id_col), F.posexplode(tokens_col(text_col)).alias("pos", "tok")
        )
    return docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))


def fingerprint(
    docs: DataFrame,
    dictionary: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, fingerprint] order-sensitive rolling polynomial hash.

    fp = fold(tokens, acc = (acc * 31 + tid) mod P).  With a dictionary the
    value is engine-independent; without one, tid = xxhash64(tok) (scale
    mode).  Computed per-row via F.aggregate after collecting tids back
    into document order — one explode + one shuffle by (id, pos).
    """
    per_tok = doc_tokens(docs, id_col, text_col, with_pos=True)
    if dictionary is not None:
        per_tok = per_tok.join(dictionary, on="tok")
    else:
        per_tok = per_tok.withColumn("tid", F.pmod(F.xxhash64("tok"), F.lit(HASH_P)))
    seq = per_tok.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("seq")
    )
    fp = F.aggregate(
        F.col("seq"),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x["tid"]) % HASH_P,
    )
    return seq.select(F.col(id_col), fp.alias("fingerprint"))


# -- Relevance scoring ---------------------------------------------------------


def tf_idf(
    docs: DataFrame,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, tok, tf, score] — top-k TF-IDF terms per document.

    score = tf * (ln((1 + N) / (1 + df)) + 1) (the smooth-idf variant),
    rounded to 6 decimals; ranking by (rounded score DESC, tok ASC) so ties
    are engine-independent.  Plan shape at 10^12 rows: one explode + one
    (id, tok) aggregation for tf; df is an aggregate of the Zipf-bounded
    vocabulary and joins back as a BROADCAST (vocab ≪ corpus); the top-k
    window partitions by document — never a global sort.  N is a single
    scalar aggregate job.
    """
    from pyspark.sql import Window

    tf = doc_tokens(docs, id_col, text_col).groupBy(id_col, "tok").agg(
        F.count("*").alias("tf")
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.select(id_col).distinct().count()
    scored = tf.join(F.broadcast(dfreq), on="tok").withColumn(
        "score",
        F.round(
            F.col("tf") * (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0), 6
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= top_k)
        .select(id_col, "tok", "tf", "score")
    )


def bm25(
    docs: DataFrame,
    query: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, score, matched] — Okapi BM25 of `query` against every document
    containing at least one query term.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), rounded to 6 decimals.
    avgdl is computed as an exact integer ratio (Σ dl / N) so the scalar is
    bit-identical across engines.  Plan shape: the tf aggregation is
    FILTERED to the query terms before the shuffle (the corpus-sized
    explode never aggregates non-query tokens); df/N/avgdl are scalar-sized
    aggregates; no window, no global sort.
    """
    if not query:
        raise ValueError("query must contain at least one term")
    toks = doc_tokens(docs, id_col, text_col)
    dl = docs.select(F.col(id_col), F.size(tokens_col(text_col)).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["total"] / stats["n"]
    qtoks = toks.filter(F.col("tok").isin(list(query)))
    tf = qtoks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # dl joins in per-document (broadcast-ineligible at scale: dl is
    # corpus-sized — but the join key is the same (id) the tf aggregation
    # just shuffled on, so AQE plans it without an extra exchange)
    return (
        tf.join(F.broadcast(dfreq), on="tok")
        .join(dl, on=id_col)
        .withColumn(
            "c",
            F.log(1.0 + (n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("c"), 6).alias("score"),
            F.count("*").alias("matched"),
        )
    )


def _all_grams(text_col: str, n: int):
    """Array column of ALL word n-grams (with multiplicity, in order)."""
    toks = tokens_col(text_col)
    if n <= 1:
        return toks
    # guard: Spark's sequence(0, stop) DESCENDS when stop < 0, so short docs
    # must short-circuit to an empty array (same shape as dedup._shingle_sets)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_grams, n_distinct, rep_ratio] — within-document duplicate
    n-gram fraction, the standard repetition/boilerplate quality signal
    (Rae et al., Gopher, arXiv:2112.11446 §A1.1: "repetition" filters).

    rep_ratio = 1 − distinct/total over word n-grams (0 for docs shorter
    than n tokens).  Pure column expressions — the gram array never
    explodes, so the operator is a single scan with whole-stage codegen,
    no shuffle at all.
    """
    grams = _all_grams(text_col, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return docs.select(
        F.col(id_col),
        total.alias("n_grams"),
        distinct.alias("n_distinct"),
        F.round(
            F.when(total > 0, 1.0 - distinct / total).otherwise(F.lit(0.0)), 6
        ).alias("rep_ratio"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    n: int = 3,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_mod: int = 97,
) -> DataFrame:
    """[id, n_grams, n_hit, overlap, contaminated] — benchmark-overlap
    decontamination (the GPT-3/PaLM-style n-gram collision filter,
    arXiv:2005.14165 §C): a training document whose distinct word n-grams
    overlap an evaluation set beyond `threshold` is flagged for removal.

    `eval_docs`: the held-out benchmark table; when None, the deterministic
    sample doc_id % eval_mod == 0 of `docs` stands in (self-contained gate
    fixture) and those rows are excluded from the scored output.

    Scale shape: the eval set is benchmark-sized (MBs — tiny next to a
    100 TB corpus), so its distinct-gram set is the one legitimately
    BROADCAST dimension in this module; the corpus-side gram explode
    aggregates per (doc, gram) distinct before the join, and the overlap
    ratio is a per-doc aggregation on the same key.
    """
    from neo4j_graph_algorithms_spark.pipeline.dedup import _shingle_sets

    if eval_docs is None:
        eval_docs = docs.filter((F.col(id_col) % eval_mod) == 0)
        scored = docs.filter((F.col(id_col) % eval_mod) != 0)
    else:
        scored = docs
    ev_grams = (
        _shingle_sets(eval_docs, n, id_col, text_col).select("tok").distinct()
    )
    gd = _shingle_sets(scored, n, id_col, text_col)
    hits = (
        gd.join(
            F.broadcast(ev_grams.withColumn("_hit", F.lit(1))),
            on="tok",
            how="left",
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_hit").alias("n_hit"),
        )
    )
    return hits.select(
        F.col(id_col),
        "n_grams",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("overlap"),
        (F.col("n_hit") / F.col("n_grams") >= threshold).alias("contaminated"),
    )


# PII scrub patterns — RE2-compatible (DuckDB) AND java.util.regex-compatible
# (Spark) subset: no backrefs, no lookaround.  Order matters: emails first
# (their local part can contain digits), then IPv4 (dotted digits would
# otherwise match the phone pattern), then phones on the already-scrubbed
# text.  Counts are taken stage-by-stage on the CURRENT text so a token is
# never double-counted.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, text_clean, n_email, n_ipv4, n_phone] — regex PII redaction
    (emails → <EMAIL>, IPv4 → <IP>, phone-like runs → <PHONE>), the standard
    pre-training scrub pass (e.g. BigScience ROOTS pipeline,
    arXiv:2303.03915 §3).  Pure column expressions — regexp_count /
    regexp_replace run JVM-side in whole-stage codegen; a 100 TB corpus
    scrub is a single scan with zero shuffle.
    """
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ipv4 = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        t3.alias("text_clean"),
        n_email.alias("n_email"),
        n_ipv4.alias("n_ipv4"),
        n_phone.alias("n_phone"),
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_tokens, avg_logp] — mean unigram log-probability of each
    document under the corpus's own MLE unigram model (the model-free
    stand-in for the CCNet/LLaMA LM-perplexity quality filter: documents
    whose tokens are corpus-typical score high, gibberish scores low).

    p(tok) = count(tok)/total over the whole corpus — no smoothing needed
    because every scored token is, by construction, in the model.  Rounded
    to 6 decimals (the repo's float-parity convention; ln at 6dp is
    engine-stable, same as tf_idf's idf).

    Plan shape at 10^12 rows: one explode + one (tok) aggregation for the
    model (Zipf-bounded vocabulary, joins back as a BROADCAST like tf_idf's
    df), one (id) aggregation for the scores.  Empty documents are dropped
    (no tokens to score).
    """
    toks = docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
    total = toks.count()
    model = toks.groupBy("tok").agg(F.count("*").alias("_cnt"))
    return (
        toks.join(F.broadcast(model), on="tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("_cnt") / F.lit(float(total)))), 6
            ).alias("avg_logp"),
        )
    )


def length_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """One-row exact token-length distribution —
    [n_docs, min_tokens, max_tokens, sum_tokens, p<q>_tokens ...].

    The packing-budget audit (sequence packing and curriculum binning are
    sized from exactly this table) — the documents-side twin of
    operators/degrees.py:degree_distribution, same integer-exact discrete
    percentile rule: p(q) = min length whose cumulative doc count satisfies
    100·cum ≥ n·q, computed on the LENGTH HISTOGRAM (|distinct lengths|
    rows), never a |corpus|-sized window.  All outputs BIGINT.
    """
    from pyspark.sql import Window

    lens = docs.select(F.size(tokens_col(text_col)).alias("n"))
    hist = lens.groupBy("n").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select("n", "cnt", F.sum("cnt").over(w).alias("cum"))
    totals = hist.agg(
        F.sum("cnt").alias("n_docs"),
        F.min("n").alias("min_tokens"),
        F.max("n").alias("max_tokens"),
        F.sum(F.col("n") * F.col("cnt")).alias("sum_tokens"),
    )
    pct_aggs = [
        F.min(
            F.when(F.col("cum") * 100 >= F.col("n_docs") * q, F.col("n"))
        ).alias(f"p{q}_tokens")
        for q in percentiles
    ]
    pcts = cum.crossJoin(F.broadcast(totals)).agg(*pct_aggs)
    return totals.crossJoin(F.broadcast(pcts)).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("min_tokens").cast("long").alias("min_tokens"),
        F.col("max_tokens").cast("long").alias("max_tokens"),
        F.col("sum_tokens").cast("long").alias("sum_tokens"),
        *[F.col(f"p{q}_tokens").cast("long").alias(f"p{q}_tokens") for q in percentiles],
    )


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 120,
    overlap: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, chunk_id, chunk_start, chunk_text] — fixed-size sliding-window
    character chunking with overlap, the retrieval/embedding prep step
    (every RAG / long-context pipeline shards documents exactly this way
    before embedding them).

    Contract (pinned for cross-engine exactness): chunks start at
    0, stride, 2·stride, ... with stride = chunk_chars − overlap;
    n_chunks = max(1, ceil((len − overlap) / stride)) so the final chunk
    is the first one whose window covers the document tail (short docs get
    exactly one chunk).  chunk_start is 0-based; chunk_text is the
    chunk_chars-wide substring (shorter at the tail).  Pure column
    expressions — a bounded explode (len/stride rows per doc) that
    pipelines into the feeding scan with zero shuffle at any corpus size.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    n = F.length(F.col(text_col))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    return docs.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_i"),
    ).select(
        F.col(id_col),
        F.col("chunk_id"),
        (F.col("_i") * stride).alias("chunk_start"),
        F.substring(
            F.col(text_col), F.col("_i") * stride + 1, chunk_chars
        ).alias("chunk_text"),
    )


def top_ngrams(
    docs: DataFrame, n: int = 2, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """[ngram, n_count, rank] — the corpus's k most frequent word n-grams
    (count desc, ngram asc on ties) — the boilerplate-discovery /
    stop-phrase audit every dedup-threshold tuning session starts from.

    Scale shape: explode + one (ngram) count with map-side combine over a
    Zipf-bounded gram table, then orderBy+limit — which Spark executes as
    TakeOrderedAndProject (per-partition top-k heaps merged at the driver,
    never a global sort); the rank window runs over the k survivors only.
    """
    grams = docs.select(F.explode(_all_grams(text_col, n)).alias("ngram"))
    counts = grams.groupBy("ngram").agg(F.count("*").alias("n_count"))
    topk = counts.orderBy(F.desc("n_count"), F.asc("ngram")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_count"), F.asc("ngram"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "ngram", "n_count", "rank"
    )


def source_mix(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """[source, lang, n_docs, total_chars, total_tokens] — the corpus
    composition audit: what every curation run measures FIRST, and the
    observed-mixture input to `pipeline/sample.py` mixture resampling
    (target weights are chosen against exactly this table).  Pure integer
    aggregation — one map-side-combined groupBy, trivially exact.
    """
    return docs.groupBy(source_col, lang_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(F.size(tokens_col("text"))).alias("total_tokens"),
    )


def token_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_tokens, n_distinct, entropy] — Shannon entropy (nats) of each
    document's within-doc token distribution: H = -sum_t p_t ln p_t with
    p_t = count_t / n_tokens.  The classic gibberish/boilerplate filter
    (near-zero entropy = one token repeated; ln(n_distinct) = all distinct)
    sitting between quality_score's bands and the LM log-prob gates.

    Exactness contract: each term -(c/n)ln(c/n) is an identical double in
    every engine (exact BIGINT ratio through ln), rounded to the 1e-6 grid
    FIRST, scaled to long, summed exactly — the family's shard-order-free
    rule.  Zero-token documents are dropped.

    Plan shape: one token explode, one (id, token) count, one (id)
    aggregation — all map-side combined, no joins.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
    per = toks.groupBy(id_col, "tok").agg(F.count("*").alias("_c"))
    totals = per.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"), F.count("*").alias("n_distinct")
    )
    p = F.col("_c").cast("double") / F.col("n_tokens").cast("double")
    term6 = F.round(-(p * F.log(p)), 6)
    scaled = F.round(term6 * F.lit(1e6)).cast("long")
    return (
        per.join(totals, on=id_col)
        .groupBy(id_col, "n_tokens", "n_distinct")
        .agg(F.round(F.sum(scaled) / F.lit(1e6), 6).alias("entropy"))
        .select(id_col, "n_tokens", "n_distinct", "entropy")
    )


def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_words, n_sentences, n_syllables, flesch] — Flesch Reading
    Ease (Flesch 1948): 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words).  The classic readability member of the
    quality-filter family (quality_score's bands are length/charset;
    this scores sentence and word complexity).

    Heuristics, engine-replayable: syllables per word = count of vowel
    RUNS [aeiouy]+ in the lowercased token, floored at 1; sentences =
    count of terminal-punctuation runs [.!?]+, floored at 1 (corpora
    without punctuation degrade to one sentence per document — documented,
    not hidden).  All three counts are exact integers; the formula is one
    fixed left-associated double expression mirrored in the oracle.
    Documents with zero tokens are dropped.  Pure column expressions —
    no explode, no joins.
    """
    toks = tokens_col(text_col)
    syl = F.aggregate(
        F.transform(
            toks,
            lambda t: F.greatest(
                F.lit(1), F.regexp_count(F.lower(t), F.lit("[aeiouy]+"))
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sents = F.greatest(
        F.lit(1), F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
    )
    out = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        sents.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).filter(F.col("n_words") >= 1)
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    return out.withColumn(
        "flesch",
        F.round(
            F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w), 6
        ),
    )


def trigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """[id, n_trigrams, avg_logp] — mean log-probability of each document
    under a Jelinek-Mercer interpolated trigram model trained on the corpus
    itself: p(w3|w1w2) = l3*MLE3 + l2*MLE2 + l1*MLE1 (deleted interpolation
    with fixed weights; Jelinek & Mercer 1980).  The order-3 member of the
    unigram/bigram perplexity-filter family — interpolation makes every
    term nonzero even where the raw trigram MLE would be the only mass, so
    the score separates fluent text from ngram-salad far better than MLE3
    alone, and the fixed lambdas keep it engine-replayable (no EM fit).

    Per-order counts come from that order's own gram stream (the standard
    deleted-interpolation convention): MLE3 = c3(w1w2w3)/c3h(w1w2),
    MLE2 = c2(w2w3)/c2h(w2), MLE1 = c1(w3)/N.  Every lookup is total by
    construction (the scored doc contributed its own grams to each model).
    Documents with < 3 tokens are dropped.

    Exactness contract (same as bigram_logprob): all three MLEs are exact
    BIGINT ratios evaluated identically in any engine; the interpolation
    l3*p3 + l2*p2 + l1*p1 is a fixed left-associated double expression;
    each ln term is rounded to the 1e-6 grid FIRST, scaled to long, summed
    exactly, divided once.

    Plan shape at 10^12 rows: one trigram explode + three Zipf-bounded
    model aggregations broadcast back (like tf_idf's df) + one scalar N —
    then one (id) aggregation.  No joins between large frames.
    """
    l3, l2, l1 = lambdas
    tri = docs.select(
        F.col(id_col), F.explode(_all_grams(text_col, 3)).alias("g3")
    )
    parts = F.split(F.col("g3"), " ", 3)
    c3 = tri.groupBy("g3").agg(F.count("*").alias("_c3"))
    h3 = (
        c3.groupBy(
            F.concat_ws(
                " ", F.split(F.col("g3"), " ", 3).getItem(0),
                F.split(F.col("g3"), " ", 3).getItem(1),
            ).alias("_h3")
        ).agg(F.sum("_c3").alias("_ch3"))
    )
    bi = docs.select(F.explode(_all_grams(text_col, 2)).alias("g2"))
    c2 = bi.groupBy("g2").agg(F.count("*").alias("_c2"))
    h2 = c2.groupBy(
        F.split(F.col("g2"), " ", 2).getItem(0).alias("_h2")
    ).agg(F.sum("_c2").alias("_ch2"))
    uni = docs.select(F.explode(tokens_col(text_col)).alias("tok"))
    c1 = uni.groupBy("tok").agg(F.count("*").alias("_c1"))
    n_total = uni.agg(F.count("*").alias("_n"))
    p3 = F.col("_c3").cast("double") / F.col("_ch3").cast("double")
    p2 = F.col("_c2").cast("double") / F.col("_ch2").cast("double")
    p1 = F.col("_c1").cast("double") / F.col("_n").cast("double")
    logp6 = F.round(
        F.log(F.lit(l3) * p3 + F.lit(l2) * p2 + F.lit(l1) * p1), 6
    )
    scaled = F.round(logp6 * F.lit(1e6)).cast("long")
    return (
        tri.join(F.broadcast(c3), on="g3")
        .join(
            F.broadcast(h3),
            F.concat_ws(" ", parts.getItem(0), parts.getItem(1))
            == F.col("_h3"),
        )
        .join(
            F.broadcast(c2),
            F.concat_ws(" ", parts.getItem(1), parts.getItem(2))
            == F.col("g2"),
        )
        .join(F.broadcast(h2), parts.getItem(1) == F.col("_h2"))
        .join(F.broadcast(c1), parts.getItem(2) == F.col("tok"))
        .crossJoin(F.broadcast(n_total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(
                F.sum(scaled) / (F.count("*") * F.lit(1e6)), 6
            ).alias("avg_logp"),
        )
    )


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, n_bigrams, avg_logp] — mean bigram log-probability of each
    document under the corpus's own MLE bigram model: the order-2 upgrade
    of `unigram_logprob` (the CCNet/LLaMA perplexity-filter stand-in that
    also catches scrambled-word-order gibberish unigrams cannot).

    p(w₂|w₁) = count(w₁w₂) / count(w₁ as a bigram head) — MLE without
    smoothing is total because every scored bigram is, by construction, in
    the model.  Documents with < 2 tokens are dropped (nothing to score).

    Exactness contract (stronger than unigram_logprob's avg-then-round):
    each ln term is rounded to the 1e-6 grid FIRST, scaled to long, summed
    exactly, then divided — so the per-doc mean is shard-order and
    partitioning independent (the sessionize/FastRP integer-sum rule).

    Plan shape at 10^12 rows: one gram explode + one (gram) count for the
    model and one (head) count for the denominators — both Zipf-bounded
    and BROADCAST back (like tf_idf's df) — then one (id) aggregation.
    """
    grams = docs.select(
        F.col(id_col), F.explode(_all_grams(text_col, 2)).alias("gram")
    )
    bi = grams.groupBy("gram").agg(F.count("*").alias("_c2"))
    heads = bi.groupBy(
        F.split(F.col("gram"), " ", 2).getItem(0).alias("_head")
    ).agg(F.sum("_c2").alias("_c1"))
    logp6 = F.round(
        F.log(F.col("_c2").cast("double") / F.col("_c1").cast("double")), 6
    )
    scaled = F.round(logp6 * F.lit(1e6)).cast("long")
    return (
        grams.join(F.broadcast(bi), on="gram")
        .join(
            F.broadcast(heads),
            F.split(F.col("gram"), " ", 2).getItem(0) == F.col("_head"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(scaled) / (F.count("*") * F.lit(1e6)), 6
            ).alias("avg_logp"),
        )
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    per_head_k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """[x, y, c_xy, c_x, c_y, lift_q6, rank] — the corpus's collocations:
    for each head token x, the `per_head_k` adjacent-pair partners y with
    the highest association lift c_xy·N / (c_x·c_y) (the exp of PMI under
    bigram-position marginals), among pairs seen ≥ `min_count` times.
    The boilerplate/entity-phrase discovery pass a corpus audit runs
    before tuning dedup and quality thresholds.

    Exactness contract: lift_q6 = floor(10⁶·c_xy·N / (c_x·c_y)) in
    DECIMAL(38,0) arithmetic with integral division (Spark `div` ==
    DuckDB `//` for positive operands — twin: oracles.collocations_sql),
    so every score and rank is engine- and re-shard-invariant.  Marginals
    are bigram-POSITION counts (c_x = Σ_y c_xy, c_y = Σ_x c_xy), so the
    three aggregates share one bigram-count frame.

    Scale shape: one pair explode + one (x,y) count with map-side
    combine; the marginals re-aggregate the Zipf-bounded bigram-count
    frame (not the corpus); N is a 1-row broadcast.  The rank window
    partitions by head token — bounded per-group work, never a global
    sort.  min_count prunes the long tail BEFORE the marginal joins.
    """
    toks = tokens_col(text_col)
    # adjacent pairs via slice-zip: sequence(1, 0) DESCENDS on short docs
    # (repo trap list), so guard to an empty array explicitly
    from pyspark.sql import Window

    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda x, y: F.struct(x.alias("x"), y.alias("y")),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    g = docs.select(F.explode(pairs).alias("p")).select("p.x", "p.y")
    cxy = g.groupBy("x", "y").agg(F.count("*").alias("c_xy"))
    cxy = cxy.localCheckpoint(eager=True)  # reused by 3 aggregates + join
    heads = cxy.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    tails = cxy.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = cxy.agg(F.sum("c_xy").alias("_n"))
    scored = (
        cxy.filter(F.col("c_xy") >= min_count)
        .join(heads.hint("shuffle_hash"), on="x")
        .join(tails.hint("shuffle_hash"), on="y")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "lift_q6",
            F.expr(
                "CAST(CAST(c_xy AS DECIMAL(38,0)) * _n * 1000000"
                " div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("x").orderBy(F.desc("lift_q6"), F.asc("y"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_head_k)
        .select("x", "y", "c_xy", "c_x", "c_y", "lift_q6", "rank")
    )


def zipf_alpha(docs: DataFrame, fmin: int = 2, text_col: str = "text") -> DataFrame:
    """[fmin, n_tail, alpha_q6, sigma_q6] — maximum-likelihood Zipf/power-law
    exponent of the corpus token-frequency distribution (the same
    Clauset-Shalizi-Newman discrete approximation as
    operators/degrees.py:degree_powerlaw, applied to term frequencies):

        alpha = 1 + n / Σ ln(f_t / (fmin − ½)),  over tokens with f_t ≥ fmin.

    The corpus-health audit behind every vocabulary decision in this module:
    natural-language corpora sit near alpha ≈ 2 (Zipf's law); a much flatter
    tail (alpha → 1) signals boilerplate/spam flooding, a much steeper one
    signals truncated or synthetic text.  BPE merge counts, token_dictionary
    size, and unigram-LM smoothing all assume the Zipf regime.

    Exactness: identical 1e-6-grid contract — per DISTINCT frequency f the
    term round(10⁶·ln(f/(fmin−½)))·count_f is a BIGINT, so the cross-engine
    sum is order-independent; alpha/sigma are one double expression over
    identical integers, mirrored textually in the DuckDB twin.

    Scale shape: token explode → frequency table (vocabulary-sized) →
    frequency-of-frequencies histogram (a few hundred rows even at web
    scale) → keyless aggregate.  Nothing past the first groupBy is
    corpus-sized.
    """
    freq = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )
    hist = (
        freq.filter(F.col("f") >= fmin)
        .groupBy("f")
        .agg(F.count("*").alias("cnt"))
    )
    term = (
        F.round(F.log(F.col("f") / (fmin - 0.5)) * 1_000_000.0, 0).cast("long")
        * F.col("cnt")
    )
    agg = hist.agg(F.sum("cnt").alias("n_tail"), F.sum(term).alias("s_q6"))
    n, s = F.col("n_tail"), F.col("s_q6")
    alpha = F.lit(1.0) + n * F.lit(1_000_000.0) / s
    return agg.select(
        F.lit(fmin).cast("long").alias("fmin"),
        n.cast("long").alias("n_tail"),
        F.round(alpha, 6).alias("alpha_q6"),
        F.round((alpha - F.lit(1.0)) / F.sqrt(n), 6).alias("sigma_q6"),
    )


#: winnowing packs (kgram_hash, position) into one BIGINT so a single
#: integer window-min yields "min hash, rightmost position" — the robust
#: tie-break — identically in any engine.  kh < HASH_P < 2^20 and
#: pos < WINNOW_POS_CAP = 2^20, so packed < 2^40.
WINNOW_POS_CAP = 1 << 20


def winnow_fingerprints(
    docs: DataFrame,
    dictionary: DataFrame | None = None,
    k: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[doc_id, pos, gram_hash] — MOSS winnowing fingerprints (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003), THE code-corpus partial-overlap
    fingerprint: from every window of `window` consecutive k-gram hashes
    keep the minimum (rightmost on ties — robust winnowing), so any shared
    token run of length >= window + k - 1 between two documents shares at
    least one selected fingerprint, while ~2/(window+1) of k-grams are kept.

    Complements `fingerprint` (whole-document rolling hash: equality only)
    with the local-match index that catches partial file copies, vendored
    snippets, and license boilerplate in a source-code corpus.

    Cross-engine determinism: k-gram hash = the same rolling polynomial as
    `fingerprint` over dictionary tids (oracle mode) or xxhash64 buckets
    (scale mode); the rightmost-min window pick is ONE integer min over
    packed (kh * 2^20 + (2^20-1-pos)) values — no tie-break logic to drift.
    Positions are capped at 2^20 tokens/doc (docs beyond the cap contribute
    no fingerprints past it — pair with length_stats/chunking upstream).

    Plan: explode + one (doc, pos) shuffle; k-1 lead() columns build the
    rolling hash inside one window pass; the winnow itself is a frame min —
    no self-joins, no arrays, linear in corpus tokens.
    """
    from pyspark.sql import Window

    if k < 1 or window < 1:
        raise ValueError(f"need k >= 1 and window >= 1, got k={k} window={window}")
    per_tok = doc_tokens(docs, id_col, text_col, with_pos=True).filter(
        F.col("pos") < WINNOW_POS_CAP
    )
    if dictionary is not None:
        per_tok = per_tok.join(dictionary, on="tok")
    else:
        per_tok = per_tok.withColumn("tid", F.pmod(F.xxhash64("tok"), F.lit(HASH_P)))

    w_ord = Window.partitionBy(id_col).orderBy("pos")
    kh = F.col("tid")
    for j in range(1, k):
        kh = (kh * 31 + F.lead("tid", j).over(w_ord)) % HASH_P
    kg = (
        per_tok.select(id_col, "pos", kh.alias("_kh"))
        .filter(F.col("_kh").isNotNull())  # trailing pos without a full k-gram
    )

    w_kg = Window.partitionBy(id_col).orderBy("pos")
    frame = w_kg.rowsBetween(0, window - 1)
    packed = F.col("_kh") * WINNOW_POS_CAP + (WINNOW_POS_CAP - 1 - F.col("pos"))
    sel = (
        kg.select(
            id_col,
            F.min(packed).over(frame).alias("_mp"),
            F.lead("_kh", window - 1).over(w_kg).alias("_full"),
        )
        .filter(F.col("_full").isNotNull())  # only full windows select
        .select(id_col, "_mp")
        .distinct()
    )
    return sel.select(
        id_col,
        (F.lit(WINNOW_POS_CAP - 1) - F.col("_mp") % WINNOW_POS_CAP).alias("pos"),
        F.shiftright(F.col("_mp"), 20).alias("gram_hash"),
    )
