"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale story (the part that matters at 10^12 rows):
  * exact dedup groups on sha2(text) — 32-byte keys shuffle, never the text;
  * near-dup NEVER does an all-pairs join: candidates come from LSH band
    buckets (MinHash) or pigeonhole blocks (SimHash), each a hash-key
    equi-join whose fan-out is bounded by bucket size, then candidates are
    verified with the exact measure.  `*_pairs` brute-force variants exist
    as small-scale baselines/oracles only.
  * hash_mode='dict' uses universal hashing over the lexicographic token
    dictionary (engine-independent → DuckDB-oracle-checkable);
    hash_mode='xxhash' skips the dictionary join for production scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.pipeline.text import (
    HASH_P,
    doc_tokens,
    hash_params,
    token_dictionary,
    tokens_col,
)

# -- exact --------------------------------------------------------------------


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[id, canonical_id, is_duplicate] by full-content hash.

    canonical_id = min id among rows sharing sha2(text, 256).  Shuffles
    (hash, id) pairs only — content never moves.
    """
    hashed = docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("h"))
    canon = hashed.groupBy("h").agg(F.min(id_col).alias("canonical_id"))
    return (
        hashed.join(canon, on="h")
        .select(
            F.col(id_col),
            "canonical_id",
            (F.col(id_col) != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


# -- token / n-gram sets -------------------------------------------------------


def _shingle_sets(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Exploded distinct [id, shingle] rows; n=1 → tokens, n>1 → word n-grams."""
    if n <= 1:
        return doc_tokens(docs, id_col, text_col).distinct()
    toks = tokens_col(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col), F.explode(grams).alias("tok")).distinct()


def _verify_jaccard(
    candidates: DataFrame, shingles: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard over candidate (a,b) pairs via shingle-count join.

    |A∩B| from a shared-shingle equi-join restricted to candidate pairs;
    |A∪B| = |A|+|B|−|A∩B|.  Candidate sets are LSH-bounded, so the join
    fan-out is bucket-sized, not corpus-sized.
    """
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("sz"))
    sa = shingles.select(F.col(id_col).alias("a"), "tok")
    sb = shingles.select(F.col(id_col).alias("b"), "tok")
    inter = (
        sa.join(sb, on="tok")
        .join(candidates, on=["a", "b"], how="left_semi")
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), on="a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), on="b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[a, b, jaccard] all pairs (a<b) with n-gram Jaccard ≥ threshold.

    Brute-force baseline: the shared-shingle join enumerates every
    intersecting pair.  Use `minhash_lsh_dedup` at scale.
    """
    sh = _shingle_sets(docs, n, id_col, text_col)
    pairs = (
        sh.select(F.col(id_col).alias("a"), "tok")
        .join(sh.select(F.col(id_col).alias("b"), "tok"), on="tok")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return _verify_jaccard(pairs, sh, id_col, threshold)


# -- MinHash + LSH -------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 128,
    ngram: int = 1,
    hash_mode: str = "xxhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """[id, mh_0..mh_{k-1}] MinHash signature columns.

    One explode + one groupBy computing all k minima as parallel agg
    expressions (single shuffle regardless of k).  h_i(shingle) =
    (A_i·sid + B_i) mod P over sid = dictionary tid ('dict') or
    xxhash64 ('xxhash').
    """
    sh = _shingle_sets(docs, ngram, id_col, text_col)
    if hash_mode == "dict":
        if dictionary is None:
            # shingle dictionary: dense lexicographic ids over the distinct
            # shingle vocabulary (engine-independent, oracle-checkable);
            # distributed two-phase ranking — never a global-sort window
            from neo4j_graph_algorithms_spark.functions.rank import dense_ids

            dictionary = dense_ids(
                sh.select("tok").distinct(), "tok", start=1
            ).select("tok", F.col("_rk").alias("tid"))
        sh = sh.join(dictionary, on="tok").withColumn("sid", F.col("tid"))
    elif hash_mode == "xxhash":
        sh = sh.withColumn("sid", F.pmod(F.xxhash64("tok"), F.lit(HASH_P)))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    aggs = []
    for i in range(num_hashes):
        a, b = hash_params(i)
        aggs.append(F.min((F.col("sid") * a + b) % HASH_P).alias(f"mh_{i}"))
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int, id_col: str = "doc_id"
) -> DataFrame:
    """[a, b] candidate pairs sharing ≥1 LSH band bucket (a<b).

    Band key = concat of the band's rows; per-band groupBy + self-join
    within bucket.  Union over bands, distinct.
    """
    mh_cols = [c for c in signatures.columns if c.startswith("mh_")]
    k = len(mh_cols)
    if k % bands != 0:
        raise ValueError(f"{k} hashes not divisible into {bands} bands")
    rows = k // bands
    per_band = None
    for bi in range(bands):
        cols = [f"mh_{bi * rows + r}" for r in range(rows)]
        keyed = signatures.select(
            F.col(id_col), F.concat_ws("_", F.lit(bi), *cols).alias("bucket")
        )
        pairs = (
            keyed.select(F.col(id_col).alias("a"), "bucket")
            .join(keyed.select(F.col(id_col).alias("b"), "bucket"), on="bucket")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        per_band = pairs if per_band is None else per_band.unionByName(pairs)
    return per_band.distinct()


def minhash_lsh_dedup(
    docs: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    ngram: int = 1,
    hash_mode: str = "xxhash",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[a, b, jaccard] near-duplicate pairs: LSH candidates verified by
    exact Jaccard ≥ threshold.  The standard shingle→minhash→band→
    bucket-join→verify pipeline; only bucket-mates are ever compared.
    """
    sigs = minhash_signatures(docs, num_hashes, ngram, hash_mode, id_col, text_col)
    cands = minhash_lsh_candidates(sigs, bands, id_col)
    sh = _shingle_sets(docs, ngram, id_col, text_col)
    return _verify_jaccard(cands, sh, id_col, threshold)


# -- SimHash -------------------------------------------------------------------


def simhash(
    docs: DataFrame,
    bits: int = 64,
    hash_mode: str = "xxhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """[id, simhash] Charikar fingerprint over distinct tokens.

    Bit j = sign of Σ_tokens (±1), where the ±1 is bit j of h_j(token)
    (independent universal hashes in 'dict' mode, xxhash64 bit j in
    'xxhash' mode).  One explode + one groupBy with `bits` sum-aggregates;
    the signed sums collapse to a single BIGINT column.
    """
    sh = doc_tokens(docs, id_col, text_col).distinct()
    if hash_mode == "dict":
        dictionary = dictionary if dictionary is not None else token_dictionary(docs, text_col)
        sh = sh.join(dictionary, on="tok")
        bit = lambda j: ((F.col("tid") * hash_params(j)[0] + hash_params(j)[1]) % HASH_P) % 2  # noqa: E731
    elif hash_mode == "xxhash":
        sh = sh.withColumn("h", F.xxhash64("tok"))
        bit = lambda j: F.shiftrightunsigned(F.col("h"), j).bitwiseAND(F.lit(1))  # noqa: E731
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    aggs = [
        F.sum(F.when(bit(j) == 1, 1).otherwise(-1)).alias(f"s_{j}") for j in range(bits)
    ]
    sums = sh.groupBy(id_col).agg(*aggs)
    fingerprint = None
    for j in range(bits):
        # bit weight built JVM-side: 2^63 does not fit py4j's Long.parseLong,
        # and shiftleft(1,63) correctly yields the BIGINT sign bit
        term = F.when(
            F.col(f"s_{j}") > 0, F.expr(f"shiftleft(CAST(1 AS BIGINT), {j})")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_dedup(
    docs: DataFrame,
    bits: int = 64,
    max_hamming: int = 3,
    hash_mode: str = "xxhash",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[a, b, hamming] pairs with simhash Hamming distance ≤ max_hamming.

    Pigeonhole LSH: split the fingerprint into (max_hamming+1) blocks — any
    pair within distance d shares at least one exact block.  Block-key
    equi-join generates candidates; XOR+bit_count verifies.  No all-pairs.
    """
    sigs = simhash(docs, bits, hash_mode, id_col, text_col)
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    per_block = None
    for bi in range(n_blocks):
        lo = bi * width
        w = width if bi < n_blocks - 1 else bits - lo
        block = F.shiftrightunsigned(F.col("simhash"), lo).bitwiseAND(F.lit((1 << w) - 1))
        keyed = sigs.select(
            F.col(id_col), F.col("simhash"), F.concat_ws("_", F.lit(bi), block).alias("bucket")
        )
        pairs = (
            keyed.select(F.col(id_col).alias("a"), F.col("simhash").alias("sh_a"), "bucket")
            .join(
                keyed.select(F.col(id_col).alias("b"), F.col("simhash").alias("sh_b"), "bucket"),
                on="bucket",
            )
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", "sh_a", "sh_b")
        )
        per_block = pairs if per_block is None else per_block.unionByName(pairs)
    return (
        per_block.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# -- Embedding-cosine near-dup -------------------------------------------------


def embedding_near_dedup(
    embs: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    exact: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id, rep_id, is_dup] embedding-cosine near-duplicate grouping.

    The last member of the dedup family: near-dup PAIRS come from the
    similarity tier (SRP-LSH band buckets + exact cosine verify at scale;
    brute-force all-pairs when ``exact=True`` as the small oracle), then
    groups are the connected components of the pair graph — computed by the
    engine's own pointer-jumped WCC (operators/wcc.py), so the grouping
    inherits its O(log n)-round, never-broadcast-state superstep plan.
    Representative = MIN id per component (the canonical-extremum label the
    reference's union-find family uses, impl/MSColoring.java:66-121);
    ``is_dup`` = 1 for every non-representative member.

    At 10^12 rows the candidate set stays band-bucket-bounded and the
    component loop is the same plan WCC runs on the link graph itself.
    """
    from neo4j_graph_algorithms_spark.graph import EdgeFrame
    from neo4j_graph_algorithms_spark.operators.wcc import wcc
    from neo4j_graph_algorithms_spark.pipeline.similarity import (
        cosine_pairs,
        srp_lsh_pairs,
    )

    spark = embs.sparkSession
    if exact:
        pairs = cosine_pairs(embs, threshold, id_col, vec_col)
    else:
        pairs = srp_lsh_pairs(embs, threshold, n_planes, bands, dim, seed, id_col, vec_col)
    edges = EdgeFrame(pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    res = wcc(spark, edges, vertices=embs.select(F.col(id_col).alias("vid")))
    return res.state.select(
        F.col("vid").alias(id_col),
        F.col("comp").alias("rep_id"),
        (F.col("vid") != F.col("comp")).cast("int").alias("is_dup"),
    )


def minhash_near_dup_groups(
    docs: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    ngram: int = 1,
    hash_mode: str = "xxhash",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, rep_id, is_dup] — MinHash near-duplicate GROUP assignment.

    The curation step after pair detection: verified near-dup pairs from
    `minhash_lsh_dedup` become edges, groups are the connected components
    of the pair graph (the engine's own pointer-jumped WCC,
    operators/wcc.py — O(log n) supersteps, state never broadcast), and the
    representative is the MIN id per component (the canonical-extremum
    convention of the reference's union-find family,
    /root/reference/algo/src/main/java/org/neo4j/graphalgo/impl/msbfs/ —
    see also impl MSColoring min-id propagation).  ``is_dup`` = 1 for every
    non-representative member; keeping rows with is_dup = 0 yields the
    deduplicated corpus.

    At 10^12 docs the pair set stays LSH-band-bounded and the component
    loop is the same superstep plan the link graph itself runs.
    """
    from neo4j_graph_algorithms_spark.graph import EdgeFrame
    from neo4j_graph_algorithms_spark.operators.wcc import wcc

    pairs = minhash_lsh_dedup(
        docs, num_hashes, bands, threshold, ngram, hash_mode, id_col, text_col
    )
    edges = EdgeFrame(pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    res = wcc(docs.sparkSession, edges, vertices=docs.select(F.col(id_col).alias("vid")))
    return res.state.select(
        F.col("vid").alias(id_col),
        F.col("comp").alias("rep_id"),
        (F.col("vid") != F.col("comp")).cast("int").alias("is_dup"),
    )


def semantic_dedup(
    embs: DataFrame,
    threshold: float = 0.8,
    n_centroids: int = 4,
    iterations: int = 2,
    quantize: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id, rep_id, is_dup] — SemDeDup-style semantic deduplication
    (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the embeddings
    (the IVF coarse quantizer, pipeline/similarity.ivf_build — deterministic
    init, so the clustering is reproducible), score cosine only WITHIN each
    cell, then group via the engine's pointer-jumped WCC with MIN-id
    representatives — identical group/rep conventions to
    `embedding_near_dedup` / `minhash_near_dup_groups`.

    vs `embedding_near_dedup`: SRP-LSH bounds candidates by hash-bucket
    collisions (recall depends on band geometry); SemDeDup bounds them by
    cluster membership (recall depends on cluster granularity), which is
    the published recipe for pruning semantically-redundant web data.

    Scale: pairs are cell-bounded (largest cell caps the self-join fan-out;
    pick n_centroids so cells stay ~10^4-10^5 at 10^12 rows, as the paper
    does with faiss), the k-means loop holds only k centroids on the
    driver, and the component loop is the same superstep plan the link
    graph runs.  `quantize` is the oracle-parity mode (same as ivf_build).
    """
    from neo4j_graph_algorithms_spark.graph import EdgeFrame
    from neo4j_graph_algorithms_spark.operators.wcc import wcc
    from neo4j_graph_algorithms_spark.pipeline.similarity import (
        _dot,
        ivf_build,
        with_norm,
    )

    spark = embs.sparkSession
    _, assign = ivf_build(embs, n_centroids, iterations, id_col, vec_col, quantize)
    e = with_norm(embs, vec_col).join(assign, on=id_col)
    a = e.select(
        F.col("cid"), F.col(id_col).alias("a"),
        F.col(vec_col).alias("_va"), F.col("_norm").alias("_na"),
    )
    b = e.select(
        F.col("cid"), F.col(id_col).alias("b"),
        F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb"),
    )
    pairs = (
        a.join(b, on="cid")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b")
    )
    edges = EdgeFrame(pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    res = wcc(spark, edges, vertices=embs.select(F.col(id_col).alias("vid")))
    return res.state.select(
        F.col("vid").alias(id_col),
        F.col("comp").alias("rep_id"),
        (F.col("vid") != F.col("comp")).cast("int").alias("is_dup"),
    )


def keep_best_in_groups(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    ngram: int = 3,
    hash_mode: str = "dict",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, rep_id, q4, keep] — canonical-document selection per near-dup
    group (the RefinedWeb/FineWeb curation convention: keep ONE document per
    duplicate cluster, and make it the best one, not the lowest-id one).

    Groups come from `minhash_near_dup_groups` (LSH-banded pairs → WCC);
    the winner per group maximizes the integer quality grade ``q4`` (the
    number of `quality_score` heuristics passed, 0-4 — an exact integer so
    Spark and the DuckDB twin can never disagree on a float boundary), ties
    broken by MIN id.  ``keep = 1`` marks the cluster representative;
    singleton groups keep their only member.

    Scale shape: the quality join is a hash join of two |corpus|-sized
    projections (never broadcast), and the per-group window is bounded by
    duplicate-cluster size — LSH band width caps candidate fan-out long
    before any cluster approaches partition scale.
    """
    from pyspark.sql import Window

    from neo4j_graph_algorithms_spark.pipeline.text import quality_score

    groups = minhash_near_dup_groups(
        docs, num_hashes, bands, threshold, ngram, hash_mode, id_col, text_col
    )
    # quality is a sum of 0.25 literals — *4 is exact in IEEE binary
    q4 = quality_score(docs, id_col, text_col).select(
        id_col, (F.col("quality") * 4).cast("int").alias("q4")
    )
    joined = groups.join(q4.hint("shuffle_hash"), on=id_col)
    w = Window.partitionBy("rep_id").orderBy(F.desc("q4"), F.asc(id_col))
    return joined.select(
        id_col,
        "rep_id",
        "q4",
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    )


def span_dedup(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, n_tokens, n_removed, clean_text] — exact duplicated-span removal
    (Lee et al., "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 §ExactSubstr): every token covered by a word n-gram
    that occurs ≥ `min_count` times ANYWHERE in the corpus (with
    multiplicity — within-doc repeats count) is deleted, and the document is
    rebuilt from the surviving tokens in order.  Unlike the document-level
    family above (exact/MinHash/SimHash), this removes the duplicated SPANS
    while keeping the unique remainder of each document — the variant that
    rescues partially-boilerplate pages instead of dropping them.

    The reference paper's suffix array is a single-machine structure; the
    Spark-shaped equivalent is relational: position-exploded n-grams →
    corpus-wide gram counts → covered-position expansion (each duplicated
    gram start covers positions [s, s+n-1]) → anti-join against the token
    table → ordered reassembly.  Cross-engine exactness needs no float at
    all (counts, positions, strings only).

    Scale shape: the gram explode is one row per token (same cardinality as
    the corpus token table, the floor for any exact method); the duplicated
    gram set is corpus-scaled so the hit join is a shuffle hash join on the
    gram key, NEVER a broadcast; covered-position expansion fans out at most
    n× the hit rows before the distinct; reassembly is one groupBy(id) whose
    per-doc state is the surviving token list — bounded by document length,
    the same bound sessionize's per-user window documents.
    """
    from neo4j_graph_algorithms_spark.pipeline.text import _all_grams

    toks = docs.select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("pos", "tok")
    )
    grams = docs.select(
        F.col(id_col), F.posexplode(_all_grams(text_col, n)).alias("pos", "gram")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gram")
    )
    hits = grams.join(dup.hint("shuffle_hash"), on="gram").select(id_col, "pos")
    covered = hits.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))).alias("pos"),
    ).distinct()
    kept = toks.join(covered.hint("shuffle_hash"), on=[id_col, "pos"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    base = docs.select(F.col(id_col), F.size(tokens_col(text_col)).alias("n_tokens"))
    return base.join(rebuilt.hint("shuffle_hash"), on=id_col, how="left").select(
        F.col(id_col),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[a, b, containment] ORDERED pairs (a != b) with n-gram containment
    C(a, b) = |S_a ∩ S_b| / |S_a| >= threshold (Broder 1997).

    The ASYMMETRIC near-dup score: a short document embedded verbatim in a
    long one has C(short, long) ~ 1 while Jaccard dilutes toward
    |short|/|long| — so containment is the subset-duplicate detector
    (boilerplate inclusion, quoted posts, vendored file inside a bundle)
    that `ngram_jaccard_pairs` structurally misses.  Directed: C(a,b) and
    C(b,a) are both emitted when both clear the threshold.

    Brute-force baseline like `ngram_jaccard_pairs` (shared-shingle join
    enumerates intersecting pairs) — at scale seed candidates from
    `minhash_lsh_dedup` buckets and verify containment on those pairs only.
    Cross-engine: the score is ONE integer division rounded to 6dp (no
    sums of rounded doubles), and the threshold compares the rounded value.
    """
    sh = _shingle_sets(docs, n, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    sa = sh.select(F.col(id_col).alias("a"), "tok")
    sb = sh.select(F.col(id_col).alias("b"), "tok")
    inter = (
        sa.join(sb, on="tok")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    scored = inter.join(
        sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), on="a"
    ).select(
        "a",
        "b",
        F.round(F.col("n_inter").cast("double") / F.col("sz_a"), 6).alias(
            "containment"
        ),
    )
    return scored.filter(F.col("containment") >= threshold)
