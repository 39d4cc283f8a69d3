"""Similarity search over an embedding column (array<float>).

Two tiers, mirroring the engine's correctness-first/scale-path split:
  * brute-force cosine top-k / threshold pairs — exact baseline; the
    corpus×query join broadcasts the (small) query side, dot products run
    as JVM higher-order functions (zip_with + aggregate), no Python;
  * SRP-LSH (signed random projections): deterministic hyperplanes → bit
    signature → bucket equi-join candidates → exact cosine verify.  At
    10^12 rows only bucket-mates are compared.
All cosines computed in float64 from the float32 inputs; results rounded
to 6 decimals (engine-independent given sequential summation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return embs.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[query_id, neighbor_id, rank, cosine] exact top-k by brute force.

    Query side is broadcast (ANN query batches are small relative to the
    corpus); scan side streams once.  rank is deterministic: ties broken
    by neighbor id.  Self-matches excluded.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), F.col("_norm").alias("_cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), F.col("_norm").alias("_qn")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_pairs(
    embs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[a, b, cosine] all pairs (a<b) with cosine ≥ threshold — brute-force
    baseline for embedding near-dup; use `srp_lsh_pairs` at scale."""
    e = with_norm(embs, vec_col)
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na"))
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn(
            "cosine", F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


# -- SRP-LSH (scale path) ------------------------------------------------------


def srp_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG over (i, j, seed)).

    Plain Python floats in [-0.5, 0.5): embedded as literals into the plan
    (and into any SQL oracle), so every engine sees identical planes.
    """
    planes = []
    for i in range(n_planes):
        row = []
        state = (seed * 1_103_515_245 + i * 12_345 + 6_789) % (2**31)
        for _ in range(dim):
            state = (state * 1_103_515_245 + 12_345) % (2**31)
            row.append(state / float(2**31) - 0.5)
        planes.append(row)
    return planes


def srp_signature(
    embs: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id, srp_sig] sign-bit signature: bit i = (v · plane_i) >= 0."""
    planes = srp_hyperplanes(dim, n_planes, seed)
    sig = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        term = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return embs.select(F.col(id_col), sig.alias("srp_sig"))


def srp_lsh_pairs(
    embs: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[a, b, cosine] near-dup pairs: SRP band-bucket candidates verified by
    exact cosine ≥ threshold.  Pairs agreeing on all bits of ≥1 band are
    candidates (per-band equi-join; no all-pairs)."""
    sigs = srp_signature(embs, n_planes, dim, seed, id_col, vec_col)
    width = n_planes // bands
    cands = None
    for bi in range(bands):
        block = F.shiftrightunsigned(F.col("srp_sig"), bi * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        keyed = sigs.select(F.col(id_col), F.concat_ws("_", F.lit(bi), block).alias("bucket"))
        pairs = (
            keyed.select(F.col(id_col).alias("a"), "bucket")
            .join(keyed.select(F.col(id_col).alias("b"), "bucket"), on="bucket")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()
    e = with_norm(embs, vec_col)
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na"))
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb"))
    return (
        cands.join(a, on="a")
        .join(b, on="b")
        .withColumn(
            "cosine", F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


# -- IVF (coarse-quantized ANN, scale path for top-k) -------------------------


def ivf_build(
    embs: DataFrame,
    n_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(centroids [cid, centroid], assignments [id, cid]) — k-means coarse
    quantizer, Lloyd iterations as DataFrame ops.

    Deterministic init: centroids = the `n_centroids` lowest-id vectors.
    Assignment = argmin squared L2 via a broadcast centroid join; update =
    element-wise mean (posexplode + groupBy(cid, dim)).  Driver holds only
    the k centroid vectors.

    `quantize`: round centroid coordinates (and the assignment distances)
    to N decimals each iteration — the oracle-parity mode (summation order
    inside avg()/sum() differs across engines; quantization makes argmin
    assignments engine-independent), and a standard compression knob.
    """
    q = (lambda c: F.round(c, quantize)) if quantize is not None else (lambda c: c)
    cents = (
        embs.orderBy(id_col)
        .limit(n_centroids)
        # rank directly on id_col: monotonically_increasing_id after a sort
        # does NOT follow sort order, so centroid ids would be run-dependent
        .withColumn("cid", F.row_number().over(Window.orderBy(id_col)) - 1)
        .select(
            "cid",
            F.transform(F.col(vec_col).cast("array<double>"), q).alias("centroid"),
        )
    )
    for _ in range(iterations):
        assigned = _ivf_assign(embs, cents, id_col, vec_col, quantize)
        per_dim = (
            assigned.join(embs, on=id_col)
            .select("cid", F.posexplode(F.col(vec_col)).alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(q(F.avg(F.col("x").cast("double"))).alias("m"))
        )
        cents = (
            per_dim.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("s"))
            .select("cid", F.transform("s", lambda e: e["m"]).alias("centroid"))
        )
        cents = cents.localCheckpoint(eager=True)  # truncate iterative lineage
    return cents, _ivf_assign(embs, cents, id_col, vec_col, quantize)


def _ivf_assign(
    embs: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    quantize: int | None = None,
) -> DataFrame:
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("centroid"), lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if quantize is not None:
        d2 = F.round(d2, quantize)
    scored = embs.crossJoin(F.broadcast(cents)).withColumn("_d2", d2)
    w = Window.partitionBy(id_col).orderBy(F.asc("_d2"), F.asc("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), "cid")
    )


def ivf_search(
    embs: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = None,
) -> DataFrame:
    """[query_id, neighbor_id, rank, cosine] ANN top-k probing the
    `n_probes` nearest centroid cells per query — the scan touches only
    probed cells (partition pruning by cid at scale).  `quantize` must
    match ivf_build's (oracle-parity distance rounding)."""
    qd2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if quantize is not None:
        qd2 = F.round(qd2, quantize)
    q_assign = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", qd2)
        .withColumn(
            "_rn", F.row_number().over(Window.partitionBy(id_col).orderBy(F.asc("_d2"), F.asc("cid")))
        )
        .filter(F.col("_rn") <= n_probes)
        .select(F.col(id_col).alias("query_id"), "cid")
    )
    probe_corpus = (
        assignments.join(q_assign, on="cid")
        .select("query_id", F.col(id_col).alias("neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    c = with_norm(embs, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), F.col("_norm").alias("_cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), F.col("_norm").alias("_qn")
    )
    scored = (
        probe_corpus.join(c, on="neighbor_id")
        .join(F.broadcast(q), on="query_id")
        .withColumn(
            "cosine", F.round(_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def quantize_embeddings(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exploded: bool = False,
) -> DataFrame:
    """Symmetric int8 scalar quantization: q_i = round(x_i / scale),
    scale = max|x| / 127 — the storage/bandwidth step before ANN serving
    (4× smaller than float32, 8× smaller than float64).

    Returns [id, scale, qvec array<int>], or with ``exploded=True`` the
    row form [id, dim, q] (+ scale) used by the engine-parity gate (no
    array columns cross the oracle boundary).  All-zero vectors quantize
    to zeros with scale 0 (guarded divide).  Pure higher-order column
    functions — JVM-side, no Python in the hot path.
    """
    scale = F.aggregate(
        F.transform(F.col(vec_col), lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    ) / F.lit(127.0)
    q = embs.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(
                x / F.when(scale > 0, scale).otherwise(F.lit(1.0)), 0
            ).cast("int"),
        ).alias("qvec"),
    )
    if not exploded:
        return q
    return q.select(
        id_col, "scale", F.posexplode("qvec").alias("dim", "q")
    )


def gram_matrix(
    embs: DataFrame,
    scale: int = 1000,
    vec_col: str = "embedding",
) -> DataFrame:
    """[i, j, gram] — the exact d×d Gram matrix of the embedding column
    (upper triangle, i ≤ j, 0-based dims), the covariance/PCA-whitening
    building block (a PCA over a 100 TB embedding table is one distributed
    Gram pass + a driver-side d×d eigendecomposition).

    Exactness contract: components quantize to the 1/scale grid first
    (round(x·scale) → int64, float32→float64 widening and the ·scale
    product are IEEE-exact in both engines), then ALL sums are integer —
    order/partitioning/engine-independent; gram = Σ qᵢqⱼ / scale² rounded
    to 6dp.  Sum magnitude bound: |q| ≤ scale·max|x|, so int64 holds
    ~9e18/(scale·max|x|)² rows — 10¹³ rows at scale=1000, max|x|≈1.

    Scale shape: one mapInPandas pass emitting a d(d+1)/2-row PARTIAL Gram
    per Arrow batch (numpy int64 matmul — the per-partition-CSR pattern of
    csr/), then a groupBy((i,j)) over d²-bounded traffic: shuffle volume is
    O(batches·d²), independent of row count.  Never a per-row d² explode.
    """
    import numpy as np
    import pandas as pd

    out_schema = "i int, j int, gram_scaled long"

    def _partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v = mat * scale
            # round HALF AWAY FROM ZERO — the Spark/DuckDB round() rule
            # (np.rint is half-to-even and flips exact .5 ties)
            q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            g = q.T @ q
            d = g.shape[0]
            ii, jj = np.triu_indices(d)
            yield pd.DataFrame(
                {"i": ii.astype(np.int32), "j": jj.astype(np.int32), "gram_scaled": g[ii, jj]}
            )

    partials = embs.select(vec_col).mapInPandas(_partial, schema=out_schema)
    denom = float(scale) * float(scale)
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("gram_scaled").alias("_g"))
        .select(
            "i",
            "j",
            F.round(F.col("_g") / F.lit(denom), 6).alias("gram"),
        )
    )


def pca_project(
    embs: DataFrame,
    k: int = 8,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id, component, value] — project each embedding onto the corpus's
    top-k principal directions (uncentered PCA / latent-semantic axes), the
    dimensionality-reduction step before clustering or coarse ANN.

    Two-phase, each distributed-friendly: (1) one `gram_matrix` pass — the
    only corpus-wide aggregation, d²-bounded traffic; (2) a driver-side
    d×d `numpy.linalg.eigh` (d is model-sized: 64–4096 — microseconds) and
    a broadcast of the k×d component matrix back into a pure column-
    expression projection (zip_with dot products, whole-stage codegen; no
    second shuffle).

    Eigendecomposition is inherently float-iterative, so unlike
    `gram_matrix` this op pins its value contract by pytest (planted
    low-rank recovery + sign canonicalization), not a DuckDB twin.
    Component sign is canonicalized (largest-|coeff| coordinate positive,
    ties to the lower index) so results are reproducible across BLAS
    builds up to float noise.
    """
    import numpy as np

    gm = gram_matrix(embs, scale=scale, vec_col=vec_col).collect()
    d = max(r.j for r in gm) + 1
    G = np.zeros((d, d))
    for r in gm:
        G[r.i, r.j] = r.gram
        G[r.j, r.i] = r.gram
    vals, vecs = np.linalg.eigh(G)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k × d
    for c in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[c])))
        if comps[c, j] < 0:
            comps[c] = -comps[c]

    out = embs.select(F.col(id_col), F.col(vec_col))
    rows = []
    for c in range(comps.shape[0]):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in comps[c]]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        rows.append(
            out.select(
                F.col(id_col),
                F.lit(c).alias("component"),
                # + 0.0 canonicalizes IEEE -0.0 (a projection onto an
                # orthogonal component computes as ~-1e-16 and rounds to
                # -0.0, which value-hashes differently from the oracle's 0.0)
                (F.round(proj, 6) + F.lit(0.0)).alias("value"),
            )
        )
    res = rows[0]
    for r in rows[1:]:
        res = res.unionByName(r)
    return res


def ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """[query_id, n_exact, n_approx, hits, recall_q6] — per-query recall of
    an ANN result against the exact top-k: hits counts (query_id,
    neighbor_id) pairs present in BOTH frames, recall_q6 =
    floor(10⁶·hits/n_exact) in pure BIGINT arithmetic (hits ≤ k, so no
    overflow and no float anywhere — engine- and re-shard-invariant).

    This is the eval harness a 100 TB ANN deployment runs on a SAMPLED
    query set: the exact side (cosine_topk) is the expensive leg and is
    priced by the sample size, never the corpus; the joins hash on
    (query_id, neighbor_id) with per-query group sizes bounded by k.
    """
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    ne = e.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    na = a.groupBy("query_id").agg(F.count("*").alias("n_approx"))
    hits = (
        e.join(a, on=["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        ne.join(na, on="query_id", how="left")
        .join(hits, on="query_id", how="left")
        .withColumn("n_approx", F.coalesce("n_approx", F.lit(0)))
        .withColumn("hits", F.coalesce("hits", F.lit(0)))
        # integer floor division: both operands positive BIGINTs
        .withColumn("recall_q6", F.expr("hits * 1000000 div n_exact"))
        .select("query_id", "n_exact", "n_approx", "hits", "recall_q6")
    )
