"""Deterministic distributed graph synthesizer for scale benchmarks.

Pure column expressions over ``spark.range`` — no driver-side data, no RNG
state; the same generator produces the identical edge set at any
parallelism (the property the N-vs-4N scaling evidence depends on) and any
size from CI fixtures to cluster-scale.

Skew model: endpoint = floor(N · u^alpha) with u a hash-derived uniform in
[0,1).  alpha=1 → uniform; alpha=2 → quadratic hub skew (heavy in-degree
head, the 'every commit touches README' shape co-commit graphs exhibit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TWO31 = 2**31


def _uniform(col_seed: int):
    """Deterministic pseudo-uniform in [0,1) from the row id."""
    return (F.pmod(F.xxhash64(F.col("id"), F.lit(col_seed)), F.lit(TWO31)) / TWO31)


def synth_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    alpha_src: float = 1.0,
    alpha_dst: float = 2.0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """[src, dst, weight] deterministic directed multigraph, self-loops
    removed; ~n_edges rows; dst skew controlled by alpha_dst."""
    rng = spark.range(0, n_edges, numPartitions=num_partitions)
    e = rng.select(
        F.floor(F.lit(n_vertices) * F.pow(_uniform(seed), F.lit(alpha_src)))
        .cast("long")
        .alias("src"),
        F.floor(F.lit(n_vertices) * F.pow(_uniform(seed + 1), F.lit(alpha_dst)))
        .cast("long")
        .alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return e.filter(F.col("src") != F.col("dst"))


# --- planted-spectrum embeddings (the emb_pca_project value gate) ----------
#
# Exact 3-4-5 rotation design: R is block-diagonal over 4 2×2 blocks, each
# the rotation [[0.6, -0.8], [0.8, 0.6]] (a Pythagorean rotation — every
# entry a 1-decimal rational, so round(1000·x) quantizes EXACTLY).  Each
# embedding row is a multiple c of ONE column of R (1-sparse in latent
# space), so the uncentered Gram is exactly Σ_j λ_j col_j col_jᵀ with
# λ_j = Σ c² — eigenvectors ±col_j in closed form, eigenvalues the planted
# λ.  pca_project's whole path (Gram pass → eigh → eigenvalue ordering →
# sign canonicalization → projection) therefore has ground-truth values:
# row (j, c) projects to c on the component ranked by λ_j (sign-flipped for
# odd j, whose canonical form is −col_j since its largest-|coeff| entry
# −0.8 gets flipped positive) and 0 elsewhere.  c values are multiples of
# 0.05 — never near a 1e-6 rounding boundary, so eigh's float noise
# (~1e-14) cannot move any rounded output.
_SPECTRUM_COEFFS: dict[int, list[float]] = {
    0: [0.60, -0.55, 0.50],   # λ = 0.9125  → rank 4
    1: [0.85, 0.80],          # λ = 1.3625  → rank 1
    2: [0.45, -0.40, 0.35, 0.30],  # λ = 0.575 → rank 7
    3: [1.00, -0.95],         # λ = 1.9025  → rank 0
    4: [0.70, 0.65, -0.25],   # λ = 0.975   → rank 3
    5: [0.90, 0.20],          # λ = 0.85    → rank 5
    6: [0.75, -0.70, 0.15],   # λ = 1.075   → rank 2
    7: [0.55, 0.50, 0.45, -0.10],  # λ = 0.765 → rank 6
}


def _spectrum_rows() -> list[tuple[int, int, float]]:
    """[(vec_id, latent_j, c)] — one row per planted coefficient."""
    rows, vid = [], 0
    for j in sorted(_SPECTRUM_COEFFS):
        for c in _SPECTRUM_COEFFS[j]:
            rows.append((vid, j, c))
            vid += 1
    lams = {j: sum(c * c for c in cs) for j, cs in _SPECTRUM_COEFFS.items()}
    assert len(set(lams.values())) == len(lams), "planted spectrum must be distinct"
    return rows


def _spectrum_rank() -> dict[int, int]:
    """latent j → principal-component index (descending eigenvalue)."""
    lams = {j: sum(c * c for c in cs) for j, cs in _SPECTRUM_COEFFS.items()}
    order = sorted(lams, key=lambda j: -lams[j])
    return {j: r for r, j in enumerate(order)}


def planted_spectrum_embeddings(spark: SparkSession) -> DataFrame:
    """[vec_id, embedding] — the 23-row, 8-dim planted-spectrum table."""
    d = 2 * ((max(_SPECTRUM_COEFFS) // 2) + 1)
    data = []
    for vid, j, c in _spectrum_rows():
        b, odd = divmod(j, 2)
        vec = [0.0] * d
        if odd:  # column (-0.8, 0.6) of block b
            vec[2 * b], vec[2 * b + 1] = -0.8 * c, 0.6 * c
        else:    # column (0.6, 0.8)
            vec[2 * b], vec[2 * b + 1] = 0.6 * c, 0.8 * c
        data.append((vid, vec))
    return spark.createDataFrame(data, "vec_id long, embedding array<double>")


def planted_spectrum_expected() -> list[tuple[int, int, float]]:
    """Closed-form pca_project(k=8) output over the planted table:
    [(vec_id, component, value)] for every (row, component) pair."""
    rank = _spectrum_rank()
    out = []
    for vid, j, c in _spectrum_rows():
        for comp in range(len(_SPECTRUM_COEFFS)):
            if comp == rank[j]:
                out.append((vid, comp, -c if j % 2 else c))
            else:
                out.append((vid, comp, 0.0))
    return out


def planted_partition_graph(
    spark: SparkSession, groups: int = 4, group_size: int = 6
) -> DataFrame:
    """[src, dst, weight] planted-partition graph: `groups` cliques of
    `group_size` nodes (ids 0..groups*group_size-1) joined in a ring by one
    bridge edge per adjacent group pair.  Unit weights; src<dst canonical.

    With the 4×6 default the edge count is 4·15+4 = 64 — a POWER OF TWO, so
    every modularity-gain division (by m and 2m²) is exact in binary
    floating point and a greedy Louvain trajectory over this graph is
    bit-identical across engines (the property the louvain_fixed2_planted
    oracle gate relies on)."""
    n = groups * group_size
    nodes = spark.range(n).select(F.col("id").alias("v"))
    intra = (
        nodes.alias("a")
        .join(nodes.alias("b"), F.col("a.v") < F.col("b.v"))
        .filter(
            F.floor(F.col("a.v") / group_size) == F.floor(F.col("b.v") / group_size)
        )
        .select(F.col("a.v").alias("src"), F.col("b.v").alias("dst"))
    )
    bridge_rows = [
        (
            min(g * group_size + group_size - 1, ((g + 1) % groups) * group_size),
            max(g * group_size + group_size - 1, ((g + 1) % groups) * group_size),
        )
        for g in range(groups)
    ]
    bridges = spark.createDataFrame(bridge_rows, "src long, dst long")
    return (
        intra.unionByName(bridges)
        .withColumn("weight", F.lit(1.0))
        .select("src", "dst", "weight")
    )
