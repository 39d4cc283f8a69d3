"""FastRP node embeddings (Chen et al., arXiv:1908.11512; the gds.fastRP
analogue) — very sparse random projection + iterated neighbor averaging.

The GDS embedding workhorse, re-expressed declaratively:

  x_0(v)  = L2-normalized very-sparse random vector: component d of vertex
            v is −√3 / 0 / +√3 with probability 1/6, 2/3, 1/6 — drawn from
            a UNIVERSAL HASH of (v, d, seed), not an RNG;
  x_k(v)  = L2-normalized mean of {x_{k−1}(u) : u ~ v} (undirected);
  e(v)    = Σ_k w_k · x_k(v)  (iteration weights; x_0 itself not emitted,
            matching the GDS default of zero weight on the projection).

Determinism (the engine contract): the state is INTEGER-scaled (value ×
10^6, int64).  Every order-sensitive aggregation (neighbor sums, squared
norms) is therefore an EXACT integer sum — associative, shard-order
independent — and every floating-point step (mean division, 1/√ norm,
weight multiply) is a per-row chain of correctly-rounded IEEE ops on
identical integer inputs, so the doubles are bit-identical across Spark,
the DuckDB oracle, reruns, and re-sharded inputs.  Ordinary decimal
rounding cannot give this: means like odd/2 land EXACTLY on the rounding
grid boundary, where 1-ulp sum-order noise flips the rounded value (the
failure observed with the quantize-per-step approach).  Half-away-from-
zero to the integer grid is floor(|x| + 0.5)·sign(x) — identical on
identical doubles.

Scale shape: state is [vid, one array<long> of dimension d] — ONE row per
vertex; each iteration is one hash join of the (src-partitioned, cached)
edge table against the state projection (hinted — never broadcast) and
one aggregation with d fixed-width element sums (pure JVM column
expressions, no explode, no Python).  Messages per iteration: |E| rows of
d longs — one PageRank superstep times d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame

FASTRP_P = 1_000_003
A_V, A_D, A_S = 2_654_435_761 % FASTRP_P, 40_503, 8_191
SCALE = 1_000_000


def _half_away(col):
    """round-half-away-from-zero to int64 — deterministic on identical
    doubles (no decimal round(): see module docstring)."""
    return (
        F.when(col >= 0, F.floor(col + 0.5)).otherwise(-F.floor(-col + 0.5))
    ).cast("long")


def _normalize_int(df: DataFrame, dim: int) -> DataFrame:
    """Rescale the int64-component `vec` column to L2 norm SCALE (zero
    stays zero: greatest(s2, 1) keeps the divisor finite and 0·SCALE/1 = 0).

    s2 is an exact integer sum of squares; sqrt/division are per-row IEEE
    ops on it — bit-reproducible.  Staged as a named column first: inlining
    the s2 tree into each of the dim array elements multiplies the
    expression tree by dim² and stalls codegen (measured: 75 s compiling a
    15.7 MiB task binary at dim=16)."""
    staged = df.select(
        VID, "vec",
        sum(F.col("vec")[i] * F.col("vec")[i] for i in range(dim)).alias("_s2"),
    )
    nrm = F.sqrt(F.greatest(F.col("_s2"), F.lit(1)).cast("double"))
    return staged.select(
        VID,
        F.array(*[
            _half_away(F.col("vec")[i].cast("double") * SCALE / nrm)
            for i in range(dim)
        ]).alias("vec"),
    )


def fastrp(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    dim: int = 8,
    iteration_weights: tuple[float, ...] = (1.0, 1.0),
    seed: int = 42,
) -> DataFrame:
    """[vid, embedding array<double>, embedding_q6 array<long>] — FastRP
    embeddings; `embedding_q6` is the exact integer-scaled (×10^6)
    representation (the engine-independent form the correctness gate
    compares), `embedding` its double view."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    adj = (
        und.unionByName(und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .repartition(SRC)
        .persist()
    )
    adj.count()

    # staged columns (signs -> nnz -> array): inlining the hash tree into
    # every array element is O(dim²) expression blowup — see _normalize_int
    signs = []
    for d in range(dim):
        h = F.pmod(
            F.pmod(F.col(VID), F.lit(FASTRP_P)) * A_V
            + F.lit(d) * A_D
            + F.lit(seed) * A_S,
            F.lit(FASTRP_P),
        ) % 6
        signs.append(
            F.when(h == 0, F.lit(-1)).when(h == 5, F.lit(1)).otherwise(F.lit(0))
        )
    staged = ef.vertices().select(
        VID, *[s.alias(f"_g{d}") for d, s in enumerate(signs)]
    )
    staged = staged.select(
        VID,
        *[f"_g{d}" for d in range(dim)],
        sum(F.col(f"_g{d}") * F.col(f"_g{d}") for d in range(dim)).alias("_nnz"),
    )
    # ±√3 components share one magnitude, so x0 normalized is just
    # sign/√nnz — integer-scaled directly (all-zero rows: signs are 0, so
    # the greatest(nnz, 1) divisor is irrelevant)
    unit = _half_away(
        F.lit(float(SCALE))
        / F.sqrt(F.greatest(F.col("_nnz"), F.lit(1)).cast("double"))
    )
    x = staged.select(
        VID,
        F.array(*[
            (F.col(f"_g{d}") * unit).cast("long") for d in range(dim)
        ]).alias("vec"),
    ).localCheckpoint(eager=True)

    emb = None
    for w in iteration_weights:
        msgs = adj.join(
            x.select(F.col(VID).alias(SRC), "vec").hint("shuffle_hash"), on=SRC
        )
        agg = msgs.groupBy(F.col(DST).alias(VID)).agg(
            *[F.sum(F.col("vec")[i]).alias(f"_s{i}") for i in range(dim)],
            F.count("*").alias("_n"),
        )
        # exact-integer numerators / counts -> deterministic mean rounding
        mean = agg.select(
            VID,
            F.array(*[
                _half_away(F.col(f"_s{i}").cast("double") / F.col("_n"))
                for i in range(dim)
            ]).alias("vec"),
        )
        x = (
            x.select(VID)
            .join(mean.hint("shuffle_hash"), on=VID, how="left")
            .select(
                VID,
                F.coalesce(
                    F.col("vec"), F.array(*[F.lit(0).cast("long")] * dim)
                ).alias("vec"),
            )
        )
        x = _normalize_int(x, dim).localCheckpoint(eager=True)
        contrib = F.array(*[
            _half_away(F.col("vec")[i].cast("double") * float(w)) for i in range(dim)
        ])
        step = x.select(VID, contrib.alias("_c"))
        if emb is None:
            emb = step.select(VID, F.col("_c").alias("emb"))
        else:
            emb = (
                emb.join(step, on=VID)
                .select(
                    VID,
                    F.array(*[
                        (F.col("emb")[i] + F.col("_c")[i]) for i in range(dim)
                    ]).alias("emb"),
                )
                .localCheckpoint(eager=True)
            )
    adj.unpersist()
    return emb.select(
        VID,
        F.array(*[
            (F.col("emb")[i].cast("double") / SCALE) for i in range(dim)
        ]).alias("embedding"),
        F.col("emb").alias("embedding_q6"),
    )
