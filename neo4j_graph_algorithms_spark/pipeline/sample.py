"""Deterministic data-mixture resampling — the sampling stage of an LLM
training-data pipeline (per-source/per-language mixture weights, e.g. the
"epochs per dataset" tables of the Pile/LLaMA recipes).

Not in the reference catalogue (its procedures are graph-side —
/root/reference/algo/src/main/java/org/neo4j/graphalgo/), but mixture
weighting is how a 100 TB curated corpus becomes a training mix, and it
must be deterministic: re-running the job, resuming it, or re-sharding the
input must reproduce the identical sample.

Mechanism: a universal hash of the document id (same (a·x+b) mod P family
as pipeline/text.py, single source of truth) decides each row's fate —
weight w means floor(w) guaranteed copies plus one extra copy iff
hash(id) < frac(w)·P.  Expected multiplicity is exactly w per stratum; no
RNG state, no sampleBy (whose Bernoulli draws are partition-order
dependent).

Scale shape: pure column expressions + one bounded explode — NO shuffle at
all; the op pipelines into whatever scan feeds it and Catalyst pushes the
n>=1 filter down.  The strata→weight map is a compile-time literal CASE
(never a join): mixtures have tens of strata, not millions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params


def _copies(weight: float) -> tuple[int, int]:
    """(guaranteed copies, hash threshold for one extra) — integer-exact."""
    base = int(weight)
    thr = int(round((weight - base) * HASH_P))
    return base, thr


def mixture_resample(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_weight: float = 1.0,
) -> DataFrame:
    """Input columns + `copy` (0-based) — each row repeated per its
    stratum's mixture weight.  w < 1 is stratified downsampling (keep with
    probability w), w > 1 is upsampling (floor(w) epochs + fractional
    epoch), w = 0 drops the stratum.

    Deterministic: the extra-copy decision is hash(id, seed) < frac(w)·P —
    pure integer arithmetic, engine-independent, shard-order-independent.
    """
    a, b = hash_params(seed)
    h = F.pmod(F.pmod(F.col(id_col), F.lit(HASH_P)) * a + b, F.lit(HASH_P))

    n = F.lit(_copies(default_weight)[0]) + (
        h < _copies(default_weight)[1]
    ).cast("int")
    for key, w in sorted(weights.items()):
        base, thr = _copies(float(w))
        n = F.when(
            F.col(strata_col) == key, F.lit(base) + (h < thr).cast("int")
        ).otherwise(n)

    return (
        docs.withColumn("_n", n)
        .filter(F.col("_n") >= 1)
        .select(
            *docs.columns,
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("copy"),
        )
    )


def mixture_counts(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_weight: float = 1.0,
) -> DataFrame:
    """[stratum, n_docs, n_rows] — audit view of a mixture: distinct source
    documents kept and total resampled rows per stratum.  One shuffle (the
    groupBy); map-side combine applies."""
    out = mixture_resample(docs, weights, strata_col, id_col, seed, default_weight)
    return out.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("n_rows"),
    )


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Input columns + `split` — deterministic train/val/test assignment.

    Every training pipeline's final partitioning step: row r goes to the
    split whose cumulative-fraction interval contains hash(id, seed)/P.
    Same universal-hash family as `mixture_resample` (single source of
    truth), so the assignment is re-run/resume/re-shard invariant and
    engine-independent (the DuckDB twin reproduces it bit-exactly) — never
    `randomSplit`, whose Bernoulli draws are partition-order dependent and
    non-reproducible across shards.

    `fractions` maps split name → fraction (must sum to ≤ 1 within integer
    rounding of the hash space; any remainder falls into the LAST split in
    sorted-name order).  Default {'test': 0.1, 'train': 0.8, 'val': 0.1}.

    Scale shape: one pure column expression, zero shuffle — pipelines into
    the feeding scan.
    """
    bounds = split_bounds(fractions)
    a, b = hash_params(seed)
    h = F.pmod(F.pmod(F.col(id_col), F.lit(HASH_P)) * a + b, F.lit(HASH_P))
    expr = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(h < hi, F.lit(name)).otherwise(expr)
    # the when-chain assigns the FIRST interval whose upper bound exceeds h,
    # built right-to-left so earlier names take precedence
    return docs.withColumn("split", expr)


def split_bounds(fractions: dict[str, float] | None) -> list[tuple[str, int]]:
    """[(name, exclusive upper hash bound)] in sorted-name order — the one
    place the fraction→integer-interval mapping lives (hash_split and its
    DuckDB oracle twin both call it)."""
    fractions = fractions or {"test": 0.1, "train": 0.8, "val": 0.1}
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    cum, bounds = 0.0, []
    for name in sorted(fractions):
        cum += fractions[name]
        bounds.append((name, int(round(cum * HASH_P))))
    bounds[-1] = (bounds[-1][0], HASH_P)  # remainder -> last split
    return bounds


def stratified_take(
    docs: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """Input columns + `sample_rank` — a deterministic fixed-size uniform
    sample WITHOUT replacement per stratum: the k rows whose universal hash
    (same (a·x+b) mod P family, single source of truth) sorts first within
    their stratum, ties broken by id.  The eval-set / human-review draw
    every curation pipeline needs — reproducible across reruns, resumes,
    and re-shards, unlike any RNG-state sample.

    Scale shape: one per-stratum window over the hash order.  Strata are
    mixture-sized (tens), so each window partition is a full stratum — at
    10^12 rows swap the row_number for a two-phase top-k (per-partition
    heap + merge, the top_ngrams TakeOrdered pattern) if a single stratum
    exceeds an executor; the hash-order contract is identical either way.
    """
    from pyspark.sql import Window

    a, b = hash_params(seed)
    h = F.pmod(F.pmod(F.col(id_col), F.lit(HASH_P)) * a + b, F.lit(HASH_P))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
