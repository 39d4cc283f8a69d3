"""Deterministic random-walk sampling — graph sampling for GNN/embedding
training pipelines (DeepWalk/node2vec-style first-order walks).

Not in the reference catalogue (its procedures stop at centrality/
community/paths — /root/reference/algo/src/main/java/org/neo4j/graphalgo/),
but walk corpora are the standard bridge from a link graph to embedding
training at 10^12-edge scale, and the sampler below is exactly
superstep-shaped: one hash-join per step, walk state partitioned on the
current vertex, adjacency cached pre-partitioned on src.

Determinism (the correctness contract): the "random" neighbor choice is a
universal hash of (current vertex, step, walk id) mod out-degree, over
neighbors ranked by dst — pure integer arithmetic, so ANY engine (the
DuckDB oracle, a rerun, a resumed job) reproduces the identical corpus.
Seeded variation comes from the `seed` mixed into the hash, not from RNG
state, which is what makes walks resumable and shard-order-independent at
cluster scale (a Mersenne-twister-per-task sampler is neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame

# hash modulus/multipliers: same universal-hash family as pipeline/text.py
WALK_P = 1_000_003
A_CUR, A_STEP, A_WALK, A_SEED = 2_654_435_761 % WALK_P, 40_503, 69_621, 8_191


def _choice(cur, step: int, walk, seed: int):
    """Universal hash of (cur, step, walk_id, seed) in [0, WALK_P).

    Operands are reduced mod P before multiplying so the arithmetic never
    exceeds ~P² ≈ 10^12 — no int64 overflow even for xxhash64 id spaces;
    pmod keeps intermediate values non-negative for negative ids (the
    oracle side uses plain % over non-negative ids, where the two agree)."""
    return F.pmod(
        F.pmod(cur, F.lit(WALK_P)) * A_CUR
        + F.lit(step) * A_STEP
        + F.pmod(walk, F.lit(WALK_P)) * A_WALK
        + F.lit(seed) * A_SEED,
        F.lit(WALK_P),
    )


def random_walks(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """[walk_id, step, vid] — `walks_per_node` uniform first-order walks of
    up to `walk_length` steps from every vertex (or from `starts` [vid]).

    Walks that reach a sink (no out-neighbors) stop early; step 0 is the
    start vertex.  walk_id = vid * walks_per_node + k.

    Plan per step (the 10^12-edge shape): the walk frontier (|starts| rows,
    shrinking with sinks) joins the src-partitioned adjacency cache on
    (cur = src, rank = hash % degree) — one shuffle of the frontier per
    step, the adjacency never moves, no window over anything larger than a
    vertex neighborhood.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)

    # distinct neighbors ranked by dst within src: rank is per-neighborhood
    # (window PARTITIONED by src — never a global sort)
    w = Window.partitionBy(SRC).orderBy(DST)
    adj = (
        ef.df.select(SRC, DST)
        .distinct()
        .select(
            SRC,
            DST,
            (F.row_number().over(w) - 1).alias("_rk"),
            F.count("*").over(Window.partitionBy(SRC)).alias("_deg"),
        )
        .repartition(SRC)
        .persist()
    )
    adj.count()

    verts = starts.select(VID) if starts is not None else ef.vertices()
    frontier = verts.select(F.col(VID).alias("cur")).crossJoin(
        spark.range(walks_per_node).select(F.col("id").alias("_k"))
    ).select(
        (F.col("cur") * walks_per_node + F.col("_k")).alias("walk_id"),
        F.col("cur"),
    )

    out = frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias(VID))
    rows = [out]
    for step in range(1, walk_length + 1):
        nxt = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier["cur"] == adj[SRC], "inner")
            .filter(
                F.col("_rk")
                == _choice(F.col("cur"), step, F.col("walk_id"), seed) % F.col("_deg")
            )
            .select("walk_id", F.col(DST).alias("cur"))
        )
        # LAZY checkpoint + count(): the count materializes the checkpoint
        # blocks AND reads the surviving-walk cardinality in the SAME job —
        # eager + isEmpty() was one extra driver-blocking job per step
        frontier = nxt.localCheckpoint(eager=False)
        n_alive = frontier.count()
        rows.append(
            frontier.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias(VID))
        )
        if n_alive == 0:
            break
    result = rows[0]
    for r in rows[1:]:
        result = result.unionByName(r)
    adj.unpersist()
    return result


def walk_skipgram_pairs(
    walks: DataFrame, window: int = 2, ordered: bool = True
) -> DataFrame:
    """[center, context, offset] — skip-gram training pairs from a walk
    corpus (the word2vec/DeepWalk consumer of `random_walks`).

    One pair per (walk, |step delta| ≤ window, delta ≠ 0) co-occurrence;
    `offset` is the signed step delta (context − center position).
    `ordered=False` keeps only delta > 0 (undirected-context training).

    Plan: a single self-equi-join on walk_id with a bounded band predicate
    on step — walk_id is the shuffle key, each walk is ≤ walk_length rows,
    so the join fan-out per key is O(walk_length · window), constant.
    """
    a = walks.select(
        F.col("walk_id"), F.col("step").alias("_sc"), F.col(VID).alias("center")
    )
    b = walks.select(
        F.col("walk_id"), F.col("step").alias("_sx"), F.col(VID).alias("context")
    )
    lo = -window if ordered else 1
    return (
        a.join(b, on="walk_id")
        .withColumn("offset", F.col("_sx") - F.col("_sc"))
        .filter((F.col("offset") >= lo) & (F.col("offset") <= window) & (F.col("offset") != 0))
        .select("walk_id", "center", "context", "offset")
    )


def node2vec_walks(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """[walk_id, step, vid] — node2vec biased SECOND-order walks
    (Grover & Leskovec, arXiv:1607.00653 §3.2): from (prev -> cur), the
    unnormalized weight of candidate x is 1/p if x == prev (return),
    1 if the edge prev -> x exists (stay near), else 1/q (explore).

    Determinism (the engine contract, same as `random_walks`): p and q are
    converted to EXACT rationals and all candidate weights scaled to
    integers, so the cumulative-weight selection `hash(cur, step, walk, seed)
    mod total_weight` is pure integer arithmetic — any engine (the DuckDB
    oracle, a resumed job, a different shard order) reproduces the identical
    corpus.  Pass p/q as dyadic rationals (0.5, 2.0, 0.25 ...) so the float
    -> Fraction conversion is exact.  The modulo selection trades a bias of
    O(total_weight / 2^20) for exactness — acceptable for corpus sampling.

    Scale shape per step (10^12-edge safe): the frontier [walk_id, cur, prev]
    joins the src-partitioned adjacency on cur (frontier shuffles, adjacency
    does not), the prev-adjacency marker is a second hash join against an
    (src, dst)-partitioned copy of the same cache, and the weighted pick is
    a window PARTITIONED BY walk_id over one neighborhood — never a global
    sort, never a broadcast of anything |V|-sized.

    Step 1 has no prev: every candidate takes the explore weight, i.e. the
    first hop is uniform (the node2vec convention).
    """
    from fractions import Fraction
    from math import lcm

    fr, fq = Fraction(1) / Fraction(p), Fraction(1) / Fraction(q)
    den = lcm(fr.denominator, fq.denominator)
    w_ret, w_in, w_out = int(fr * den), den, int(fq * den)

    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    adj = ef.df.select(SRC, DST).distinct().repartition(SRC).persist()
    adj.count()
    # second copy partitioned on the composite key so the per-step
    # prev-adjacency join never re-shuffles the edge side
    adj2 = adj.repartition(SRC, DST).persist()
    adj2.count()

    verts = starts.select(VID) if starts is not None else ef.vertices()
    frontier = (
        verts.select(F.col(VID).alias("cur"))
        .crossJoin(spark.range(walks_per_node).select(F.col("id").alias("_k")))
        .select(
            (F.col("cur") * walks_per_node + F.col("_k")).alias("walk_id"),
            F.col("cur"),
            F.lit(None).cast("long").alias("prev"),
        )
    )

    rows = [frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias(VID))]
    for step in range(1, walk_length + 1):
        cand = frontier.hint("shuffle_hash").join(
            adj, frontier["cur"] == adj[SRC], "inner"
        ).select("walk_id", "cur", "prev", F.col(DST).alias("cand"))
        marked = cand.hint("shuffle_hash").join(
            adj2.select(F.col(SRC).alias("prev"), F.col(DST).alias("cand"),
                        F.lit(1).alias("_adj")),
            on=["prev", "cand"],
            how="left",
        )
        weighted = marked.select(
            "walk_id", "cur", "cand",
            F.when(F.col("cand") == F.col("prev"), F.lit(w_ret))
            .when(F.col("_adj").isNotNull(), F.lit(w_in))
            .otherwise(F.lit(w_out))
            .alias("wt"),
        )
        wwin = Window.partitionBy("walk_id").orderBy("cand")
        picked = (
            weighted.select(
                "walk_id", "cur", "cand", "wt",
                F.sum("wt").over(
                    wwin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ).alias("cum"),
                F.sum("wt").over(Window.partitionBy("walk_id")).alias("tot"),
            )
            .withColumn(
                "_r", _choice(F.col("cur"), step, F.col("walk_id"), seed) % F.col("tot")
            )
            .filter((F.col("_r") >= F.col("cum") - F.col("wt")) & (F.col("_r") < F.col("cum")))
            .select("walk_id", F.col("cand").alias("cur"), F.col("cur").alias("prev"))
        )
        # lazy checkpoint + count: one job per step (see random_walks)
        frontier = picked.localCheckpoint(eager=False)
        n_alive = frontier.count()
        rows.append(
            frontier.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias(VID))
        )
        if n_alive == 0:
            break
    result = rows[0]
    for r in rows[1:]:
        result = result.unionByName(r)
    adj.unpersist()
    adj2.unpersist()
    return result


def khop_fanout_sample(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    fanouts: list[int] | tuple[int, ...] = (3, 2),
    seed: int = 42,
    roots: DataFrame | None = None,
) -> DataFrame:
    """[layer, src, dst] — GraphSAGE-style fixed-fanout k-hop neighborhood
    sample (Hamilton et al., arXiv:1706.02216 §3.1): layer l keeps at most
    fanouts[l-1] out-neighbors per frontier vertex; the next frontier is the
    distinct sampled targets.

    Deterministic like `random_walks`: each neighbor is ranked by a
    universal hash of (src, dst, layer, seed) — ties by dst — so any engine
    reproduces the identical sample and a resumed job cannot drift.

    Scale shape: per layer one semi-join (adjacency × frontier) and one
    window PARTITIONED BY src (bounded by neighborhood size — never a
    global sort); the adjacency is cached pre-partitioned on src so only
    the (bounded) frontier shuffles.  Per-root subtree tracking
    is intentionally NOT materialized (that explodes multiplicatively at
    10^12 edges); consumers join layers back by walking sampled edges.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    adj = ef.df.select(SRC, DST).distinct().repartition(SRC).persist()
    adj.count()
    frontier = (
        roots.select(F.col(roots.columns[0]).alias(SRC)).distinct()
        if roots is not None
        else adj.select(SRC).distinct()
    )
    layers: list[DataFrame] = []
    for layer, fanout in enumerate(fanouts, start=1):
        cand = adj.join(frontier.hint("shuffle_hash"), on=SRC, how="left_semi")
        h = F.pmod(
            F.pmod(F.col(SRC), F.lit(WALK_P)) * A_CUR
            + F.pmod(F.col(DST), F.lit(WALK_P)) * A_WALK
            + F.lit(layer) * A_STEP
            + F.lit(seed) * A_SEED,
            F.lit(WALK_P),
        )
        w = Window.partitionBy(SRC).orderBy(h.asc(), F.col(DST).asc())
        picked = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= fanout)
            .select(F.lit(layer).alias("layer"), SRC, DST)
            .localCheckpoint(eager=True)
        )
        layers.append(picked)
        frontier = picked.select(F.col(DST).alias(SRC)).distinct()
    adj.unpersist()
    out = layers[0]
    for part in layers[1:]:
        out = out.unionByName(part)
    return out
