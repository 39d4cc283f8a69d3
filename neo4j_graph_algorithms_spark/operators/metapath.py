"""MetaPath computation (the fork's added MetaPath-Computation module).

Reference semantics (impl/metapath/ComputeAllMetaPaths.java:38-173, SURVEY.md
§2.12.7):

  * a metapath is an alternating sequence label,type,label,...;
    `length` = max number of NODE labels in the path (start label counts:
    CurrentState(label, length){ remainingLength = length - 1 }, :66-74);
  * counts are WALK INSTANCE counts — multiplicities accumulate along
    expansions (addNode(neighbourId, count), :79-89,154-173);
  * adjacency is UNDIRECTED (loader asUndirected(true),
    ComputeAllMetaPathsProc.java:45); edge-type lookup is
    direction-agnostic (combineSorted, labels/LabelMapping.java:69-72);
  * multi-label nodes contribute to each of their labels at SEED time but
    only labels[0] during expansion (LabelMapping.java:29-35 vs :146-149).

Spark plan: level-synchronous BFS in label space.  State
[path: string, vid, cnt]; per level one edge join + one label join + one
groupBy — counts aggregate per (path, vid) so state size is bounded by
#vertices × #distinct-paths, never by #walks.  Path strings are token ids
joined by '|' (label|type|label|...).

State explosion guard: #paths grows like (labels×types)^L; `max_paths`
caps the distinct-path count per level and raises if exceeded
(SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID

TYPE = "type"
PATH = "path"
CNT = "cnt"


def _undirected_typed(edges: DataFrame) -> DataFrame:
    e = edges.select(
        F.col(SRC).cast("long"), F.col(DST).cast("long"), F.col(TYPE).cast("int")
    )
    rev = e.filter(F.col(SRC) != F.col(DST)).select(
        F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(TYPE)
    )
    return e.unionByName(rev)


def _primary_labels(node_labels: DataFrame) -> DataFrame:
    """[vid, label] with the FIRST label per node (LabelMapping.java:146-149).
    Input [vid, labels: array<int>]."""
    return node_labels.select(F.col(VID), F.col("labels")[0].cast("int").alias("label"))


def compute_all_metapaths(
    spark: SparkSession,
    edges: DataFrame,
    node_labels: DataFrame,
    length: int,
    start_labels: list[int] | None = None,
    end_labels: list[int] | None = None,
    seed_vertices: DataFrame | None = None,
    max_paths: int = 1_000_000,
) -> DataFrame:
    """Count all metapaths with ≤ `length` node labels; returns [path, cnt].

    `start_labels` / `end_labels` implement algo.computeAllMetaPathsBetweenTypes
    (impl/metapath/ComputeAllMetaPathsBetweenTypes.java:18-120): restrict the
    seed label / report only paths ending in an end label.
    `seed_vertices` ([vid]) implements algo.computeAllMetaPathsForInstances:
    seed only from the given node set.

    edges: [src, dst, type]; node_labels: [vid, labels: array<int>].
    """
    if length < 1:
        raise ValueError("length must be >= 1")
    # edge cache pre-partitioned on the per-level join key (src; the rename
    # to vid preserves the partitioning through the alias) so each level's
    # state⋈edges join exchanges only the state side — the same convention
    # as the wcc/lpa superstep caches; materialized eagerly so level 1
    # doesn't pay the cache build inside its first join stage.
    und = _undirected_typed(edges).repartition(SRC).persist()
    und.count()
    prim = _primary_labels(node_labels).persist()
    prim.count()

    # --- seeds: every node contributes cnt=1 to EACH of its labels ---------
    seeds = node_labels.select(VID, F.explode("labels").alias("label"))
    if seed_vertices is not None:
        seeds = seeds.join(seed_vertices.select(VID), on=VID, how="left_semi")
    if start_labels is not None:
        seeds = seeds.filter(F.col("label").isin([int(x) for x in start_labels]))
    state = seeds.select(
        F.col("label").cast("string").alias(PATH), F.col(VID), F.lit(1).cast("long").alias(CNT)
    )

    def _record(st: DataFrame) -> DataFrame:
        rec = st
        if end_labels is not None:
            ends = [str(int(x)) for x in end_labels]
            rec = rec.filter(
                F.element_at(F.split(F.col(PATH), r"\|"), -1).isin(ends)
            )
        return rec.groupBy(PATH).agg(F.sum(CNT).alias(CNT))

    state = state.localCheckpoint(eager=True)
    results = [_record(state)]
    for _level in range(1, length):
        expanded = (
            state.join(und.withColumnRenamed(SRC, VID), on=VID)
            # shuffle_hash on a projection of the |V|-sized label side:
            # stats-independent build side (state row-counts per level are
            # unknown to Catalyst after the checkpoint), measured ~10% off
            # the level loop at sf0.1 vs the unhinted sort-merge pick
            .join(
                prim.select(F.col(VID).alias(DST), "label").hint("shuffle_hash"),
                on=DST,
            )
            .select(
                F.concat_ws("|", F.col(PATH), F.col(TYPE).cast("string"), F.col("label")).alias(PATH),
                F.col(DST).alias(VID),
                F.col(CNT),
            )
            .groupBy(PATH, VID)
            .agg(F.sum(CNT).alias(CNT))
            # checkpoint BEFORE the explosion-guard count so the guard and
            # the next level both read materialized blocks (no double compute)
            .localCheckpoint(eager=True)
        )
        state = expanded
        # Per-level record materialized EAGERLY: its row count IS the exact
        # distinct-path count, so the explosion guard is a free count() over
        # the tiny cached record instead of a full-state scan — and the
        # final union then reads cached rows instead of re-aggregating every
        # level's state.  (With end_labels the record is filtered, so the
        # guard falls back to one approx aggregate over the state blocks.)
        if end_labels is None:
            rec = _record(state).localCheckpoint(eager=True)
            n_paths = rec.count()
        else:
            rec = _record(state)
            n_paths = state.agg(F.approx_count_distinct(PATH).alias("n")).collect()[0]["n"]
        if n_paths > max_paths:
            raise RuntimeError(
                f"metapath state explosion: ~{n_paths} distinct paths > max_paths={max_paths}"
            )
        results.append(rec)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    out = out.groupBy(PATH).agg(F.sum(CNT).alias(CNT))
    und.unpersist()
    prim.unpersist()
    return out


def metapath_between(
    spark: SparkSession,
    edges: DataFrame,
    node_labels: DataFrame,
    start_vid: int,
    end_vid: int,
    length: int,
    max_paths: int = 1_000_000,
) -> DataFrame:
    """algo.metaPath / algo.metaPath.stream (impl/metapath/MetaPathAlgorithm.
    java): metapaths between two specific node INSTANCES — the ForInstances
    loop seeded at `start_vid`, recording only states sitting on `end_vid`."""
    und = _undirected_typed(edges).repartition(SRC).persist()
    prim = _primary_labels(node_labels).persist()
    seeds = (
        node_labels.filter(F.col(VID) == int(start_vid))
        .select(VID, F.explode("labels").alias("label"))
    )
    state = seeds.select(
        F.col("label").cast("string").alias(PATH), F.col(VID), F.lit(1).cast("long").alias(CNT)
    )

    def _record(st: DataFrame) -> DataFrame:
        return (
            st.filter(F.col(VID) == int(end_vid)).groupBy(PATH).agg(F.sum(CNT).alias(CNT))
        )

    state = state.localCheckpoint(eager=True)
    results = [_record(state)]
    for _level in range(1, length):
        state = (
            state.join(und.withColumnRenamed(SRC, VID), on=VID)
            .join(prim.select(F.col(VID).alias(DST), "label"), on=DST)
            .select(
                F.concat_ws("|", F.col(PATH), F.col(TYPE).cast("string"), F.col("label")).alias(PATH),
                F.col(DST).alias(VID),
                F.col(CNT),
            )
            .groupBy(PATH, VID)
            .agg(F.sum(CNT).alias(CNT))
            .localCheckpoint(eager=True)
        )
        n_paths = state.agg(F.approx_count_distinct(PATH).alias("n")).collect()[0]["n"]
        if n_paths > max_paths:
            raise RuntimeError(f"metapath state explosion: ~{n_paths} paths")
        results.append(_record(state))
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    out = out.groupBy(PATH).agg(F.sum(CNT).alias(CNT))
    und.unpersist()
    prim.unpersist()
    return out


def precompute_high_degree_metapaths(
    spark: SparkSession,
    edges: DataFrame,
    node_labels: DataFrame,
    length: int,
    ratio: float = 0.1,
    output_path: str | None = None,
    max_paths: int = 1_000_000,
) -> DataFrame:
    """algo.metaPathPrecomputeHighDegreeNodes
    (impl/metapath/MetaPathPrecomputeHighDegreeNodes.java:26,52-76): a
    PER-START-NODE metapath index over the top-`ratio` highest-degree nodes
    (the reference's hub mitigation — precompute what everyone will ask
    about).  The reference's result shape is
    HashMap<startNode, HashMap<metaPath, HashSet<endNode>>>; ours is the
    exploded relational twin [start, path, end] (distinct rows; `path` is
    the type|label|... expansion sequence WITHOUT the start label, matching
    MetaPathPrecomputeHighDegreeNodes.java:193's convention).  Optionally
    persisted for `read_precomputed_metapaths`."""
    from neo4j_graph_algorithms_spark.graph import EdgeFrame

    deg = EdgeFrame(edges.select(SRC, DST)).degrees("BOTH")
    n = deg.count()
    k = max(1, int(n * ratio))
    hubs = deg.orderBy(F.desc("degree"), F.asc(VID)).limit(k).select(VID)

    und = _undirected_typed(edges).repartition(SRC).persist()
    prim = _primary_labels(node_labels).persist()
    # set semantics (HashSet<endNode>): state rows are DISTINCT (start, path, vid)
    state = hubs.select(
        F.col(VID).alias("start"), F.lit("").alias(PATH), F.col(VID)
    )
    parts: list[DataFrame] = []
    for _level in range(1, length):
        state = (
            state.join(und.withColumnRenamed(SRC, VID), on=VID)
            .join(prim.select(F.col(VID).alias(DST), "label"), on=DST)
            .select(
                "start",
                F.concat_ws(
                    "|", F.when(F.col(PATH) != "", F.col(PATH)), F.col(TYPE).cast("string"),
                    F.col("label"),
                ).alias(PATH),
                F.col(DST).alias(VID),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_paths = state.agg(F.approx_count_distinct(PATH).alias("n")).collect()[0]["n"]
        if n_paths > max_paths:
            raise RuntimeError(f"metapath state explosion: ~{n_paths} paths")
        parts.append(state)
    if not parts:
        # length=1: the expansion loop never runs — no (start, path, end)
        # rows exist by the reference's convention (paths start at the first
        # expanded edge)
        und.unpersist()
        prim.unpersist()
        empty = spark.createDataFrame([], f"start long, {PATH} string, end long")
        if output_path:
            empty.write.mode("overwrite").parquet(output_path)
        return empty
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.select("start", PATH, F.col(VID).alias("end")).distinct()
    und.unpersist()
    prim.unpersist()
    if output_path:
        out.write.mode("overwrite").parquet(output_path)
    return out


def read_precomputed_metapaths(spark: SparkSession, path: str) -> DataFrame:
    """algo.readPrecomputedMetaPaths (ReadPrecomputedMetaPathsProc.java:27)."""
    return spark.read.parquet(path)


def compute_metapaths_schema_full(
    spark: SparkSession,
    edges: DataFrame,
    node_labels: DataFrame,
    length: int,
) -> DataFrame:
    """algo.computeAllMetaPathsSchemaFull
    (impl/metapath/ComputeAllMetaPathsSchemaFull.java): enumerate metapaths
    over the SCHEMA graph (label-level, no instance counts).  The schema is
    tiny, so the BFS runs driver-side over the collected `get_schema` rows
    and the result parallelizes back.  Returns [path] rows."""
    schema_rows = get_schema(spark, edges, node_labels).collect()
    adj: dict[int, list[tuple[int, int]]] = {}
    labels = set()
    for r in schema_rows:
        a, t, b = int(r["src_label"]), int(r["type"]), int(r["dst_label"])
        adj.setdefault(a, []).append((t, b))
        labels.add(a)
        labels.add(b)
        if a != b:
            adj.setdefault(b, []).append((t, a))
    paths: set[str] = set()
    frontier = [(str(lb), lb) for lb in sorted(labels)]
    paths.update(p for p, _ in frontier)
    for _ in range(1, length):
        nxt = []
        for p, lb in frontier:
            for t, nb in sorted(adj.get(lb, [])):
                np_ = f"{p}|{t}|{nb}"
                if np_ not in paths:
                    paths.add(np_)
                    nxt.append((np_, nb))
        frontier = nxt
    return spark.createDataFrame([(p,) for p in sorted(paths)], f"{PATH} string")


def compute_metapaths_schema_full_weights(
    spark: SparkSession,
    edges: DataFrame,
    node_labels: DataFrame,
    length: int,
) -> DataFrame:
    """algo.computeAllMetaPathsSchemaFullWeights
    (impl/metapath/ComputeAllMetaPathsSchemaFullWeights.java:18-417):
    schema-graph metapaths of 2..`length` labels, each weighted by the
    product over its consecutive label|type|label segments of

        w(l1,t,l2) = cnt(l1,t,l2) / Σ_all-ordered-schema-adjacencies cnt

    where cnt is the instance-edge count of the segment
    (computeTwoMPWeights:236-263; the Cypher `(:L1)-[:T]-(:L2)` count —
    each undirected edge once for l1≠l2, twice for l1=l2 because the
    symmetric pattern binds both orientations), the denominator sums over
    ordered schema adjacencies (getTwoMPWeights:215-233: each l1≠l2 schema
    edge appears from both endpoints), and segment lookup is
    orientation-insensitive (the dict holds both orientations).

    Unlike SchemaFull, the single-label seed paths are NOT emitted
    (only expansions reach duplicateFreeMetaPaths, :154-166).

    Returns [path, weight].  The schema graph is tiny by construction (the
    reference materializes it driver-side via apoc.meta.graph); segment
    counts are computed distributed, then the label-level enumeration runs
    on the collected schema."""
    und = _undirected_typed(edges)
    prim = _primary_labels(node_labels)
    seg_counts = (
        und.join(prim.select(F.col(VID).alias(SRC), F.col("label").alias("l1")), on=SRC)
        .join(prim.select(F.col(VID).alias(DST), F.col("label").alias("l2")), on=DST)
        .groupBy("l1", TYPE, "l2")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    # und holds each undirected edge in BOTH directions, so the grouped count
    # is already: l1≠l2 → edge count per orientation; l1==l2 → 2×edge count
    # (exactly the Cypher symmetric-binding convention).
    w2: dict[tuple[int, int, int], float] = {}
    total = 0
    for r in seg_counts:
        key = (int(r["l1"]), int(r[TYPE]), int(r["l2"]))
        w2[key] = w2.get(key, 0) + int(r["cnt"])
        total += int(r["cnt"])
    if total == 0:
        return spark.createDataFrame([], f"{PATH} string, weight double")
    # schema adjacency (undirected)
    adj: dict[int, set[tuple[int, int]]] = {}
    for l1, t, l2 in w2:
        adj.setdefault(l1, set()).add((t, l2))
        adj.setdefault(l2, set()).add((t, l1))
    rows: list[tuple[str, float]] = []
    frontier = [(str(lb), lb, 1.0) for lb in sorted(adj)]
    seen: set[str] = set()
    for _ in range(1, length):
        nxt = []
        for p, lb, w in frontier:
            for t, nb in sorted(adj.get(lb, set())):
                seg_w = w2.get((lb, t, nb), w2.get((nb, t, lb), 0)) / total
                np_ = f"{p}|{t}|{nb}"
                nw = w * seg_w
                if np_ not in seen:
                    seen.add(np_)
                    rows.append((np_, nw))
                    nxt.append((np_, nb, nw))
        frontier = nxt
    return spark.createDataFrame(rows or [], f"{PATH} string, weight double")


def get_schema(spark: SparkSession, edges: DataFrame, node_labels: DataFrame) -> DataFrame:
    """Derive the label-graph schema from the instance graph
    (algo.GetSchema, impl/metapath/getSchema/GetSchema.java:19-60):
    distinct (src_label, type, dst_label) triples over the undirected view,
    canonicalized src_label <= dst_label."""
    und = _undirected_typed(edges)
    prim = _primary_labels(node_labels)
    joined = (
        und.join(prim.select(F.col(VID).alias(SRC), F.col("label").alias("src_label")), on=SRC)
        .join(prim.select(F.col(VID).alias(DST), F.col("label").alias("dst_label")), on=DST)
    )
    return joined.select(
        F.least("src_label", "dst_label").alias("src_label"),
        F.col(TYPE),
        F.greatest("src_label", "dst_label").alias("dst_label"),
    ).distinct()


def filter_metapaths(
    metapaths: DataFrame,
    start_label: int | None = None,
    end_label: int | None = None,
) -> DataFrame:
    """Filter stored metapaths by start/end label
    (algo.filterMetaPaths, impl/FilterMetaPaths.java)."""
    out = metapaths
    if start_label is not None:
        out = out.filter(F.split(F.col(PATH), r"\|")[0] == str(int(start_label)))
    if end_label is not None:
        out = out.filter(
            F.element_at(F.split(F.col(PATH), r"\|"), -1) == str(int(end_label))
        )
    return out
