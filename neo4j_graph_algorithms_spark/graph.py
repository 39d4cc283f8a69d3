"""Graph core: the edge-table abstraction every operator consumes.

The reference's single data abstraction is an immutable integer-indexed
directed multigraph snapshot (reference core/.../api/Graph.java:27).  Ours is
a pair of DataFrames:

    edges    : [src: long, dst: long, weight: double]
    vertices : [vid: long]            (optional; derived from edges if absent)

Construction semantics reproduced from the reference loader:
  * weight accumulation / parallel-edge dedup  — groupBy(src,dst).sum(weight)
    (HeavyCypherGraphFactory.java:143-158)
  * asUndirected: each edge loaded in both directions
    (HugeGraphFactory.java:82)
  * canonicalization src<dst for undirected-simple algorithms
    (RawValues.combineSorted, core/utils/RawValues.java:43-51)
  * direction selection OUT/IN/BOTH (ProcedureConfiguration.java:270-272)
  * degree-balanced repartitioning — the reference packs node partitions by
    accumulated out-degree (impl/PageRank.java:184-218); we repartition the
    edge table by hashed src so each task holds ~equal edge counts, and salt
    hub destinations for the aggregation side.

Everything is lazy; `.persist()` decisions belong to the caller / registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SRC, DST, WEIGHT, VID = "src", "dst", "weight", "vid"


class EdgeFrame:
    """Immutable wrapper over an edge DataFrame with graph-construction ops.

    All methods return new EdgeFrames / DataFrames; nothing mutates.
    """

    def __init__(self, edges: DataFrame, weighted: bool | None = None):
        cols = edges.columns
        if SRC not in cols or DST not in cols:
            raise ValueError(f"edge frame needs columns ({SRC},{DST}); got {cols}")
        if WEIGHT not in cols:
            edges = edges.withColumn(WEIGHT, F.lit(1.0))
            if weighted is None:
                weighted = False
        elif weighted is None:
            weighted = True
        self.df = edges.select(
            F.col(SRC).cast("long"), F.col(DST).cast("long"), F.col(WEIGHT).cast("double")
        )
        self.weighted = weighted

    # -- construction ------------------------------------------------------

    @classmethod
    def from_df(
        cls,
        df: DataFrame,
        src: str = SRC,
        dst: str = DST,
        weight: str | None = None,
        default_weight: float = 1.0,
    ) -> "EdgeFrame":
        """Project arbitrary (src,dst[,weight]) columns into an EdgeFrame —
        the 'graph = result of any query' front door (the reference's Cypher
        projection, HeavyCypherGraphFactory.java:93-108)."""
        sel = [F.col(src).alias(SRC), F.col(dst).alias(DST)]
        if weight is not None:
            sel.append(F.coalesce(F.col(weight), F.lit(default_weight)).cast("double").alias(WEIGHT))
        return cls(df.select(*sel), weighted=weight is not None)

    # -- loader semantics ---------------------------------------------------

    def accumulate_weights(self) -> "EdgeFrame":
        """Dedup parallel edges, summing weights (HeavyCypherGraphFactory.java:143-158)."""
        out = self.df.groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT))
        return EdgeFrame(out, weighted=self.weighted)

    def as_undirected(self) -> "EdgeFrame":
        """Load each edge in both directions (HugeGraphFactory.java:82).
        Self-loops are emitted once."""
        rev = self.df.filter(F.col(SRC) != F.col(DST)).select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(WEIGHT)
        )
        return EdgeFrame(self.df.unionByName(rev), weighted=self.weighted)

    def canonical(self) -> "EdgeFrame":
        """Undirected-simple view: src<dst, parallel/reverse duplicates
        collapsed (combineSorted semantics, RawValues.java:47-51).
        Self-loops dropped (the reference's triangle/undirected algorithms
        never see them)."""
        out = (
            self.df.filter(F.col(SRC) != F.col(DST))
            .select(
                F.least(SRC, DST).alias(SRC),
                F.greatest(SRC, DST).alias(DST),
                F.col(WEIGHT),
            )
            .groupBy(SRC, DST)
            .agg(F.sum(WEIGHT).alias(WEIGHT))
        )
        return EdgeFrame(out, weighted=self.weighted)

    def with_direction(self, direction: str) -> "EdgeFrame":
        """OUTGOING: as-is; INCOMING: reversed; BOTH: both directions
        (ProcedureConfiguration.java:270-272)."""
        d = direction.upper()
        if d == "OUTGOING":
            return self
        if d == "INCOMING":
            return EdgeFrame(
                self.df.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT),
                weighted=self.weighted,
            )
        if d == "BOTH":
            return self.as_undirected()
        raise ValueError(f"unknown direction {direction!r}")

    def filter_weight(self, threshold: float) -> "EdgeFrame":
        """Weighted-union threshold predicate: keep weight >= threshold
        (GraphUnionFind.java:82-99; compare is >=, :90)."""
        return EdgeFrame(self.df.filter(F.col(WEIGHT) >= threshold), weighted=self.weighted)

    # -- derived tables ------------------------------------------------------

    def vertices(self) -> DataFrame:
        """Distinct vertex ids appearing at either end."""
        return (
            self.df.select(F.col(SRC).alias(VID))
            .unionByName(self.df.select(F.col(DST).alias(VID)))
            .distinct()
        )

    def degrees(self, direction: str = "OUTGOING") -> DataFrame:
        """[vid, degree] for the chosen direction (api/Degrees.java:121-124).
        Vertices with zero degree in that direction are absent — callers that
        need them (e.g. clustering coefficient over all nodes) left-join
        against `vertices()`."""
        d = direction.upper()
        if d == "OUTGOING":
            key = SRC
            df = self.df
        elif d == "INCOMING":
            key = DST
            df = self.df
        else:  # BOTH: count each incident edge once per endpoint
            return (
                self.df.select(F.col(SRC).alias(VID))
                .unionByName(self.df.select(F.col(DST).alias(VID)))
                .groupBy(VID)
                .agg(F.count("*").alias("degree"))
            )
        return df.groupBy(F.col(key).alias(VID)).agg(F.count("*").alias("degree"))

    # -- physical layout -----------------------------------------------------

    def repartition_by_source(self, num_partitions: int | None = None) -> "EdgeFrame":
        """Hash-partition edges by src so each superstep's send side is
        co-located with vertex state partitioned the same way.  This is the
        Spark analogue of the reference's degree-balanced node partitions
        (impl/PageRank.java:184-218): hashing src spreads each vertex's
        out-edges into one partition while AQE balances sizes."""
        if num_partitions:
            return EdgeFrame(self.df.repartition(num_partitions, SRC), weighted=self.weighted)
        return EdgeFrame(self.df.repartition(SRC), weighted=self.weighted)

    def persist(self, storage_level: str = "MEMORY_AND_DISK") -> "EdgeFrame":
        from pyspark import StorageLevel

        self.df.persist(getattr(StorageLevel, storage_level))
        return self

    def unpersist(self) -> "EdgeFrame":
        self.df.unpersist()
        return self

    def count(self) -> int:
        return self.df.count()


def hub_salting(
    edges: DataFrame,
    degrees: DataFrame,
    hub_threshold: int,
    salt_buckets: int,
) -> DataFrame:
    """Attach a `salt` column for two-phase aggregation on skewed dst keys.

    Hub vertices (BOTH-degree >= hub_threshold; the reference's analogue is
    high-degree precompute, impl/metapath/MetaPathPrecomputeHighDegreeNodes.java)
    get salt = pmod(hash(src), salt_buckets); everyone else salt = 0.
    Aggregations then run groupBy(dst, salt) → groupBy(dst), splitting a hub's
    incoming partial sums over `salt_buckets` reducers.
    """
    hubs = degrees.filter(F.col("degree") >= hub_threshold).select(
        F.col(VID).alias(DST), F.lit(True).alias("_is_hub")
    )
    out = edges.join(F.broadcast(hubs), on=DST, how="left").withColumn(
        "salt",
        F.when(F.col("_is_hub"), F.pmod(F.xxhash64(SRC), F.lit(salt_buckets))).otherwise(F.lit(0)),
    )
    return out.drop("_is_hub")


def bipartite_project(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """[src, dst, weight] — one-mode projection of a bipartite relation:
    items sharing a group become a canonical (src < dst) edge, weight =
    number of shared groups.

    The library form of the engine's graph constructions (co-commit from
    (commit, file) — sources/derive.py:73, co-order from (order, part) —
    sources/tpch.py:27; the reference's loader builds the same projection
    imperatively from Neo4j relationships, core/heavyweight/
    HeavyGraphFactory.java).

    `max_group_size` is the clique cap (same convention as cocommit_edges):
    a group of n items emits n·(n−1)/2 pairs, so one hot group — a
    vendored-dependency commit, a best-seller part — can emit millions of
    rows; groups are truncated to their first `max_group_size` items in
    item order, deterministically.

    Scale shape: one distinct, one bounded per-group window (never global),
    one self-equi-join on the group key, one map-side-combined count
    aggregation.  The join key is the group id — salt or cap when group
    cardinality is skewed.
    """
    from pyspark.sql import Window

    rel = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    if max_group_size is not None:
        w = Window.partitionBy("_g").orderBy("_i")
        rel = (
            rel.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_group_size)
            .select("_g", "_i")
        )
    a, b = rel.alias("a"), rel.alias("b")
    return (
        a.join(b, on="_g")
        .filter(F.col("a._i") < F.col("b._i"))
        .select(F.col("a._i").alias(SRC), F.col("b._i").alias(DST))
        .groupBy(SRC, DST)
        .agg(F.count("*").cast("double").alias("weight"))
    )
