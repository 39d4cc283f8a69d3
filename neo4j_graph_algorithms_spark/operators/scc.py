"""Strongly connected components (algo.scc family).

The reference ships Tarjan variants plus MultiStep (trim + FW-BW +
coloring) — StronglyConnectedComponentsProc.java:67-384,
impl/multistepscc/*.java.  Tarjan's stack DFS is inherently sequential, so
the Spark-native formulation is the reference's *own* parallel route, the
coloring algorithm (impl/multistepscc/MultiStepColoring.java semantics):

  repeat until no unassigned vertices:
    1. trim: peel size-1 SCCs (vertices with no in- or out-edges among the
       unassigned) — MultiStepTrim.java semantics;
    2. color fixpoint: color(v) = max(vid(v), colors of in-neighbors) until
       stable → color(v) = max vid that can reach v;
    3. backward sweep: the SCC rooted at color c = vertices with color c
       that can reach c through same-colored vertices (the FW∩BW
       intersection of ForwardBackwardScc.java, expressed as an iterative
       left-semi frontier instead of retainAll);
    4. assign comp = c (canonicalized afterwards to min member id), remove,
       repeat on the rest.

Component ids are canonicalized to MIN member id (same convention as WCC;
the reference asserts partition structure only, SCCTest/MultistepSCCProcTest).

Scale notes: every inner loop is join+groupBy on (vid); the color fixpoint
uses the same pointer-free max-propagation as MSColoring; each outer round
removes at least the largest-root SCC plus all trimmed singletons, and
real link graphs finish in a handful of rounds (one giant SCC + tails).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame

COMP = "comp"


def scc(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    max_outer: int = 50,
    max_color_rounds: int = 200,
) -> DataFrame:
    """[vid, comp] with comp = min member id of the strongly connected
    component.  Directed edges; parallel edges/self-loops tolerated."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.df.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    e.persist()

    # vertices come from the UNFILTERED edge set: a vertex with only a
    # self-loop is still a (singleton) SCC
    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    remaining = verts.localCheckpoint(eager=True)
    assigned_parts: list[DataFrame] = []

    for _ in range(max_outer):
        if remaining.rdd.isEmpty():
            break
        # edges among remaining vertices only
        er = (
            e.join(remaining.withColumnRenamed(VID, SRC), on=SRC, how="left_semi")
            .join(remaining.withColumnRenamed(VID, DST), on=DST, how="left_semi")
            .localCheckpoint(eager=True)
        )
        # 1. trim: no out-edges or no in-edges → singleton SCC
        srcs = er.select(F.col(SRC).alias(VID)).distinct()
        dsts = er.select(F.col(DST).alias(VID)).distinct()
        core = remaining.join(srcs, on=VID, how="left_semi").join(
            dsts, on=VID, how="left_semi"
        )
        trimmed = remaining.join(core, on=VID, how="left_anti")
        assigned_parts.append(trimmed.select(VID, F.col(VID).alias(COMP)))
        if core.rdd.isEmpty():
            remaining = core
            break
        core = core.localCheckpoint(eager=True)
        ec = (
            er.join(core.withColumnRenamed(VID, SRC), on=SRC, how="left_semi")
            .join(core.withColumnRenamed(VID, DST), on=DST, how="left_semi")
            .localCheckpoint(eager=True)
        )

        # 2. color fixpoint: forward max-propagation (color reaches along edges)
        color = core.select(VID, F.col(VID).alias("color"))
        for _r in range(max_color_rounds):
            pushed = (
                ec.join(color.withColumnRenamed(VID, SRC), on=SRC)
                .select(F.col(DST).alias(VID), "color")
            )
            new_color = (
                color.unionByName(pushed).groupBy(VID).agg(F.max("color").alias("color"))
            ).localCheckpoint(eager=True)
            changed = (
                new_color.alias("n")
                .join(color.alias("o"), on=VID)
                .filter(F.col("n.color") != F.col("o.color"))
                .count()
            )
            color = new_color
            if changed == 0:
                break

        # 3. backward sweep within color class: frontier from each root c
        #    following edges backwards, restricted to vertices of color c.
        edge_col = (
            ec.join(color.withColumnRenamed(VID, SRC).withColumnRenamed("color", "c_src"), on=SRC)
            .join(color.withColumnRenamed(VID, DST).withColumnRenamed("color", "c_dst"), on=DST)
            .filter(F.col("c_src") == F.col("c_dst"))
            .select(SRC, DST, F.col("c_src").alias("color"))
            .localCheckpoint(eager=True)
        )
        in_scc = color.filter(F.col(VID) == F.col("color")).select(VID, "color")
        frontier = in_scc
        while True:
            # predecessors u of frontier members v with color(u) == color(v)
            preds = (
                edge_col.join(
                    frontier.withColumnRenamed(VID, DST), on=[DST, "color"]
                )
                .select(F.col(SRC).alias(VID), "color")
                .distinct()
            )
            new_members = preds.join(in_scc, on=VID, how="left_anti").localCheckpoint(eager=True)
            if new_members.rdd.isEmpty():
                break
            in_scc = in_scc.unionByName(new_members).localCheckpoint(eager=True)
            frontier = new_members
        assigned_parts.append(in_scc.select(VID, F.col("color").alias(COMP)))
        remaining = core.join(in_scc, on=VID, how="left_anti").localCheckpoint(eager=True)

    if not assigned_parts:
        e.unpersist()
        return spark.createDataFrame([], f"{VID} long, {COMP} long")
    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    # canonicalize comp ids to min member id
    canon = out.groupBy(COMP).agg(F.min(VID).alias("_min"))
    res = out.join(canon, on=COMP).select(VID, F.col("_min").alias(COMP))
    e.unpersist()
    return res


def scc_stats(components: DataFrame) -> DataFrame:
    """setCount / maxSetSize / minSetSize (MultistepSCCProcTest YIELD)."""
    sizes = components.groupBy(COMP).agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("set_count"),
        F.min("size").alias("min_set_size"),
        F.max("size").alias("max_set_size"),
    )
