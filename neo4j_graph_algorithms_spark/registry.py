"""Named-graph cache: algo.graph.load / info / remove.

The reference stores loaded graphs in a static ConcurrentHashMap so
algorithms can reference `graph:'<name>'` without reloading
(LoadGraphProc.java:50-148, core/loadgraph/LoadGraphFactory.java:30-79).
Spark analogue: persist the EdgeFrame (MEMORY_AND_DISK) under a name;
`load_graph(name)` resolves it; `remove_graph` unpersists.  `list_procedures`
is the algo.list surface (ListProc.java:42).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from neo4j_graph_algorithms_spark.graph import EdgeFrame


@dataclass
class _Entry:
    graph: EdgeFrame
    stats: dict = field(default_factory=dict)


class GraphRegistry:
    """Session-scoped named-graph cache (LoadGraphFactory semantics)."""

    def __init__(self) -> None:
        self._graphs: dict[str, _Entry] = {}

    def load(self, name: str, edges: EdgeFrame | DataFrame) -> dict:
        """Persist + register under `name`; returns load stats
        (LoadGraphProc.load yields name/nodes/relationships,
        LoadGraphProc.java:83-108).  Reloading a name replaces it."""
        ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
        if name in self._graphs:
            self.remove(name)
        ef.persist()
        n_rels = ef.df.count()
        n_nodes = ef.vertices().count()
        stats = {"name": name, "nodes": n_nodes, "relationships": n_rels}
        self._graphs[name] = _Entry(graph=ef, stats=stats)
        return stats

    def get(self, name: str) -> EdgeFrame:
        """Resolve `graph:'<name>'` (LoadGraphFactory.java:40-43)."""
        if name not in self._graphs:
            raise KeyError(f"no graph loaded under name {name!r}")
        return self._graphs[name].graph

    def info(self, name: str) -> dict:
        """algo.graph.info row; `exists` flag like the reference."""
        if name not in self._graphs:
            return {"name": name, "exists": False}
        return {**self._graphs[name].stats, "exists": True}

    def remove(self, name: str) -> bool:
        """algo.graph.remove: unpersist + forget (LoadGraphProc.java:120-148)."""
        entry = self._graphs.pop(name, None)
        if entry is None:
            return False
        entry.graph.unpersist()
        return True

    def names(self) -> list[str]:
        return sorted(self._graphs)


# The procedure catalogue for algo.list (ListProc.java:42): operator name →
# import path of the implementing callable.
PROCEDURES: dict[str, str] = {
    "algo.pageRank": "neo4j_graph_algorithms_spark.operators.pagerank.pagerank",
    "algo.unionFind": "neo4j_graph_algorithms_spark.operators.wcc.wcc",
    "algo.unionFind.mscoloring": "neo4j_graph_algorithms_spark.operators.wcc.wcc",
    # the reference's parallel-chunked UF family (queue / forkJoin / fjMerge,
    # UnionFindProc2/3/4.java) = same outputs, parallel local-merge plan;
    # our Tier B bucket-local collapse is that plan
    "algo.unionFind.queue": "neo4j_graph_algorithms_spark.csr.wcc.wcc_csr",
    "algo.unionFind.forkJoin": "neo4j_graph_algorithms_spark.csr.wcc.wcc_csr",
    "algo.unionFind.forkJoinMerge": "neo4j_graph_algorithms_spark.csr.wcc.wcc_csr",
    "algo.labelPropagation": "neo4j_graph_algorithms_spark.operators.lpa.lpa",
    # Tier B twin: cogrouped pandas vote kernels, same output contract
    "algo.labelPropagation.csr": "neo4j_graph_algorithms_spark.csr.lpa.lpa_csr",
    "algo.triangleCount": "neo4j_graph_algorithms_spark.operators.triangles.triangle_count",
    # .forkJoin = the reference's partitioned parallel variant; our Tier B
    # per-partition CSR intersection kernel is the analogue
    "algo.triangleCount.forkJoin": "neo4j_graph_algorithms_spark.csr.triangles.triangle_count_csr",
    "algo.triangle.stream": "neo4j_graph_algorithms_spark.operators.triangles.triangle_stream",
    "algo.scc": "neo4j_graph_algorithms_spark.operators.scc.scc",
    # Tarjan variants (iterative/tuned/recursive) and multistep/FW-BW all
    # compute the same partition; one coloring+FW-BW dataflow serves them
    "algo.scc.iterative": "neo4j_graph_algorithms_spark.operators.scc.scc",
    "algo.scc.multistep": "neo4j_graph_algorithms_spark.operators.scc.scc",
    "algo.scc.forwardBackward": "neo4j_graph_algorithms_spark.operators.scc.scc",
    # algo.shortestPath streams the path node sequence; shortest_path
    # reconstructs it (sssp serves the distances-only stream mode)
    "algo.shortestPath": "neo4j_graph_algorithms_spark.operators.paths.shortest_path",
    "algo.shortestPath.stream": "neo4j_graph_algorithms_spark.operators.paths.sssp",
    # Tier B twin: cogrouped pandas relaxation kernels, same output contract
    "algo.shortestPath.stream.csr": "neo4j_graph_algorithms_spark.csr.paths.sssp_csr",
    "algo.shortestPath.deltaStepping": "neo4j_graph_algorithms_spark.operators.paths.delta_stepping",
    "algo.shortestPaths": "neo4j_graph_algorithms_spark.operators.paths.shortest_paths",
    "algo.allShortestPaths.stream.weighted": "neo4j_graph_algorithms_spark.operators.paths.all_shortest_paths_weighted",
    "algo.closeness": "neo4j_graph_algorithms_spark.operators.msbfs.closeness",
    # Tier B twins: cogrouped pandas bitmask kernels, same output contract
    "algo.closeness.csr": "neo4j_graph_algorithms_spark.csr.msbfs.closeness_csr",
    "algo.harmonic.csr": "neo4j_graph_algorithms_spark.csr.msbfs.harmonic_csr",
    "algo.harmonic": "neo4j_graph_algorithms_spark.operators.msbfs.harmonic",
    "algo.allShortestPaths.stream": "neo4j_graph_algorithms_spark.operators.msbfs.all_shortest_paths",
    # beyond the reference: Kleinberg hubs/authorities on the same runtime
    "algo.hits": "neo4j_graph_algorithms_spark.operators.hits.hits",
    "algo.salsa": "neo4j_graph_algorithms_spark.operators.salsa.salsa",
    # beyond the reference: deterministic GNN-sampling walks
    "algo.randomWalk": "neo4j_graph_algorithms_spark.operators.walks.random_walks",
    # beyond the reference: HLL neighborhood sketches (Boldi-Vigna HyperBall)
    "algo.hyperball": "neo4j_graph_algorithms_spark.operators.hyperball.hyperball",
    "algo.hyperball.harmonic": "neo4j_graph_algorithms_spark.operators.hyperball.hyperball_harmonic",
    # beyond the reference: GDS-catalogue twins on the same runtime
    "algo.node2vec.walks": "neo4j_graph_algorithms_spark.operators.walks.node2vec_walks",
    "algo.khopSample": "neo4j_graph_algorithms_spark.operators.walks.khop_fanout_sample",
    "algo.kcore": "neo4j_graph_algorithms_spark.operators.kcore.kcore",
    "algo.coreness": "neo4j_graph_algorithms_spark.operators.kcore.coreness",
    "algo.coreness.hindex": "neo4j_graph_algorithms_spark.operators.kcore.coreness_hindex",
    "algo.coreness.csr": "neo4j_graph_algorithms_spark.csr.coreness.coreness_hindex_csr",
    "algo.ktruss": "neo4j_graph_algorithms_spark.operators.ktruss.ktruss",
    "algo.scoreWeightedCore": "neo4j_graph_algorithms_spark.operators.kcore.s_core",
    "algo.sageAggregate": "neo4j_graph_algorithms_spark.pipeline.sage.sage_aggregate",
    "algo.sageAggregate.csr": "neo4j_graph_algorithms_spark.csr.sage.sage_aggregate_csr",
    "algo.twoHopBall": "neo4j_graph_algorithms_spark.operators.degrees.two_hop_ball_sizes",
    "algo.degree.knnCurve": "neo4j_graph_algorithms_spark.operators.degrees.avg_neighbor_degree",
    "algo.onion.spectrum": "neo4j_graph_algorithms_spark.operators.onion.onion_spectrum",
    "algo.onion": "neo4j_graph_algorithms_spark.operators.onion.onion_decomposition",
    "algo.bowtie": "neo4j_graph_algorithms_spark.operators.bowtie.bowtie_decomposition",
    "algo.whoToFollow": "neo4j_graph_algorithms_spark.operators.wtf.who_to_follow",
    "algo.mis": "neo4j_graph_algorithms_spark.operators.mis.maximal_independent_set",
    "algo.matching": "neo4j_graph_algorithms_spark.operators.matching.maximal_matching",
    "algo.coloring": "neo4j_graph_algorithms_spark.operators.coloring.greedy_coloring",
    "algo.coarsen": "neo4j_graph_algorithms_spark.operators.coarsen.coarsen_by_matching",
    "algo.shortestPath.astar": "neo4j_graph_algorithms_spark.operators.astar.astar_path",
    "algo.betweenness.edges": "neo4j_graph_algorithms_spark.operators.betweenness.edge_betweenness",
    "algo.effectiveDiameter": "neo4j_graph_algorithms_spark.operators.hyperball.effective_diameter",
    "algo.eigenvector": "neo4j_graph_algorithms_spark.operators.eigenvector.eigenvector",
    "algo.katz": "neo4j_graph_algorithms_spark.operators.katz.katz",
    "algo.degree": "neo4j_graph_algorithms_spark.operators.degrees.degree_centrality",
    "algo.degree.assortativity": "neo4j_graph_algorithms_spark.operators.degrees.degree_assortativity",
    "algo.nodeSimilarity": "neo4j_graph_algorithms_spark.operators.nodesim.node_similarity",
    "algo.adamicAdar": "neo4j_graph_algorithms_spark.operators.nodesim.adamic_adar",
    "algo.triangle.transitivity": "neo4j_graph_algorithms_spark.operators.triangles.transitivity",
    "algo.triangle.sampled": "neo4j_graph_algorithms_spark.operators.triangles.triangle_count_sampled",
    "algo.edgeEmbeddedness": "neo4j_graph_algorithms_spark.operators.triangles.edge_embeddedness",
    "algo.triadCensus": "neo4j_graph_algorithms_spark.operators.motifs.triad_census",
    "algo.pprSweep": "neo4j_graph_algorithms_spark.operators.sweep.ppr_sweep",
    "algo.topoLevels": "neo4j_graph_algorithms_spark.operators.dag.topo_levels",
    "algo.isDag": "neo4j_graph_algorithms_spark.operators.dag.is_dag",
    "algo.sllpa": "neo4j_graph_algorithms_spark.operators.sllpa.sllpa",
    "algo.fastRP": "neo4j_graph_algorithms_spark.operators.fastrp.fastrp",
    "algo.fastRP.csr": "neo4j_graph_algorithms_spark.csr.fastrp.fastrp_csr",
    "algo.conductance": "neo4j_graph_algorithms_spark.operators.louvain.conductance_df",
    "algo.bipartiteProject": "neo4j_graph_algorithms_spark.graph.bipartite_project",
    "algo.betweenness": "neo4j_graph_algorithms_spark.operators.betweenness.betweenness",
    "algo.betweenness.sampled": "neo4j_graph_algorithms_spark.operators.betweenness.betweenness_sampled",
    "algo.mst": "neo4j_graph_algorithms_spark.operators.mst.mst",
    "algo.louvain": "neo4j_graph_algorithms_spark.operators.louvain.louvain",
    "algo.metaPath": "neo4j_graph_algorithms_spark.operators.metapath.metapath_between",
    "algo.metaPathPrecomputeHighDegreeNodes": "neo4j_graph_algorithms_spark.operators.metapath.precompute_high_degree_metapaths",
    "algo.readPrecomputedMetaPaths": "neo4j_graph_algorithms_spark.operators.metapath.read_precomputed_metapaths",
    "algo.computeAllMetaPathsSchemaFull": "neo4j_graph_algorithms_spark.operators.metapath.compute_metapaths_schema_full",
    "algo.computeAllMetaPathsSchemaFullWeights": "neo4j_graph_algorithms_spark.operators.metapath.compute_metapaths_schema_full_weights",
    "algo.getLabelIdToLabelNameMapping": "neo4j_graph_algorithms_spark.operators.reducer.label_dictionary",
    "algo.computeAllMetaPaths": "neo4j_graph_algorithms_spark.operators.metapath.compute_all_metapaths",
    "algo.computeAllMetaPathsBetweenTypes": "neo4j_graph_algorithms_spark.operators.metapath.compute_all_metapaths",
    "algo.computeAllMetaPathsForInstances": "neo4j_graph_algorithms_spark.operators.metapath.compute_all_metapaths",
    "algo.GetSchema": "neo4j_graph_algorithms_spark.operators.metapath.get_schema",
    "algo.filterMetaPaths": "neo4j_graph_algorithms_spark.operators.metapath.filter_metapaths",
    "algo.graphReducer": "neo4j_graph_algorithms_spark.operators.reducer.graph_reducer",
    "algo.graph.load": "neo4j_graph_algorithms_spark.registry.GraphRegistry.load",
    "algo.graph.info": "neo4j_graph_algorithms_spark.registry.GraphRegistry.info",
    "algo.graph.remove": "neo4j_graph_algorithms_spark.registry.GraphRegistry.remove",
    "algo.isFinite": "neo4j_graph_algorithms_spark.functions.is_finite",
    "algo.isInfinite": "neo4j_graph_algorithms_spark.functions.is_infinite",
    "algo.Infinity": "neo4j_graph_algorithms_spark.functions.infinity",
}


def list_procedures(filter_substr: str | None = None) -> list[dict]:
    """algo.list rows: [{name, implementation}] (ListProc.java:42-60)."""
    out = [
        {"name": k, "implementation": v}
        for k, v in sorted(PROCEDURES.items())
        if filter_substr is None or filter_substr in k
    ]
    return out
