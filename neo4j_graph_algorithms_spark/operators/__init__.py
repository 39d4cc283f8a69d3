from neo4j_graph_algorithms_spark.operators.wcc import wcc, wcc_stats
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank, pagerank_scores
from neo4j_graph_algorithms_spark.operators.triangles import (
    triangle_count,
    triangle_stream,
    clustering_coefficients,
    average_clustering_coefficient,
)
from neo4j_graph_algorithms_spark.operators.lpa import lpa
from neo4j_graph_algorithms_spark.operators.metapath import (
    compute_all_metapaths,
    compute_metapaths_schema_full,
    get_schema,
    filter_metapaths,
    metapath_between,
    precompute_high_degree_metapaths,
    read_precomputed_metapaths,
)
from neo4j_graph_algorithms_spark.operators.scc import scc, scc_stats
from neo4j_graph_algorithms_spark.operators.paths import (
    delta_stepping,
    shortest_paths,
    sssp,
)
from neo4j_graph_algorithms_spark.operators.msbfs import (
    closeness,
    harmonic,
    msbfs_depths,
)
from neo4j_graph_algorithms_spark.operators.betweenness import (
    betweenness,
    betweenness_sampled,
)
from neo4j_graph_algorithms_spark.operators.mst import mst, mst_stats
from neo4j_graph_algorithms_spark.operators.louvain import louvain, modularity_df
from neo4j_graph_algorithms_spark.operators.reducer import (
    graph_reducer,
    label_dictionary,
)

__all__ = [
    "wcc",
    "wcc_stats",
    "pagerank",
    "pagerank_scores",
    "triangle_count",
    "triangle_stream",
    "clustering_coefficients",
    "average_clustering_coefficient",
    "lpa",
    "compute_all_metapaths",
    "compute_metapaths_schema_full",
    "get_schema",
    "filter_metapaths",
    "metapath_between",
    "precompute_high_degree_metapaths",
    "read_precomputed_metapaths",
    "scc",
    "scc_stats",
    "sssp",
    "delta_stepping",
    "shortest_paths",
    "closeness",
    "harmonic",
    "msbfs_depths",
    "betweenness",
    "betweenness_sampled",
    "mst",
    "mst_stats",
    "louvain",
    "modularity_df",
    "graph_reducer",
    "label_dictionary",
]
