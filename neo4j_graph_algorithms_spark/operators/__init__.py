from neo4j_graph_algorithms_spark.operators.wcc import wcc, wcc_stats
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank, pagerank_scores
from neo4j_graph_algorithms_spark.operators.triangles import (
    edge_embeddedness,
    triangle_count,
    triangle_count_sampled,
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
    edge_betweenness,
)
from neo4j_graph_algorithms_spark.operators.mst import mst, mst_stats
from neo4j_graph_algorithms_spark.operators.louvain import louvain, modularity_df
from neo4j_graph_algorithms_spark.operators.reducer import (
    graph_reducer,
    label_dictionary,
)
from neo4j_graph_algorithms_spark.operators.hits import hits
from neo4j_graph_algorithms_spark.operators.motifs import triad_census
from neo4j_graph_algorithms_spark.operators.sweep import ppr_sweep
from neo4j_graph_algorithms_spark.operators.salsa import salsa
from neo4j_graph_algorithms_spark.operators.hyperball import (
    hyperball,
    hyperball_harmonic,
)
from neo4j_graph_algorithms_spark.operators.walks import (
    khop_fanout_sample,
    node2vec_walks,
    random_walks,
    walk_skipgram_pairs,
)
from neo4j_graph_algorithms_spark.operators.kcore import coreness, coreness_hindex, kcore
from neo4j_graph_algorithms_spark.operators.ktruss import ktruss, truss_stats
from neo4j_graph_algorithms_spark.operators.eigenvector import eigenvector
from neo4j_graph_algorithms_spark.operators.katz import katz
from neo4j_graph_algorithms_spark.operators.degrees import (
    degree_assortativity,
    degree_centrality,
    degree_distribution,
)
from neo4j_graph_algorithms_spark.operators.nodesim import (
    adamic_adar,
    node_similarity,
)
from neo4j_graph_algorithms_spark.operators.triangles import transitivity
from neo4j_graph_algorithms_spark.operators.dag import is_dag, topo_levels
from neo4j_graph_algorithms_spark.operators.sllpa import sllpa
from neo4j_graph_algorithms_spark.operators.fastrp import fastrp
from neo4j_graph_algorithms_spark.operators.louvain import conductance_df

__all__ = [
    "wcc",
    "wcc_stats",
    "pagerank",
    "pagerank_scores",
    "edge_embeddedness",
    "triangle_count",
    "triangle_count_sampled",
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
    "hits",
    "salsa",
    "triad_census",
    "ppr_sweep",
    "edge_betweenness",
    "hyperball",
    "hyperball_harmonic",
    "random_walks",
    "node2vec_walks",
    "walk_skipgram_pairs",
    "khop_fanout_sample",
    "kcore",
    "coreness",
    "coreness_hindex",
    "ktruss",
    "truss_stats",
    "eigenvector",
    "katz",
    "degree_centrality",
    "degree_assortativity",
    "degree_distribution",
    "node_similarity",
    "adamic_adar",
    "transitivity",
    "topo_levels",
    "is_dag",
    "sllpa",
    "fastrp",
    "conductance_df",
]
