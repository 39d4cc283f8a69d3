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
    get_schema,
    filter_metapaths,
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
    "get_schema",
    "filter_metapaths",
]
