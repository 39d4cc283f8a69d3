from neo4j_graph_algorithms_spark.operators.wcc import wcc, wcc_stats
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank

__all__ = ["wcc", "wcc_stats", "pagerank"]
