"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every entry maps to an operator from SURVEY.md §2; the Spark
implementations live in neo4j_graph_algorithms_spark/, the DuckDB
oracles in neo4j_graph_algorithms_spark/oracles.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark import oracles
from neo4j_graph_algorithms_spark.operators.lpa import lpa
from neo4j_graph_algorithms_spark.operators.metapath import compute_all_metapaths
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.operators.triangles import (
    clustering_coefficients,
    triangle_count,
)
from neo4j_graph_algorithms_spark.operators.wcc import wcc, wcc_stats
from neo4j_graph_algorithms_spark.sources.tpch import (
    coorder_edges,
    lineseq_edges,
    typed_graph,
)

SF001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: PageRank (20 fixed iterations, reference defaults)
    on the directed line-seq part graph derived from sf0.001."""
    edges = lineseq_edges(spark, SF001)
    res = pagerank(spark, edges, max_iterations=20)
    return res.state.select("vid", F.round("rank", 6).alias("rank"))


# ---- queries ----------------------------------------------------------------


def _q_coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return coorder_edges(spark, sf_dir)


def _q_lineseq_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lineseq_edges(spark, sf_dir)


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = pagerank(spark, lineseq_edges(spark, sf_dir), max_iterations=20)
    return res.state.select("vid", F.round("rank", 6).alias("rank"))


def _q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wcc(spark, coorder_edges(spark, sf_dir)).state.select("vid", "comp")


def _q_wcc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = wcc_stats(wcc(spark, coorder_edges(spark, sf_dir)).state)
    return st.select(
        "set_count", "min_size", "max_size", F.round("avg_size", 6).alias("avg_size")
    )


def _q_triangle_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, total = triangle_count(spark, coorder_edges(spark, sf_dir))
    return spark.createDataFrame([(total,)], "triangles long")


def _q_triangles_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_node, _ = triangle_count(spark, coorder_edges(spark, sf_dir))
    return per_node


def _q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = clustering_coefficients(spark, coorder_edges(spark, sf_dir))
    return cc.select(
        "vid", "triangles", "degree", F.round("coefficient", 9).alias("coefficient")
    )


def _q_avg_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = clustering_coefficients(spark, coorder_edges(spark, sf_dir))
    return cc.agg(F.round(F.avg("coefficient"), 6).alias("avg_coefficient"))


def _q_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = lpa(spark, lineseq_edges(spark, sf_dir), max_iterations=3)
    return res.state.select("vid", "label")


def _q_metapath(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, labels = typed_graph(spark, sf_dir)
    return compute_all_metapaths(spark, edges, labels, length=3)


def _q_out_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = lineseq_edges(spark, sf_dir)
    od = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    return od.groupBy(F.col("outdeg").alias("degree")).agg(F.count("*").alias("n_nodes"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "coorder_edges": _q_coorder_edges,
        "lineseq_edges": _q_lineseq_edges,
        "pagerank_20iter": _q_pagerank,
        "wcc_components": _q_wcc,
        "wcc_stats": _q_wcc_stats,
        "triangle_total": _q_triangle_total,
        "triangles_per_node": _q_triangles_per_node,
        "clustering_coefficient": _q_clustering_coefficient,
        "avg_clustering_coefficient": _q_avg_clustering_coefficient,
        "lpa_3iter": _q_lpa,
        "metapath_len3": _q_metapath,
        "out_degree_distribution": _q_out_degree_distribution,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "coorder_edges": oracles.coorder_edges_sql(),
        "lineseq_edges": oracles.lineseq_edges_sql(),
        "pagerank_20iter": oracles.pagerank_sql(iterations=20),
        "wcc_components": oracles.wcc_sql(rounds=12),
        "wcc_stats": oracles.wcc_stats_sql(rounds=12),
        "triangle_total": oracles.triangle_total_sql(),
        "triangles_per_node": oracles.triangles_per_node_sql(),
        "clustering_coefficient": oracles.clustering_coefficient_sql(),
        "avg_clustering_coefficient": oracles.avg_clustering_coefficient_sql(),
        "lpa_3iter": oracles.lpa_sql(iterations=3),
        "metapath_len3": oracles.metapath_sql(length=3),
        "out_degree_distribution": oracles.out_degree_distribution_sql(),
    }
