"""PySpark-native link-graph analytics engine.

A from-scratch re-expression of the query surface of
meta-exp/neo4j-graph-algorithms (PageRank, connected components, label
propagation, triangle counting, metapath computation, ...) as iterative
DataFrame transforms.  Semantics follow the reference (cited per-module as
``/root/reference/<path>:<line>``); the execution strategy is pure Spark:
declarative plans for Catalyst, shuffles as the superstep barriers, Arrow /
pandas UDFs only where built-in operators cannot express the kernel.
"""

from neo4j_graph_algorithms_spark.graph import EdgeFrame
from neo4j_graph_algorithms_spark.config import ProcedureConfig

__all__ = ["EdgeFrame", "ProcedureConfig"]
__version__ = "0.1.0"
