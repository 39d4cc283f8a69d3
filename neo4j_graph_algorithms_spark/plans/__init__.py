from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner, SuperstepResult

__all__ = ["SuperstepRunner", "SuperstepResult"]
