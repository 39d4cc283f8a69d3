from neo4j_graph_algorithms_spark.streaming.ingest import (  # noqa: F401
    cocommit_increments,
    commit_activity,
    merge_edge_increments,
    stream_corpus,
)
