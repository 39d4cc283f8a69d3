from neo4j_graph_algorithms_spark.streaming.events import (  # noqa: F401
    run_windowed_events,
    stream_events,
    windowed_event_stream,
)
from neo4j_graph_algorithms_spark.streaming.ingest import (  # noqa: F401
    cocommit_increments,
    commit_activity,
    merge_edge_increments,
    stream_corpus,
)
