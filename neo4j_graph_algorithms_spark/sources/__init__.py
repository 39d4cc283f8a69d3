from neo4j_graph_algorithms_spark.sources.corpus import synthesize_corpus, with_sha
from neo4j_graph_algorithms_spark.sources.derive import (
    corpus_vertices,
    cocommit_edges,
    import_edges,
    check_sha_invariant,
)

__all__ = [
    "synthesize_corpus",
    "with_sha",
    "corpus_vertices",
    "cocommit_edges",
    "import_edges",
    "check_sha_invariant",
]
