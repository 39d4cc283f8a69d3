"""Shared SparkSession + fixture graphs lifted from the reference tests.

Fixture data is defined in FIXTURES.md (verbatim from
/root/reference/tests/...); node names map to integer vids a=0, b=1, ...
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="linkgraph-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


def edge_df(spark, pairs, weights=None):
    """pairs: list[(src,dst)] ints; weights: optional parallel list."""
    if weights is None:
        rows = [(int(s), int(d), 1.0) for s, d in pairs]
    else:
        rows = [(int(s), int(d), float(w)) for (s, d), w in zip(pairs, weights)]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def names_to_ids(names: str):
    """'a..z' node naming → {name: index}."""
    return {n: i for i, n in enumerate(names)}


def parse_edges(spec: str, ids: dict[str, int]):
    """'b>c, c>b' → [(1,2),(2,1)]."""
    out = []
    for part in spec.replace(" ", "").split(","):
        s, d = part.split(">")
        out.append((ids[s], ids[d]))
    return out


# ---- F1: PageRank wiki graph (PageRankWikiTest.java:61-141) -----------------

F1_NODES = "abcdefghijk"
F1_EDGES = "b>c, c>b, d>a, d>b, e>b, e>d, e>f, f>b, f>e, g>b, g>e, h>b, h>e, i>b, i>e, j>e, k>e"
F1_EXPECTED = {
    "a": 0.3040965,
    "b": 3.5658695,
    "c": 3.180981,
    "d": 0.3625935,
    "e": 0.7503465,
    "f": 0.3625935,
    "g": 0.15,
    "h": 0.15,
    "i": 0.15,
    "j": 0.15,
    "k": 0.15,
}


@pytest.fixture(scope="session")
def f1_pagerank_wiki(spark):
    ids = names_to_ids(F1_NODES)
    return edge_df(spark, parse_edges(F1_EDGES, ids)), ids


# ---- F2: PageRank label/type-filtered graph (PageRankTest.java:64-143) ------
# graph actually loaded: Label1 nodes a..j, TYPE1 edges only

F2_NODES = "abcdefghij"
F2_EDGES = "b>c, c>b, d>a, d>b, e>b, e>d, e>f, f>b, f>e"
F2_EXPECTED = {
    "a": 0.243007,
    "b": 1.9183995,
    "c": 1.7806315,
    "d": 0.21885,
    "e": 0.243007,
    "f": 0.21885,
    "g": 0.15,
    "h": 0.15,
    "i": 0.15,
    "j": 0.15,
}


@pytest.fixture(scope="session")
def f2_pagerank_labeled(spark):
    ids = names_to_ids(F2_NODES)
    vertices = spark.createDataFrame([(i,) for i in ids.values()], "vid long")
    return edge_df(spark, parse_edges(F2_EDGES, ids)), vertices, ids


# ---- F3: Union-Find graph (UnionFindProcIntegrationTest.java:55-79) ---------
# A..J → 0..9; edges with cost property (default 10.0, D→E has 4.2)

F3_NODES = "ABCDEFGHIJ"
F3_EDGES = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("E", "F"), ("F", "G"), ("H", "I")]
F3_COSTS = [10.0, 10.0, 10.0, 4.2, 10.0, 10.0, 10.0]


@pytest.fixture(scope="session")
def f3_unionfind(spark):
    ids = names_to_ids(F3_NODES)
    pairs = [(ids[s], ids[d]) for s, d in F3_EDGES]
    edges = edge_df(spark, pairs, F3_COSTS)
    vertices = spark.createDataFrame([(i,) for i in range(10)], "vid long")
    return edges, vertices, ids


def collect_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}
