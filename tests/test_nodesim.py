"""Neighborhood similarity + Adamic-Adar (operators/nodesim.py).

Hand-computed fixture: the 4-clique-minus-one-edge graph
    0-1, 0-2, 0-3, 1-2, 1-3   (edge 2-3 missing)
Neighborhoods (undirected): N(0)={1,2,3} N(1)={0,2,3} N(2)={0,1} N(3)={0,1}.
"""

from __future__ import annotations

import math

import pytest

from neo4j_graph_algorithms_spark.operators.nodesim import (
    adamic_adar,
    node_similarity,
)
from tests.conftest import edge_df

PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]


def _by_pair(rows):
    return {(r["a"], r["b"]): r for r in rows}


def test_jaccard_hand_values(spark):
    out = _by_pair(node_similarity(spark, edge_df(spark, PAIRS)).collect())
    # N(0)∩N(1)={2,3}, union={0,1,2,3} → 0.5
    assert out[(0, 1)]["sim"] == pytest.approx(0.5)
    assert out[(0, 1)]["common"] == 2
    # N(2)∩N(3)={0,1}, union={0,1} → 1.0 (twins)
    assert out[(2, 3)]["sim"] == pytest.approx(1.0)
    # N(0)∩N(2)={1} (3∉N(2)), union={0,1,2,3}−... = {1,2,3}∪{0,1}={0,1,2,3}→ 1/4
    assert out[(0, 2)]["sim"] == pytest.approx(0.25)
    assert len(out) == 6  # all C(4,2) pairs share >=1 neighbor here


def test_overlap_metric(spark):
    out = _by_pair(
        node_similarity(spark, edge_df(spark, PAIRS), metric="overlap").collect()
    )
    # overlap(0,2) = |{1}| / min(3, 2) = 0.5
    assert out[(0, 2)]["sim"] == pytest.approx(0.5)
    assert out[(2, 3)]["sim"] == pytest.approx(1.0)


def test_top_k_and_cutoff(spark):
    out = node_similarity(
        spark, edge_df(spark, PAIRS), top_k=1, similarity_cutoff=0.3
    ).collect()
    # per left node keep the single best pair with sim >= 0.3
    best = _by_pair(out)
    assert (2, 3) in best  # the twins survive any cutoff
    for a in {r["a"] for r in out}:
        assert sum(1 for r in out if r["a"] == a) == 1


def test_hub_cap_warns_and_bounds(spark):
    # star graph: center 0 with leaves 1..5 — every leaf pair's ONLY shared
    # neighbor is the hub, so capping below 5 removes all candidates
    star = [(0, i) for i in range(1, 6)]
    with pytest.warns(RuntimeWarning, match="hub wedge centers"):
        out = node_similarity(
            spark, edge_df(spark, star), max_center_degree=4
        ).collect()
    assert out == []


def test_adamic_adar_hand_values(spark):
    out = _by_pair(adamic_adar(spark, edge_df(spark, PAIRS)).collect())
    # common neighbors of (2,3) are {0,1}, deg(0)=3 deg(1)=3
    want = 2.0 / math.log(3)
    assert out[(2, 3)]["score"] == pytest.approx(want, abs=1e-6)
    # (0,1): commons {2,3}, deg=2 each → 2/ln(2)
    assert out[(0, 1)]["score"] == pytest.approx(2.0 / math.log(2), abs=1e-6)


def test_adamic_adar_excludes_existing_links(spark):
    out = _by_pair(
        adamic_adar(spark, edge_df(spark, PAIRS), existing_links=False).collect()
    )
    # only the missing edge (2,3) remains a candidate
    assert set(out) == {(2, 3)}


def test_degree1_center_contributes_zero(spark):
    # path 1-0-2 plus pendant 0-3: pair (1,2) shares only center 0 (deg 3);
    # a degree-1 vertex can never be a wedge center, but the ln(1) guard is
    # exercised via the pendant's own pairs
    path = [(1, 0), (0, 2), (0, 3)]
    out = _by_pair(adamic_adar(spark, edge_df(spark, path)).collect())
    assert out[(1, 2)]["score"] == pytest.approx(1.0 / math.log(3), abs=1e-6)


def test_default_center_cap_is_finite():
    # the 100 TB guard: unbounded wedge generation must be an explicit
    # opt-out (max_center_degree=None), never the default
    import inspect

    from neo4j_graph_algorithms_spark.operators.nodesim import (
        DEFAULT_MAX_CENTER_DEGREE,
    )

    assert DEFAULT_MAX_CENTER_DEGREE == 10_000
    for fn in (node_similarity, adamic_adar):
        d = inspect.signature(fn).parameters["max_center_degree"].default
        assert d == DEFAULT_MAX_CENTER_DEGREE


def test_default_cap_drops_celebrity_hub(spark):
    # star with 10,001 leaves: hub center degree exceeds the DEFAULT cap,
    # so candidate generation drops it (with a warning) instead of fanning
    # out deg^2 ≈ 1e8 pairs; every leaf pair's only shared neighbor is the
    # hub, so the capped result is empty
    star = [(0, i) for i in range(1, 10_002)]
    with pytest.warns(RuntimeWarning, match="hub wedge centers"):
        out = node_similarity(spark, edge_df(spark, star)).collect()
    assert out == []
