"""Golden parity tests: engine vs pure-Python reference-exact oracles
on the real sf0.001-derived graph (PageRank allclose 1e-6 at the same
superstep counts; WCC/LPA/TriangleCount exact — BASELINE.json north_rule).
"""

from __future__ import annotations

import math

from hugegraph_computer_spark.algorithms import (
    Lpa,
    PageRank,
    Wcc,
    degree_centrality,
    triangle_count,
)
from hugegraph_computer_spark.engine import PregelRunner
from hugegraph_computer_spark.oracles import py_reference as oracle


def test_pagerank_allclose_1e6(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    expected, o_steps = oracle.pagerank(nodes, edges, l1_tol=1e-6, max_supersteps=100)

    res = PregelRunner().run(PageRank(l1_tol=1e-6, max_supersteps=100), sf_graph)
    got = {r["id"]: r["rank"] for r in res.state.collect()}

    assert res.supersteps == o_steps, "superstep count must match the reference loop"
    assert got.keys() == expected.keys()
    worst = max(abs(got[v] - expected[v]) for v in expected)
    assert worst <= 1e-6, f"max abs diff {worst}"
    # sanity: ranks are a (normalized) distribution
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-3)


def test_wcc_exact(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    expected = oracle.wcc(nodes, edges)
    res = PregelRunner().run(Wcc(), sf_graph)
    got = {r["id"]: r["comp"] for r in res.state.collect()}
    assert got == expected


def test_lpa_exact(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    expected = oracle.lpa(nodes, edges, max_supersteps=10)
    res = PregelRunner().run(Lpa(max_supersteps=10), sf_graph)
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert res.supersteps == 10
    assert got == expected


def test_triangle_count_exact(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    expected = oracle.triangle_count(nodes, edges)
    got = {r["id"]: r["triangles"] for r in triangle_count(sf_graph).collect()}
    assert got == expected
    assert sum(got.values()) % 3 == 0  # each triangle counted at 3 corners
    assert sum(got.values()) > 0  # fixture graph must actually have triangles


def test_degree_centrality(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    from collections import Counter

    outdeg = Counter(s for s, _ in edges)
    got = {r["id"]: r["degree"] for r in degree_centrality(sf_graph).collect()}
    assert got == {v: float(outdeg.get(v, 0)) for v in nodes}
