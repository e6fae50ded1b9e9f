"""PPR / closeness / rings parity tests vs the reference-exact
pure-Python oracles — on the real sf0.001 graph and on synthetic
cyclic graphs (the derived directed graph is a DAG, so rings needs one).
"""

from __future__ import annotations

import pytest

from hugegraph_computer_spark.algorithms.closeness import closeness_centrality
from hugegraph_computer_spark.algorithms.ppr import PersonalPageRank
from hugegraph_computer_spark.algorithms.rings import rings_detection
from hugegraph_computer_spark.engine import PregelRunner
from hugegraph_computer_spark.graph import Graph
from hugegraph_computer_spark.oracles import py_reference as oracle


def graph_from_edges(spark, edges, partitions=4):
    e = spark.createDataFrame(
        [(s, d, 1.0, "e") for s, d in edges], "src string, dst string, weight double, etype string"
    )
    nodes = sorted({x for s, d in edges for x in (s, d)})
    v = spark.createDataFrame([(n,) for n in nodes], "id string")
    return Graph(vertices=v, edges=e, partitions=partitions)


def test_ppr_exact(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    source = "role:user"
    expected = oracle.ppr(nodes, edges, source, max_supersteps=10)
    res = PregelRunner().run(
        PersonalPageRank(source=source, max_supersteps=10), sf_graph
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    assert got.keys() == expected.keys()
    worst = max(abs(got[v] - expected[v]) for v in expected)
    assert worst <= 1e-9, f"max abs diff {worst}"


def test_ppr_reference_faithful_halts_after_superstep2(sf_graph):
    res = PregelRunner().run(
        PersonalPageRank(source="role:user", reference_faithful=True), sf_graph
    )
    # PersonalPageRank.java's diff is computed post-assignment -> always 0
    # -> master stops after superstep 2 (supersteps 0,1,2)
    assert res.supersteps == 3


def test_closeness_exact(spark, sf_graph):
    rows = sf_graph.edges.select("src", "dst", "weight").collect()
    edges = [(r["src"], r["dst"], float(r["weight"])) for r in rows]
    nodes = [r["id"] for r in sf_graph.vertices.collect()]
    expected = oracle.closeness(nodes, edges)
    got = {
        r["id"]: (r["n_reachable"], r["centrality"])
        for r in closeness_centrality(sf_graph).collect()
    }
    assert got.keys() == expected.keys()
    for v in expected:
        assert got[v][0] == expected[v][0], v
        assert abs(got[v][1] - expected[v][1]) < 1e-9, v


CYCLIC_EDGES = [
    # triangle a->b->c->a, square a->d->e->f->a sharing vertex a,
    # chord e->a, tail f->g
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("a", "d"), ("d", "e"), ("e", "f"), ("f", "a"),
    ("e", "a"), ("f", "g"),
]


def test_rings_exact_on_cyclic_graph(spark):
    g = graph_from_edges(spark, CYCLIC_EDGES)
    nodes = [r["id"] for r in g.vertices.collect()]
    expected = oracle.rings(nodes, CYCLIC_EDGES, max_len=10)
    got = {
        tuple(r["ring"]) for r in rings_detection(g, max_len=10).collect()
    }
    assert got == expected
    assert ("a", "b", "c", "a") in got
    assert ("a", "d", "e", "f", "a") in got
    assert ("a", "d", "e", "a") in got


def test_rings_on_bidirectional_chains(spark, sf_graph):
    """On the reply-edge both-direction subgraph every ring is a 2-cycle
    (paths cannot revisit), one per undirected reply edge."""
    from pyspark.sql import functions as F

    reply = sf_graph.edges.where(F.col("etype") == "reply")
    g = Graph(sf_graph.vertices, reply, 4).both_direction()
    n_reply = reply.count()
    rings = rings_detection(g, max_len=6)
    assert rings.count() == n_reply
    assert rings.where(F.size("ring") != 3).count() == 0
