"""Betweenness / Links / SubGraphMatch parity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from hugegraph_computer_spark.algorithms.betweenness import betweenness_centrality
from hugegraph_computer_spark.algorithms.links import links_as_strings
from hugegraph_computer_spark.algorithms.rings import rings_detection
from hugegraph_computer_spark.algorithms.subgraph import subgraph_match
from hugegraph_computer_spark.graph import Graph
from hugegraph_computer_spark.oracles import py_reference as oracle
from tests.test_path_algorithms import CYCLIC_EDGES, graph_from_edges


def test_betweenness_exact_small(spark):
    # diamond + tail: a->b->d, a->c->d, d->e  (b,c split two shortest
    # paths a->d; d is on every a/b/c -> e path)
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    g = graph_from_edges(spark, edges)
    nodes = [r["id"] for r in g.vertices.collect()]
    expected = oracle.betweenness(nodes, edges)
    got = {r["id"]: r["betweenness"] for r in betweenness_centrality(g).collect()}
    assert got.keys() == expected.keys()
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-9, (v, got[v], expected[v])
    # hand-check: b and c each carry half of a->d and a->e
    assert abs(got["b"] - 1.0) < 1e-9
    assert abs(got["d"] - 3.0) < 1e-9  # a->e, b->e, c->e


def test_betweenness_exact_on_sf_graph(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    expected = oracle.betweenness(nodes, edges)
    got = {
        r["id"]: r["betweenness"] for r in betweenness_centrality(sf_graph).collect()
    }
    assert got.keys() == expected.keys()
    worst = max(abs(got[v] - expected[v]) for v in expected)
    assert worst < 1e-6, worst


def test_betweenness_exact_on_cycles(spark):
    g = graph_from_edges(spark, CYCLIC_EDGES)
    nodes = [r["id"] for r in g.vertices.collect()]
    expected = oracle.betweenness(nodes, CYCLIC_EDGES)
    got = {r["id"]: r["betweenness"] for r in betweenness_centrality(g).collect()}
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-9, v


def test_links_exact(spark, sf_graph):
    ends_rows = (
        sf_graph.edges.where(F.col("etype") == "mention").select("src").distinct()
    )
    ends = {r["src"] for r in ends_rows.collect()}
    starts = {
        r["id"] for r in sf_graph.vertices.collect() if r["id"].endswith("#00")
    }
    reply = [
        (r["src"], r["dst"])
        for r in sf_graph.edges.where(F.col("etype") == "reply").collect()
    ]
    nodes = [r["id"] for r in sf_graph.vertices.collect()]
    expected = {
        "->".join(p) for p in oracle.links_paths(nodes, reply, starts, ends, 16)
    }
    verts = sf_graph.vertices.join(
        ends_rows.withColumnRenamed("src", "id").withColumn("_e", F.lit(True)),
        "id",
        "left",
    )
    g2 = Graph(verts, sf_graph.edges, 4)
    got_df = links_as_strings(
        g2,
        start=F.col("id").like("%#00"),
        end=F.coalesce(F.col("_e"), F.lit(False)),
        edge_filter=F.col("etype") == "reply",
        max_rounds=16,
    )
    got = {r["path"] for r in got_df.collect()}
    assert got == expected
    assert len(got) > 0


def test_subgraph_wedge(spark, sf_graph):
    got = subgraph_match(
        sf_graph,
        [("a", "b", "reply"), ("a", "t", "mention"), ("b", "t", "mention")],
    )
    rows = {(r["a"], r["b"], r["t"]) for r in got.collect()}
    # independent check: consecutive turns with the same non-null tool
    reply = {
        (r["src"], r["dst"])
        for r in sf_graph.edges.where(F.col("etype") == "reply").collect()
    }
    mention = {
        (r["src"], r["dst"])
        for r in sf_graph.edges.where(F.col("etype") == "mention").collect()
    }
    expected = {
        (a, b, t)
        for (a, b) in reply
        for (a2, t) in mention
        if a2 == a and (b, t) in mention
    }
    assert rows == expected
    assert len(rows) > 0


def test_rings_with_filter(spark):
    g = graph_from_edges(spark, CYCLIC_EDGES)
    # A13: restrict spreading to edges not touching 'd' -> kills the
    # square and the chord cycle, keeps the triangle
    filt = (F.col("src") != "d") & (F.col("dst") != "d")
    got = {tuple(r["ring"]) for r in rings_detection(g, 10, edge_filter=filt).collect()}
    assert got == {("a", "b", "c", "a")}


def test_betweenness_brandes_matches_flooding(spark, sf_graph):
    from hugegraph_computer_spark.algorithms.betweenness import (
        betweenness_brandes,
    )

    flood = {
        r["id"]: r["betweenness"] for r in betweenness_centrality(sf_graph).collect()
    }
    brandes = {
        r["id"]: r["betweenness"] for r in betweenness_brandes(sf_graph).collect()
    }
    assert flood.keys() == brandes.keys()
    worst = max(abs(flood[v] - brandes[v]) for v in flood)
    assert worst < 1e-6, worst


def test_betweenness_brandes_on_cycles(spark):
    from hugegraph_computer_spark.algorithms.betweenness import (
        betweenness_brandes,
    )

    g = graph_from_edges(spark, CYCLIC_EDGES)
    nodes = [r["id"] for r in g.vertices.collect()]
    expected = oracle.betweenness(nodes, CYCLIC_EDGES)
    got = {r["id"]: r["betweenness"] for r in betweenness_brandes(g).collect()}
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-9, v
