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


def test_subgraph_json_matches_manual(spark, sf_graph):
    """The query-graph JSON surface (QueryGraphDescribe parity):
    label + property_filter constraints per variable and per edge must
    equal a hand-enumerated match set."""
    import json

    from hugegraph_computer_spark.algorithms.subgraph import subgraph_match_json

    describe = [
        {
            "id": "a",
            "label": "turn",
            "property_filter": "turn_idx <= 2",
            "edges": [{"targetId": "b", "label": "reply"}],
        },
        {
            "id": "b",
            "label": "turn",
            "edges": [
                {
                    "targetId": "t",
                    "label": "mention",
                    "property_filter": "weight >= 1.0",
                }
            ],
        },
        {"id": "t", "label": "tool", "property_filter": "name = 'search'"},
    ]
    got = {
        (r["a"], r["b"], r["t"])
        for r in subgraph_match_json(sf_graph, json.dumps(describe)).collect()
    }
    reply = {
        (r["src"], r["dst"])
        for r in sf_graph.edges.where(F.col("etype") == "reply").collect()
    }
    mention = {
        (r["src"], r["dst"])
        for r in sf_graph.edges.where(F.col("etype") == "mention").collect()
    }

    def turn_idx(v):
        return int(v.split("#")[1])

    expected = {
        (a, b, t)
        for (a, b) in reply
        for (b2, t) in mention
        if b2 == b and turn_idx(a) <= 2 and t == "tool:search"
        and len({a, b, t}) == 3
    }
    assert got == expected
    assert len(got) > 0


def test_subgraph_json_rejects_undeclared_target(spark):
    from hugegraph_computer_spark.algorithms.subgraph import parse_query_graph

    try:
        parse_query_graph(
            [{"id": "a", "label": "turn",
              "edges": [{"targetId": "ghost", "label": "reply"}]}]
        )
        assert False, "expected ValueError"
    except ValueError as e:
        assert "ghost" in str(e)


def test_ppr_topk_output_cap(spark):
    """PersonalPageRankListOutput parity: the source and its direct
    out-neighbors are removed, then top-k by (rank desc, id)."""
    from hugegraph_computer_spark.algorithms.ppr import ppr_topk

    edges = [("s", "n1"), ("s", "n2"), ("n1", "x1"), ("n2", "x2")]
    g = graph_from_edges(spark, edges)
    result = spark.createDataFrame(
        [("s", 0.9), ("n1", 0.5), ("n2", 0.4), ("x1", 0.3), ("x2", 0.3), ("y", 0.1)],
        "id string, rank double",
    )
    top = [(r["id"], r["rank"]) for r in ppr_topk(result, g, "s", k=2).collect()]
    # s (source) and n1/n2 (direct targets) excluded; tie 0.3/0.3 broken
    # by id asc; k=2 cuts y
    assert top == [("x1", 0.3), ("x2", 0.3)]
    everything = {r["id"] for r in ppr_topk(result, g, "s", k=100).collect()}
    assert everything == {"x1", "x2", "y"}


def test_limit_out_edges(spark):
    """input.limit_edges_in_one_vertex parity: at most n out-edges per
    vertex, deterministic kept set (first by etype, dst, weight)."""
    e = spark.createDataFrame(
        [
            ("a", "z", 1.0, "reply"),
            ("a", "y", 1.0, "mention"),
            ("a", "x", 1.0, "mention"),
            ("b", "a", 1.0, "reply"),
        ],
        "src string, dst string, weight double, etype string",
    )
    v = spark.createDataFrame([("a",), ("b",), ("x",), ("y",), ("z",)], "id string")
    g = Graph(vertices=v, edges=e, partitions=2)
    capped = {
        (r["src"], r["dst"]) for r in g.limit_out_edges(2).edges.collect()
    }
    # a keeps ('mention','x') and ('mention','y'); 'reply' z is cut
    assert capped == {("a", "x"), ("a", "y"), ("b", "a")}


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


def test_parse_query_graph_rejects_orphan_vertex():
    """A declared vertex referenced by no edge must raise — silently
    dropping it would drop its constraints (QueryGraph.java:44-82)."""
    import json

    import pytest

    from hugegraph_computer_spark.algorithms.subgraph import parse_query_graph

    describe = json.dumps(
        [
            {"id": "a", "label": "turn", "edges": [{"targetId": "b", "label": "*"}]},
            {"id": "b", "label": "turn"},
            {"id": "orphan", "label": "tool", "property_filter": "name = 'sql'"},
        ]
    )
    with pytest.raises(ValueError, match="orphan"):
        parse_query_graph(describe)
