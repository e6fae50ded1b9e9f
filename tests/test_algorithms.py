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


def test_wcc_lpa_tiebreak_non_ascii_ids(spark):
    """BytesId.java:224-231 parity guard for NON-ASCII ids: the
    reference tie-breaks on raw UTF-8 byte order; Spark's default
    UTF8_BINARY collation compares UTF8String bytes, and UTF-8 byte
    order equals code-point order by construction — so min-label
    algorithms must agree with a byte-order oracle even for non-ASCII
    ids. This pins that assumption against future collation changes."""
    from pyspark.sql import functions as F

    from hugegraph_computer_spark.graph import Graph

    ids = ["zz", "Z~", "é", "ß", "中文", "èa"]
    # one undirected chain connecting all ids -> single component whose
    # label is the byte-order minimum
    pairs = list(zip(ids, ids[1:]))
    e = spark.createDataFrame(
        [(s, d, 1.0, "t") for s, d in pairs] + [(d, s, 1.0, "t") for s, d in pairs],
        "src string, dst string, weight double, etype string",
    )
    v = spark.createDataFrame([(i,) for i in ids], "id string")
    g = Graph(vertices=v, edges=e, partitions=2)

    byte_min = min(ids, key=lambda s: s.encode("utf-8"))
    assert byte_min == min(ids)  # UTF-8 byte order == code-point order

    res = PregelRunner().run(Wcc(), g)
    comps = {r["comp"] for r in res.state.collect()}
    assert comps == {byte_min}

    # Spark's own ordering agrees with the byte-order oracle
    spark_min = v.agg(F.min("id")).first()[0]
    assert spark_min == byte_min

    # LPA min-label tie-break on a 2-clique of non-ASCII ids
    lpa_res = PregelRunner().run(Lpa(max_supersteps=4), g)
    labels = {r["id"]: r["label"] for r in lpa_res.state.collect()}
    assert set(labels) == set(ids)


def test_cc_fast_matches_wcc_fixpoint_in_log_rounds(sf_graph):
    """cc_fast must reach the exact fixpoint Wcc reaches on a
    both-direction load (true undirected WCC, min-id labels), in
    fewer rounds than the reference loop takes supersteps."""
    from hugegraph_computer_spark.algorithms.cc_fast import connected_components

    ref = PregelRunner().run(Wcc(), sf_graph.both_direction())
    expected = {r["id"]: r["comp"] for r in ref.state.collect()}

    res = connected_components(sf_graph)
    got = {r["id"]: r["comp"] for r in res.labels.collect()}

    assert got == expected
    # pointer jumping doubles covered distance per round; the +1 is the
    # confirmation round (changed == 0)
    assert res.rounds < ref.supersteps, (res.rounds, ref.supersteps)


def test_cc_fast_isolated_and_chain(spark):
    """Isolated vertex keeps its own label; a long path (worst case for
    one-hop propagation, diameter 9) converges in ~log2(d) rounds."""
    from hugegraph_computer_spark.algorithms.cc_fast import connected_components
    from hugegraph_computer_spark.graph import Graph

    ids = [f"v{i:02d}" for i in range(10)]
    e = spark.createDataFrame(
        [(a, b, 1.0, "t") for a, b in zip(ids, ids[1:])],
        "src string, dst string, weight double, etype string",
    )
    v = spark.createDataFrame([(i,) for i in ids] + [("lonely",)], "id string")
    res = connected_components(Graph(vertices=v, edges=e, partitions=2))
    got = {r["id"]: r["comp"] for r in res.labels.collect()}
    assert got["lonely"] == "lonely"
    assert all(got[i] == "v00" for i in ids)
    assert res.rounds <= 6, res.rounds  # ceil(log2(9)) + confirm + slack
