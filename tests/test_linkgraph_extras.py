"""Round-5 link-graph additions: HITS, Adamic-Adar link prediction,
the exact/sketched neighborhood function (ANF), and k-truss peeling."""

from __future__ import annotations

import math

from hugegraph_computer_spark.algorithms.anf import anf_exact, anf_sketch
from hugegraph_computer_spark.algorithms.hits import (
    hits,
    hits_reference_check,
    hits_top,
)
from hugegraph_computer_spark.algorithms.linkpred import adamic_adar


# -- HITS --------------------------------------------------------------------
def test_hits_matches_pure_python_replay(sf_graph, sf_edge_list):
    nodes, edges = sf_edge_list
    expected = hits_reference_check(edges, supersteps=5)
    # isolated vertices (no edges at all) still appear Spark-side
    res = hits(sf_graph, supersteps=5)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}
    assert set(expected) <= set(got)
    worst = max(
        max(abs(got[v][0] - expected[v][0]), abs(got[v][1] - expected[v][1]))
        for v in expected
    )
    assert worst <= 1e-9, f"max abs diff {worst}"
    # L2 norms are 1 after the final normalization
    assert math.isclose(
        sum(a * a for a, _ in got.values()), 1.0, rel_tol=1e-6
    )
    assert math.isclose(
        sum(h * h for _, h in got.values()), 1.0, rel_tol=1e-6
    )


def test_hits_top_is_deterministic_cap(sf_graph):
    res = hits(sf_graph, supersteps=3)
    top = hits_top(res.state, k=10, by="auth").collect()
    assert len(top) == 10
    keys = [(-round(r["auth"], 6), r["id"]) for r in top]
    assert keys == sorted(keys)


# -- Adamic-Adar -------------------------------------------------------------
def _python_adamic_adar(edges, max_degree, k):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nbrs: dict[str, set[str]] = {}
    for s, d in und:
        nbrs.setdefault(s, set()).add(d)
    scores: dict[tuple[str, str], list] = {}
    for z, ns in nbrs.items():
        if len(ns) > max_degree:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for w in ns_sorted[i + 1 :]:
                if (u, w) in und:
                    continue
                ent = scores.setdefault((u, w), [0, 0.0])
                ent[0] += 1
                ent[1] += 1.0 / math.log(len(ns))
    ranked = sorted(
        ((round(s, 6), u, w, c) for (u, w), (c, s) in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    return ranked[:k]


def test_adamic_adar_matches_python(sf_graph, sf_edge_list):
    _, edges = sf_edge_list
    expected = _python_adamic_adar(edges, max_degree=32, k=50)
    got = [
        (r["aa_score"], r["u"], r["w"], r["common_neighbors"])
        for r in adamic_adar(sf_graph, max_degree=32, k=50).collect()
    ]
    assert got == expected


def test_adamic_adar_excludes_existing_edges_and_hubs(spark):
    from tests.conftest import make_transcripts
    from hugegraph_computer_spark.graph import Graph

    # one conversation chain a-b-c-d: pairs at distance 2 share exactly
    # one pivot of degree 2 -> score 1/ln 2
    t = make_transcripts(
        spark, [("c1", i, "user", None) for i in range(4)]
    )
    g = Graph.from_transcripts(t, partitions=2)
    rows = adamic_adar(g, max_degree=32, k=100).collect()
    pairs = {(r["u"], r["w"]): r["aa_score"] for r in rows}
    n = ["c1#00", "c1#01", "c1#02", "c1#03"]
    assert set(pairs) == {(n[0], n[2]), (n[1], n[3])}
    for v in pairs.values():
        assert abs(v - round(1.0 / math.log(2.0), 6)) < 1e-9
    # with the cap below the pivot degree, no candidates survive
    assert adamic_adar(g, max_degree=1, k=100).count() == 0


# -- ANF ---------------------------------------------------------------------
def _python_balls(edges, etypes, hops):
    sym: dict[str, set[str]] = {}
    for s, d, et in edges:
        if etypes is not None and et not in etypes:
            continue
        if s == d:
            continue
        sym.setdefault(s, set()).add(d)
        sym.setdefault(d, set()).add(s)
    return sym


def test_anf_exact_matches_bfs(sf_graph):
    rows = sf_graph.edges.select("src", "dst", "etype").collect()
    nodes = [r["id"] for r in sf_graph.vertices.collect()]
    sym = _python_balls(
        [(r["src"], r["dst"], r["etype"]) for r in rows], ("reply",), 3
    )
    got = {
        (r["id"], r["hops"]): r["reach"]
        for r in anf_exact(sf_graph, hops=3).collect()
    }
    for v in nodes:
        ball = {v}
        for h in (1, 2, 3):
            ball |= {u for b in list(ball) for u in sym.get(b, ())}
            assert got[(v, h)] == len(ball), (v, h)


def test_anf_sketch_estimates_exact_reach(sf_graph):
    """FM estimator quality on the full undirected graph: the sketch
    must track the exact neighborhood function within the standard
    FM error envelope (k=8 registers -> sigma ~ 1/(phi*sqrt(8)))."""
    exact = {
        (r["id"], r["hops"]): r["reach"]
        for r in anf_exact(sf_graph, hops=2, etypes=None).collect()
    }
    est = {
        (r["id"], r["hops"]): r["est"]
        for r in anf_sketch(sf_graph, hops=2, k=8).collect()
    }
    assert set(exact) == set(est)
    rel = [abs(est[k] - exact[k]) / exact[k] for k in exact]
    mean_rel = sum(rel) / len(rel)
    assert mean_rel < 0.45, f"mean relative error {mean_rel:.3f}"
    # and the estimator must be unbiased-ish in aggregate, not just
    # bounded: total estimated mass within 25% of total exact mass
    tot_e = sum(exact.values())
    tot_s = sum(est.values())
    assert abs(tot_s - tot_e) / tot_e < 0.25, (tot_s, tot_e)


def test_anf_sketch_monotone_in_hops(sf_graph):
    est = anf_sketch(sf_graph, hops=2, k=8).collect()
    by_v: dict[str, dict[int, float]] = {}
    for r in est:
        by_v.setdefault(r["id"], {})[r["hops"]] = r["est"]
    for v, hs in by_v.items():
        # registers only gain bits round-over-round
        assert hs[2] >= hs[1] - 1e-9, v


# -- k-truss -------------------------------------------------------------
def _python_ktruss(pairs, k):
    """Brute-force peel on the canonical undirected edge set."""
    edges = set()
    for s, d in pairs:
        if s != d:
            edges.add((min(s, d), max(s, d)))
    while True:
        nbrs = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(nbrs[u] & nbrs[v]) for u, v in edges
        }
        keep = {e for e in edges if sup[e] >= k - 2}
        if keep == edges:
            return {e: sup[e] for e in edges}
        edges = keep


def test_ktruss_matches_python_peel(sf_graph, sf_edge_list):
    from hugegraph_computer_spark.algorithms.truss import ktruss

    _, edges = sf_edge_list
    for k in (3, 4):
        expected = _python_ktruss(edges, k)
        got = {
            (r["u"], r["v"]): r["support"]
            for r in ktruss(sf_graph, k=k).edges.collect()
        }
        assert got == expected, f"k={k}"


def test_ktruss_cascade_unravels_pendant_triangles(spark):
    """K4 + a triangle strip: the strip must unravel over MULTIPLE peel
    rounds (each removal exposes the next layer), leaving exactly the
    K4, whose edges all have support 2."""
    from pyspark.sql import functions as F

    from hugegraph_computer_spark.algorithms.truss import ktruss
    from hugegraph_computer_spark.graph import Graph

    k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1 :]]
    # triangle STRIP d-e-f-g-h: interior edges start at support 2, the
    # strip end at 1 — each peel round exposes the next layer inward
    chain = [("d", "e"), ("e", "f"), ("f", "g"), ("g", "h"),
             ("d", "f"), ("e", "g"), ("f", "h")]
    pairs = k4 + chain
    expected = _python_ktruss(pairs, 4)
    assert set(expected) == set(k4)  # sanity: only the K4 survives

    e = spark.createDataFrame(pairs, "src string, dst string").select(
        "src", "dst", F.lit(1.0).alias("weight"), F.lit("und").alias("etype")
    )
    v = spark.createDataFrame(
        [(x,) for x in "abcdefgh"], "id string"
    )
    res = ktruss(Graph(vertices=v, edges=e, partitions=2), k=4)
    got = {(r["u"], r["v"]): r["support"] for r in res.edges.collect()}
    assert got == expected
    assert res.rounds >= 3  # the unravel genuinely cascaded


def test_effective_diameter_from_anf(sf_graph):
    from hugegraph_computer_spark.algorithms.anf import (
        anf_exact,
        effective_diameter,
    )

    ex = anf_exact(sf_graph, hops=3)
    row = effective_diameter(ex, alpha=0.9).collect()[0]
    # python recompute
    per = {
        r["hops"]: r["sum(reach)"]
        for r in ex.groupBy("hops").sum("reach").collect()
    }
    mx = per[max(per)]
    exp = min(h for h, t in per.items() if t >= 0.9 * mx)
    assert row["effective_diameter"] == exp
    assert abs(row["coverage"] - round(per[exp] / mx, 6)) < 1e-12


def test_stratified_sample_deterministic_and_capped(spark):
    import hashlib

    from hugegraph_computer_spark.pipeline.sampling import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stratified_sample(docs, group_col="lang", n=7).collect()
    by_g: dict[str, list] = {}
    for r in out:
        by_g.setdefault(r["lang"], []).append((r["rank"], r["doc_id"]))
    # python replay of the md5 permutation
    rows = docs.select("doc_id", "lang").collect()
    exp: dict[str, list] = {}
    for r in rows:
        h = int(
            hashlib.md5(f"{r['doc_id']}:sample".encode()).hexdigest()[:15], 16
        )
        exp.setdefault(r["lang"], []).append((h, r["doc_id"]))
    for g, pairs in exp.items():
        want = [d for _, d in sorted(pairs)[:7]]
        got = [d for _, d in sorted(by_g[g])]
        assert got == want, g
    # the rank-limit pushdown really is in the plan (the scale claim)
    plan = (
        stratified_sample(docs, "lang", 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    # an independent tag draws a different sample
    other = stratified_sample(docs, "lang", 7, tag="sample2").collect()
    assert {r["doc_id"] for r in other} != {r["doc_id"] for r in out}
