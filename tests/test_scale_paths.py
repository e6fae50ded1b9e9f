"""Round-2 scale-path tests: the gated plans must be the ones that
survive 100x data, and each must stay value-identical to its exact
counterpart where exactness is defined."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from hugegraph_computer_spark.graph import Graph, undensify


# -- random walks: hub-proof two-phase step ----------------------------------


def test_walks_hub_one_row_per_walker_per_step(spark):
    """A degree-100k hub must NOT materialize its adjacency per walker:
    with the two-phase (pick-then-equi-join) step the output is exactly
    one row per live walker per step."""
    from hugegraph_computer_spark.pipeline.walks import random_walks

    n_leaves = 100_000
    leaves = spark.range(n_leaves).select(
        F.format_string("L%06d", F.col("id")).alias("dst")
    )
    edges = leaves.select(
        F.lit("h").alias("src"), "dst",
        F.lit(1.0).alias("weight"), F.lit("t").alias("etype"),
    )
    vertices = leaves.select(F.col("dst").alias("id")).union(
        spark.createDataFrame([("h",)], "id string")
    )
    g = Graph(vertices, edges)
    out = random_walks(g, walk_len=3, walks_per_node=2)
    per_step = {r["step"]: r["n"] for r in
                out.groupBy("step").agg(F.count(F.lit(1)).alias("n")).collect()}
    # step 0: every vertex x 2 walks; step 1: only the hub's walkers
    # advance (leaves are sinks); step 2: walkers sit on leaves -> stop
    assert per_step[0] == (n_leaves + 1) * 2
    assert per_step[1] == 2
    assert 2 not in per_step
    # determinism: the picked leaves are a pure function of (v, walk, t)
    picks = sorted(
        r["node"] for r in out.where(F.col("step") == 1).collect()
    )
    picks2 = sorted(
        r["node"]
        for r in random_walks(g, walk_len=3, walks_per_node=2)
        .where(F.col("step") == 1)
        .collect()
    )
    assert picks == picks2


# -- cosine near-dup: bucketed gate vs exact oracle --------------------------


def test_cosine_bucketed_zero_planes_equals_exact(spark):
    from hugegraph_computer_spark.pipeline.similarity import (
        cosine_neardup_exact,
        cosine_neardup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["a"], r["b"], r["cosine"])
             for r in cosine_neardup_exact(emb, threshold=0.4).collect()}
    single_bucket = {(r["a"], r["b"], r["cosine"])
                     for r in cosine_neardup_pairs(emb, threshold=0.4, n_planes=0).collect()}
    assert single_bucket == exact  # n_planes=0 -> one bucket -> exhaustive

    bucketed = {(r["a"], r["b"], r["cosine"])
                for r in cosine_neardup_pairs(emb, threshold=0.4, n_planes=6).collect()}
    assert bucketed <= exact  # in-bucket verify -> precision 1.0


# -- shingles: zero-shuffle construction + hot-shingle cap -------------------


def test_shingles_values(spark):
    from hugegraph_computer_spark.pipeline.dedup import shingles

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "p q r p q r")],
        "doc_id int, text string",
    )
    got = {(r["doc_id"], r["shingle"]) for r in shingles(docs).collect()}
    assert got == {
        (1, "a b c"), (1, "b c d"),
        (3, "p q r"), (3, "q r p"), (3, "r p q"),  # distinct within doc
    }


def test_hot_shingle_cap_bounds_candidates(spark):
    from hugegraph_computer_spark.pipeline.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    # 300 docs that share ONE stopword trigram and are otherwise unique:
    # uncapped candidate generation is ~300^2/2 pairs from that shingle
    docs = spark.range(300).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(
            F.lit("the quick fox "),
            F.format_string("u%s v%s w%s x%s", "id", "id", "id", "id"),
        ).alias("text"),
    )
    capped = shingles(docs, max_df=10)
    assert capped.where(F.col("shingle") == "the quick fox").count() == 0
    # rare shingles survive the cap
    assert capped.count() > 0
    # with the hot trigram capped away no doc pair shares a shingle
    assert ngram_jaccard_pairs(docs, threshold=0.1, max_df=10).count() == 0


# -- CSR chunking -------------------------------------------------------------


def test_csr_chunked_rows_bounded_and_pagerank_equal(sf_graph):
    import numpy as np

    from hugegraph_computer_spark.algorithms import PageRank
    from hugegraph_computer_spark.engine import PregelRunner
    from hugegraph_computer_spark.engine.csr import build_csr_blocks, pagerank_csr

    chunk = 200
    blocks = build_csr_blocks(sf_graph.edges, num_blocks=4, chunk_edges=chunk).collect()
    per_key = Counter(b["block_key"] for b in blocks)
    assert max(per_key.values()) > 1  # blocks actually split into chunks
    assert all(len(b["dsts"]) <= chunk for b in blocks)
    assert sum(len(b["dsts"]) for b in blocks) == sf_graph.edges.count()
    for b in blocks:
        assert b["indptr"][-1] == len(b["dsts"])

    df_res = PregelRunner().run(PageRank(l1_tol=0.0, max_supersteps=5), sf_graph)
    csr_state, steps = pagerank_csr(
        sf_graph, l1_tol=0.0, max_supersteps=5, num_blocks=4, chunk_edges=chunk
    )
    assert steps == df_res.supersteps
    a = {r["id"]: r["rank"] for r in df_res.state.collect()}
    b = {r["id"]: r["rank"] for r in csr_state.collect()}
    assert a.keys() == b.keys()
    assert max(abs(a[x] - b[x]) for x in a) < 1e-12
    assert np.isclose(sum(b.values()), 1.0, rtol=1e-3)


# -- id densification (R13) ---------------------------------------------------


def test_densify_roundtrip_invariance(sf_graph):
    from hugegraph_computer_spark.algorithms import PageRank
    from hugegraph_computer_spark.engine import PregelRunner

    dense, mapping = sf_graph.densify()
    assert dict(dense.vertices.dtypes)["id"] == "bigint"
    assert dense.vertices.count() == sf_graph.num_vertices
    assert dense.edges.count() == sf_graph.edges.count()

    direct = PregelRunner().run(PageRank(l1_tol=0.0, max_supersteps=5), sf_graph)
    densified = PregelRunner().run(PageRank(l1_tol=0.0, max_supersteps=5), dense)
    back = undensify(densified.state.select("id", "rank"), mapping)
    a = {r["id"]: r["rank"] for r in direct.state.select("id", "rank").collect()}
    b = {r["id"]: r["rank"] for r in back.collect()}
    assert a.keys() == b.keys()
    assert max(abs(a[x] - b[x]) for x in a) < 1e-12


# -- sampled centrality --------------------------------------------------------


def test_sampled_betweenness_rate1_equals_exact(sf_graph):
    from hugegraph_computer_spark.algorithms.betweenness import (
        betweenness_brandes,
        betweenness_brandes_sampled,
    )

    exact = {r["id"]: round(r["betweenness"], 6)
             for r in betweenness_brandes(sf_graph).collect()}
    sampled = {r["id"]: round(r["betweenness"], 6)
               for r in betweenness_brandes_sampled(sf_graph, sample_rate=1.0).collect()}
    assert exact == sampled


def test_sampled_closeness_subset(sf_graph):
    from hugegraph_computer_spark.algorithms.closeness import closeness_centrality

    full = {r["id"]: r["n_reachable"]
            for r in closeness_centrality(sf_graph).collect()}
    samp = {r["id"]: r["n_reachable"]
            for r in closeness_centrality(sf_graph, sample_rate=0.1).collect()}
    assert samp.keys() == full.keys()
    assert all(samp[k] <= full[k] for k in full)  # fewer starts reach each v
    assert sum(samp.values()) < sum(full.values())  # sampling actually prunes


# -- expression-config DSL -----------------------------------------------------


def test_predicate_string_equals_column(sf_graph):
    from hugegraph_computer_spark.functions import predicate

    col_count = sf_graph.edges.where(F.col("etype") == "reply").count()
    str_count = sf_graph.edges.where(predicate("etype = 'reply'")).count()
    assert col_count == str_count > 0
    assert predicate(None) is None


def test_links_accepts_config_strings(sf_graph):
    from hugegraph_computer_spark.algorithms.links import links_as_strings

    a = links_as_strings(
        sf_graph,
        start=F.col("id").like("%#00"),
        end=F.col("id").like("%#03"),
        edge_filter=F.col("etype") == "reply",
        max_rounds=6,
    ).collect()
    b = links_as_strings(
        sf_graph,
        start="id LIKE '%#00'",
        end="id LIKE '%#03'",
        edge_filter="etype = 'reply'",
        max_rounds=6,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_ann_ivf_single_cluster_equals_bruteforce(spark):
    from hugegraph_computer_spark.pipeline.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = [(r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
             for r in ann_topk_bruteforce(emb, n_queries=3, k=5).collect()]
    ivf1 = [(r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in ann_topk_ivf(emb, n_queries=3, k=5, n_clusters=1).collect()]
    assert sorted(ivf1) == sorted(exact)  # one cell -> exhaustive scan

    ivf4 = ann_topk_ivf(emb, n_queries=3, k=5, n_clusters=4).collect()
    # every reported cosine is the true cosine (verify against the
    # brute-force scores), ranks are within-cell
    truth = {(q, n): c for (q, n, _r, c) in exact}
    full = {(r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in ann_topk_bruteforce(emb, n_queries=3, k=10**6).collect()}
    for r in ivf4:
        assert full[(r["query_id"], r["neighbor_id"])] == r["cosine"]
    assert truth  # non-degenerate fixture


def test_links_edge_recording_and_end_edge(spark):
    from hugegraph_computer_spark.algorithms.links import links_as_strings

    edges = spark.createDataFrame(
        [("v0", "v1", 1.0, "reply"), ("v1", "t", 1.0, "mention")],
        "src string, dst string, weight double, etype string",
    )
    verts = spark.createDataFrame([("v0",), ("v1",), ("t",)], "id string")
    g = Graph(verts, edges)

    rec = links_as_strings(
        g, start="id = 'v0'", end="id = 't'", record_edges=True, max_rounds=4
    ).collect()
    assert [(r["id"], r["path"]) for r in rec] == [
        ("t", "v0-[reply]->v1-[mention]->t")
    ]

    # end-EDGE condition: the walk stops when it traverses a mention
    # edge — no end vertex declared at all (Links.java:107-129)
    ee = links_as_strings(
        g, start="id = 'v0'", end=F.lit(False),
        end_edge="etype = 'mention'", max_rounds=4,
    ).collect()
    assert [(r["id"], r["path"]) for r in ee] == [("t", "v0->v1->t")]


# -- misc round-2 fixes --------------------------------------------------------


def test_combine_properties_deterministic_across_partitioning(spark):
    from hugegraph_computer_spark.engine.io import combine_properties

    rows = [("k", i % 5 if i % 3 else None, f"s{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "id string, p1 int, p2 string")
    for mode in ("merge_old", "merge_new", "overwrite"):
        a = combine_properties(df.repartition(1), ["id"], mode).collect()
        b = combine_properties(df.repartition(13), ["id"], mode).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), mode


def test_edges_single_per_label(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b", 1.0, "reply"), ("a", "b", 2.0, "reply"),
            ("a", "b", 1.0, "uses"), ("a", "c", 1.0, "reply"),
        ],
        "src string, dst string, weight double, etype string",
    )
    verts = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    g = Graph(verts, edges)
    assert g.edges_single().edges.count() == 2  # (a,b), (a,c)
    assert g.edges_single_per_label().edges.count() == 3  # + (a,b,uses)


def test_salted_aggregate_count_merge(spark):
    from hugegraph_computer_spark.engine.skew import salted_aggregate

    df = spark.createDataFrame([("k", i) for i in range(100)], "id string, v int")
    out = salted_aggregate(
        df, "id", F.count(F.lit(1)), out="n", merge="count", salt=8
    ).collect()
    assert out[0]["n"] == 100
