"""MinHash-LSH recall test: the banded candidate generation must find
every pair the exact n-gram Jaccard verifier accepts at the threshold.
With 8 bands x 4 rows, P(candidate) = 1-(1-j^4)^8 ~ 0.98 at j=0.5 and
~0.88 at j=0.4 per-pair; the test asserts measured recall >= 0.8 at
threshold 0.4 on the sf0.001 documents (50 docs) and that every
reported pair is a verified true pair (precision 1.0 by construction)."""

from __future__ import annotations

from hugegraph_computer_spark.pipeline.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def test_lsh_recall_and_precision(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = {
        (r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()
    }
    got = {
        (r["a"], r["b"]) for r in minhash_lsh_pairs(docs, threshold=0.4).collect()
    }
    assert got <= truth  # verified pairs only -> precision 1.0
    if truth:
        recall = len(got) / len(truth)
        assert recall >= 0.8, f"LSH recall {recall} over {len(truth)} true pairs"


def test_dedup_clusters_transitive_closure(spark):
    """Cluster assignment must equal the transitive closure of the pair
    graph (pure-Python union-find replay) with min-id canonicals, and
    every doc without a near-dup partner must be a self-canonical
    singleton."""
    from hugegraph_computer_spark.pipeline.dedup import dedup_clusters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = [
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()
    ]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in ids}
    # canonical = min id per component
    canon = {}
    for i, c in comp.items():
        canon.setdefault(c, i)
        canon[c] = min(canon[c], i)
    expect = {i: canon[comp[i]] for i in ids}
    sizes = {}
    for i in ids:
        sizes[expect[i]] = sizes.get(expect[i], 0) + 1

    got = dedup_clusters(docs, threshold=0.4).collect()
    assert len(got) == len(ids)
    for r in got:
        assert r["canonical_id"] == expect[r["doc_id"]]
        assert r["cluster_size"] == sizes[expect[r["doc_id"]]]
        assert r["is_duplicate"] == (r["doc_id"] != r["canonical_id"])
    # non-degenerate: the sf0.001 corpus actually contains dup clusters
    assert any(r["is_duplicate"] for r in got)
