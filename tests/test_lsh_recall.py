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
