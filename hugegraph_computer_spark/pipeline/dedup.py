"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH,
SimHash. The scale path is always shuffle-on-key + AQE; no driver-side
pairwise loops anywhere.

At 100 TB: exact dedup is one hash-aggregate; shingling is a pure
projection (zero shuffles — array transform over the token array);
n-gram Jaccard and MinHash/LSH shuffle on shingle/bucket keys
(candidate generation is output-bounded by band width, not O(n^2));
and the final Jaccard verify touches ONLY the candidate pairs — the
shingle table is joined through the candidate list, never self-joined
corpus-wide.

Hashes are md5-based (portable across Spark and DuckDB via
conv(substr(md5, 1, 15), 16, 10)) so every operator here has a
value-level SQL oracle — no engine-specific xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# -- exact -------------------------------------------------------------------


def dedup_exact(docs: DataFrame) -> DataFrame:
    """(doc_id, content_md5, canonical_id, is_duplicate): canonical =
    min doc_id per content hash. One groupBy — the 100 TB baseline."""
    w = Window.partitionBy("content_md5")
    return (
        docs.select("doc_id", F.md5("text").alias("content_md5"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_duplicate", F.col("doc_id") != F.col("canonical_id"))
    )


# -- word n-gram shingles ----------------------------------------------------


def shingles(docs: DataFrame, n: int = 3, max_df: int | None = None) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Zero-shuffle construction: tokens -> array transform over a
    0..len-n index sequence -> array_distinct -> explode. (The previous
    formulation — posexplode + two positional self-joins — cost three
    shuffles for the same rows.)

    max_df: optional hot-shingle cap — drop shingles whose document
    frequency exceeds max_df BEFORE any pair join. A shingle shared by
    k docs contributes k^2 candidate rows to the Jaccard self-join, so
    one stopword trigram makes candidate generation quadratic; capping
    df bounds the join output by max_df^2 per shingle. This is the
    standard near-dup approximation (affects recall only for pairs
    whose ONLY shared shingles are corpus-frequent — at dedup
    thresholds >= 0.4 such pairs share many shingles, so rare-shingle
    overlap still surfaces them). The hot set (df > max_df) is tiny by
    construction and is removed with a broadcast anti-join.
    """
    toks = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    arr = F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )
    sh = docs.select("doc_id", F.explode(arr).alias("shingle"))
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def _jaccard_over_candidates(
    cand: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle Jaccard restricted to candidate (a, b) pairs.

    Two equi-joins keyed by doc id / (doc id, shingle): cost is
    O(|cand| * shingles-per-doc), never corpus-quadratic. `cand` must
    have columns (a, b) with a < b; `sh` is the (doc_id, shingle) table.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sha = sh.select(F.col("doc_id").alias("a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("b"), "shingle")
    common = (
        cand.join(sha, "a")
        .join(shb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = F.col("common") / (F.col("sza") + F.col("szb") - F.col("common"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .where(F.round(jac, 6) >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard >= threshold.
    (a, b, jaccard) with a < b. Pair generation via shingle equi-join —
    only docs sharing at least one (df-capped, see `shingles`) shingle
    are ever compared."""
    sh = shingles(docs, n, max_df=max_df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = F.col("common") / (F.col("sza") + F.col("szb") - F.col("common"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .where(F.round(jac, 6) >= threshold)
    )


# -- MinHash + LSH -----------------------------------------------------------

# Mersenne prime 2^31-1: (p-1)^2 < 2^63, so h*a never overflows int64
# (Spark 4 runs ANSI mode — long overflow is an error, not a wrap)
_MERSENNE = (1 << 31) - 1


def _md5long(col):
    """Portable 60-bit hash: identical in Spark and DuckDB
    (conv(substr(md5(x),1,15),16,10) == ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_coefficients(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Fixed-seed universal-hash coefficients, shared with the SQL oracle."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(num_perm)
    ]


def minhash_signatures(docs: DataFrame, num_perm: int = 32, n: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>) — num_perm universal-hash minima over
    shingle hashes. Shingle base hash = md5long % p (portable to the
    DuckDB oracle); permutations h_i(x) = (a_i*x + b_i) mod p with fixed
    seeds."""
    coeffs = minhash_coefficients(num_perm)
    sh = shingles(docs, n).select(
        "doc_id", (_md5long(F.col("shingle")) % _MERSENNE).alias("h")
    )
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % _MERSENNE).alias(f"s{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"s{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_band_rows(
    sigs: DataFrame, num_perm: int = 32, bands: int = 8
) -> DataFrame:
    """(doc_id, band, bucket) — band key = md5long of the comma-joined
    signature slice (portable bucket hash)."""
    rows_per_band = num_perm // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        _md5long(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bi * rows_per_band + j].cast("string")
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
    n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate pairs verified by exact shingle Jaccard.
    (a, b, jaccard). Band key = hash of one signature slice — the
    candidate join shuffles on (band, bucket), never all-pairs, and the
    Jaccard verify runs ONLY over the candidate pairs (joined back to
    per-doc shingle sets), so LSH's pruning survives into the verify:
    total cost is O(corpus shingling) + O(|candidates| * doc size)."""
    sigs = minhash_signatures(docs, num_perm, n)
    band_rows = minhash_band_rows(sigs, num_perm, bands)
    l, r = band_rows.alias("l"), band_rows.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    return _jaccard_over_candidates(cand, shingles(docs, n), threshold)


# -- SimHash ----------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash: bigint) — per-bit majority vote over token
    md5long hashes, expressed as explode + groupBy sums (pure built-ins;
    one shuffle on doc_id). md5-based token hash keeps the operator
    SQL-oracle-able (bit i of h == (h >> i) & 1 in both engines)."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    h = tok.select("doc_id", _md5long(F.col("w")).alias("h"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


# -- cluster assignment ------------------------------------------------------


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    threshold: float = 0.4,
    n: int = 3,
    max_rounds: int = 50,
) -> DataFrame:
    """Near-duplicate CLUSTER assignment: pairs -> connected components
    -> one canonical doc per cluster.

    Candidate pairs are only half of corpus dedup — near-duplication is
    transitive in practice (A~B and B~C with A~C below threshold), so
    keep-one-per-group semantics need the pair graph's connected
    components, not the pair list. Components run on the O(log d)
    pointer-jumping engine (algorithms/cc_fast.py), so the shuffle-round
    count is logarithmic in the largest cluster's diameter — at corpus
    scale template-generated near-dup chains can be thousands of docs
    deep, where a one-hop-per-round loop would take thousands of
    E-sized shuffles.

    `pairs`: any (a, b[, ...]) near-dup pair table — defaults to
    `ngram_jaccard_pairs(docs, n, threshold)`; the MinHash/SimHash/
    cosine generators plug in unchanged.

    Returns (doc_id, canonical_id, cluster_size, is_duplicate):
    canonical = min doc_id in the component (singletons are their own
    canonical, cluster_size 1) — the same keep-min rule as dedup_exact.
    """
    from hugegraph_computer_spark.algorithms.cc_fast import (
        connected_components,
    )
    from hugegraph_computer_spark.graph.derive import Graph

    if pairs is None:
        pairs = ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    # round 6: connected_components pins the SYMMETRIZED pair graph once
    # up front, so the expensive pair generation (the shingle self-join)
    # executes exactly once into that pin — the previous persist-both-
    # inputs-through-the-loop dance double-stored data that is now read
    # a single time
    verts = docs.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    g = Graph(vertices=verts, edges=edges)
    # labels come back lineage-free (localCheckpoint pin per round)
    labels = connected_components(g, max_rounds=max_rounds).labels
    w = Window.partitionBy("canonical_id")
    return (
        labels.select(
            F.col("id").alias("doc_id"), F.col("comp").alias("canonical_id")
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn(
            "is_duplicate", F.col("doc_id") != F.col("canonical_id")
        )
    )
