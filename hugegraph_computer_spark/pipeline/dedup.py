"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH,
SimHash. The scale path is always shuffle-on-key + AQE; no driver-side
pairwise loops anywhere.

At 100 TB: exact dedup is one hash-aggregate; n-gram Jaccard and
MinHash/LSH shuffle on shingle/bucket keys (candidate generation is
output-bounded by band width, not O(n^2)); the final verify join only
touches candidate pairs.
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


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).
    Built via posexplode + positional self-joins (portable to SQL)."""
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    t0, t1, t2 = tok.alias("t0"), tok.alias("t1"), tok.alias("t2")
    if n != 3:
        raise NotImplementedError("shingle join is generated for n=3")
    tri = (
        t0.join(
            t1,
            (F.col("t0.doc_id") == F.col("t1.doc_id"))
            & (F.col("t0.pos") + 1 == F.col("t1.pos")),
        )
        .join(
            t2,
            (F.col("t0.doc_id") == F.col("t2.doc_id"))
            & (F.col("t0.pos") + 2 == F.col("t2.pos")),
        )
        .select(
            F.col("t0.doc_id").alias("doc_id"),
            F.concat_ws(" ", "t0.w", "t1.w", "t2.w").alias("shingle"),
        )
    )
    return tri.distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.4
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard >= threshold.
    (a, b, jaccard) with a < b. Pair generation via shingle equi-join —
    only docs sharing at least one shingle are ever compared."""
    sh = shingles(docs, n)
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


def minhash_signatures(docs: DataFrame, num_perm: int = 32, n: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>) — num_perm universal-hash minima over
    shingle hashes. Shingle base hash = xxhash64 (JVM, vectorized);
    permutations h_i(x) = (a_i*x + b_i) mod p with fixed seeds."""
    import random

    rnd = random.Random(42)
    coeffs = [(rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE)) for _ in range(num_perm)]
    sh = shingles(docs, n).select(
        "doc_id", (F.abs(F.xxhash64("shingle")) % _MERSENNE).alias("h")
    )
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % _MERSENNE).alias(f"s{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"s{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
    n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate pairs verified by exact shingle Jaccard.
    (a, b, jaccard). Band key = hash of one signature slice — candidate
    join shuffles on (band, bucket), never all-pairs."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, n)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
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
    verified = ngram_jaccard_pairs(docs, n, threshold)
    return cand.join(verified, ["a", "b"], "inner")


# -- SimHash ----------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash: bigint) — per-bit majority vote over token
    xxhash64 values, expressed as explode + groupBy sums (pure built-ins;
    one shuffle on doc_id)."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    h = tok.select("doc_id", F.xxhash64("w").alias("h"))
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
