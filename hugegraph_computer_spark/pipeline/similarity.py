"""Similarity search over the embeddings table (array<float> column).

- brute-force cosine top-k: the exactness baseline — broadcast the
  (small) query set against all vectors; dot product via zip_with +
  aggregate (JVM-side, no Python).
- LSH-bucketed variant (random hyperplane signs): the scale path —
  candidates meet only inside matching sign-buckets, shuffle on the
  bucket key; at 100 TB this replaces the all-pairs cross join with an
  output-bounded equi-join (same pattern as MinHash LSH for text).
- cosine near-duplicate pairs: all-pairs >= threshold via the bucketed
  candidates (exact verify on the candidate set).

Ranking determinism: order by round(cos, 4) desc then vec_id, so FP
noise between engines cannot flip ranks (exact ties fall back to id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def ann_topk_bruteforce(
    emb: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Top-k cosine neighbors for vec_id < n_queries (self excluded).
    (query_id, neighbor_id, rank, cosine)."""
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cand = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    )
    scored = cand.where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qe"), F.col("ce")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (no numpy state leakage)."""
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(emb: DataFrame, dim: int = 64, n_planes: int = 8) -> DataFrame:
    """(vec_id, bucket) — sign pattern under fixed random hyperplanes,
    computed as zip_with dot products against literal arrays."""
    if n_planes == 0:  # exhaustive single bucket (small-input audit mode)
        return emb.select("vec_id", "embedding", F.lit(0).alias("bucket"))
    planes = _hyperplanes(dim, n_planes)
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.select("vec_id", "embedding", bucket.cast("int").alias("bucket"))


def _centroids(dim: int, k: int, seed: int = 43):
    """Deterministic pseudo-random IVF centroids (fixed seed, shared
    with the SQL oracle)."""
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(k)]


def _dot_literal_spark(vec: list[float]) -> str:
    """Spark-SQL dot product of `embedding` with a literal vector —
    a left fold in index order (matches the DuckDB oracle's list_sum
    op order so cluster assignments agree bit-for-bit)."""
    lits = ", ".join(repr(float(x)) + "D" for x in vec)
    return (
        f"aggregate(zip_with(embedding, array({lits}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
    )


def ivf_assign_case(dot_exprs: list[str]) -> str:
    """Shared argmax-as-CASE over per-centroid dot expressions: first
    index whose dot is >= all later ones (identical tie-break in both
    engines because the CASE order is identical). Dots are rounded to
    6 decimals inside the comparison: Spark's aggregate() is a strict
    left fold while DuckDB's list_sum does not document summation
    order, so without rounding a last-ulp difference near a tie could
    assign a vector to different clusters in engine vs oracle."""
    rounded = [f"round({d}, 6)" for d in dot_exprs]
    k = len(rounded)
    arms = []
    for i in range(k - 1):
        conds = " AND ".join(
            f"({rounded[i]}) >= ({rounded[j]})" for j in range(i + 1, k)
        )
        arms.append(f"WHEN {conds} THEN {i}")
    return "CASE " + " ".join(arms) + f" ELSE {k - 1} END"


def ann_topk_ivf(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_clusters: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF-Flat ANN, nprobe=1: vectors partition into `n_clusters`
    coarse cells (argmax dot against fixed centroids); a query scans
    ONLY its own cell. (query_id, neighbor_id, rank, cosine).

    The 100 TB shape: assignment is a pure projection; the probe is an
    equi-join on `cluster` — scan cost drops to ~1/n_clusters of the
    corpus per query instead of the brute-force full scan, at the usual
    IVF recall trade (neighbors in adjacent cells are missed; raise
    n_clusters + nprobe for the real tuning curve). With n_clusters=1
    this degrades to exact brute force (pytest-asserted)."""
    dots = [_dot_literal_spark(c) for c in _centroids(dim, n_clusters)]
    assigned = emb.select(
        "vec_id", "embedding",
        F.expr(ivf_assign_case(dots)).alias("cluster") if n_clusters > 1
        else F.lit(0).alias("cluster"),
    )
    q = assigned.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        "cluster",
    )
    cand = F.broadcast(q).join(
        assigned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ce"),
            "cluster",
        ),
        "cluster",
    )
    scored = cand.where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qe"), F.col("ce")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_neardup_pairs(
    emb: DataFrame, threshold: float = 0.9, dim: int = 64, n_planes: int = 6
) -> DataFrame:
    """(a, b, cosine) pairs with cosine >= threshold, candidates from
    sign-buckets (near-identical vectors share all signs w.h.p.).
    For exactness-auditing small inputs use n_planes=0 (single bucket)."""
    b = lsh_bucket(emb, dim, n_planes)
    l = b.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea"), "bucket"
    )
    r = b.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb"), "bucket"
    )
    cand = l.join(r, "bucket").where(F.col("a") < F.col("b"))
    scored = cand.select(
        "a", "b", F.round(_cosine(F.col("ea"), F.col("eb")), 4).alias("cosine")
    )
    return scored.where(F.col("cosine") >= threshold)


def cosine_neardup_exact(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """All-pairs exact variant (the oracle-matched baseline)."""
    l = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    r = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    cand = l.crossJoin(r).where(F.col("a") < F.col("b"))
    scored = cand.select(
        "a", "b", F.round(_cosine(F.col("ea"), F.col("eb")), 4).alias("cosine")
    )
    return scored.where(F.col("cosine") >= threshold)
