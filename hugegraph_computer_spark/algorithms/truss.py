"""k-truss decomposition — iterative triangle-support edge peeling.

The k-truss is the maximal subgraph in which every edge closes at
least k-2 triangles WITHIN the subgraph (Cohen, "Trusses: cohesive
subgraphs for social network analysis", NSA tech report 2008) — the
standard cohesion notion one notch stronger than the reference's
k-core (computer-algorithm/.../community/kcore/Kcore.java, A10): a
k-core bounds vertex degree, a k-truss bounds edge embeddedness, and
the peeling loop has the identical alternate-remove-and-recheck shape
as the reference's k-core superstep cascade.

Algorithm, on the canonical undirected edge set (u < v, deduped,
self-loop-free — the TriangleCount input view):

  repeat:
    support(u,v) = # triangles containing (u,v) in the CURRENT set
    drop every edge with support < k-2
  until no edge is dropped

Triangles are enumerated once each as ordered wedges (a<b<c: edges
(a,b),(b,c) joined on the middle vertex, closed by membership of
(a,c)) — exactly the gated `triangle_count` join shape, re-run per
peel round because support must be recomputed INSIDE the shrinking
subgraph. Per round: one self-join shuffle + one membership semi-join
+ one support aggregation, all JVM-side; the round result is pinned
(louvain._pin) and the convergence check is a cached count, so the
loop adds one scalar action per round. Removal cascades terminate in
a handful of rounds in practice (peeling only re-examines survivors);
`max_rounds` bounds the loop defensively.

Scale note: wedge fan-out through a celebrity hub b is deg(b)^2/2.
The id-canonical orientation used here keeps the oracle expressible;
the classic refinement at extreme skew — orienting edges by
(degree, id) so every wedge pivot is the LOWEST-degree endpoint,
bounding fan-out by arboricity — changes no semantics and slots into
`_wedge_support` alone.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hugegraph_computer_spark.algorithms.louvain import _pin


@dataclass
class TrussResult:
    edges: DataFrame  # (u, v, support) — the k-truss subgraph
    rounds: int


def _wedge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle count within the canonical edge set `e`(u, v):
    enumerate each triangle a<b<c once, then credit all three edges."""
    tri = (
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(
            e.select(F.col("u").alias("b"), F.col("v").alias("c")), "b"
        )
        .join(
            e.select(F.col("u").alias("a"), F.col("v").alias("c")),
            ["a", "c"],
            "left_semi",
        )
    )
    sides = tri.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        tri.select(F.col("b").alias("u"), F.col("c").alias("v"))
    ).unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
    return sides.groupBy("u", "v").agg(F.count("*").alias("support"))


def ktruss(graph, k: int = 4, max_rounds: int = 30) -> TrussResult:
    """Peel to the k-truss; returns surviving (u, v, support) with the
    support measured inside the final subgraph, plus the round count."""
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    edges = _pin(
        graph.undirected_single()
        .edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    n_edges = edges.count()
    rounds = 0
    survivors = edges.withColumn("support", F.lit(0).cast("long")).limit(0)
    while rounds < max_rounds:
        rounds += 1
        # edges with zero triangles fall out of the aggregation and are
        # thereby dropped — correct for every k >= 3 (0 < k-2)
        survivors = _pin(
            _wedge_support(edges).where(F.col("support") >= k - 2)
        )
        n_new = survivors.count()
        if n_new == n_edges:  # survivors ⊆ edges, so equal count = fixpoint
            break
        n_edges = n_new
        edges = survivors.select("u", "v")
        if n_edges == 0:
            break
    return TrussResult(edges=survivors, rounds=rounds)
