"""TriangleCount + ClusteringCoefficient — reference-exact counts via
distributed joins (no adjacency-list materialization).

Reference: /root/reference/computer-algorithm/.../community/trianglecount/
TriangleCount.java:41-196 (+ TriangleCountParams.java:41-45: input view is
bothdirection=true, edge_freq=SINGLE) and .../community/cc/
ClusteringCoefficient.java:59-213 (same machinery + C(v)=2T/(D(D-1))).

Reference semantics: superstep 0 collects the deduplicated neighbor set
N(v) over both directions, dropping self-loops (TriangleCount.java:74-85),
and sends L(v) = {w in N(v) : w < v} to every neighbor; superstep 1
counts, per vertex v, sum over u in N(v) of |L(u) ∩ N(v)|
(:174-195). Each triangle {a<b<c} contributes exactly 1 to each corner.

Spark-first formulation: that per-vertex count equals the number of
ordered pairs (u, w) with (v,u) ∈ E_und, (u,w) ∈ E_und, w < u, and
(v,w) ∈ E_und — i.e. a two-hop join semi-joined against the edge set:

    cand = E ⋈ L on (e.dst = l.src)      (L = lower-oriented edges w<u)
    tri  = cand ⋈ E on (v, w)            (closing edge check)
    count(v) = |tri per v|,  0 for triangle-free vertices

This replaces the reference's hub "superedge cache" (one neighbor-list
message per target partition + pointer replay, TriangleCount.java:87-172)
with pure hash joins: the same O(Σ deg(u)·deg_lower(u)) candidate work,
but skew is handled by AQE skew-join splitting instead of a bespoke
message cache — no giant collect_set rows, no 2 GB record ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(g) -> DataFrame:
    """Per-vertex incident-triangle count over the undirected SINGLE view.

    Returns (id, triangles:long) for every vertex in g.vertices."""
    und = g.undirected_single().edges.select("src", "dst")
    lower = und.where(F.col("dst") < F.col("src")).select(
        F.col("src").alias("mid"), F.col("dst").alias("low")
    )
    # two-hop candidates: v -(und)-> mid -(lower)-> low
    cand = und.join(lower, und["dst"] == lower["mid"]).select(
        und["src"].alias("v"), "low"
    )
    # close the wedge: (v, low) must be an undirected edge. Inner join is
    # correct (not semi): und is deduped so (v, low) matches at most once,
    # and each candidate row must be counted individually.
    closing = und.select(F.col("src").alias("v"), F.col("dst").alias("low"))
    tri = cand.join(closing, ["v", "low"], "inner")
    counts = tri.groupBy("v").agg(F.count(F.lit(1)).alias("triangles"))
    return g.vertices.join(counts, g.vertices["id"] == counts["v"], "left").select(
        "id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def clustering_coefficient(g) -> DataFrame:
    """Local clustering coefficient C(v) = 2T / (D(D-1)) with D = |N(v)|
    over the undirected SINGLE view (ClusteringCoefficient.java:55-57);
    C = 0 where D < 2."""
    tri = triangle_count(g)
    und = g.undirected_single().edges
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    joined = tri.join(deg, "id", "left").select(
        "id",
        "triangles",
        F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
    )
    coeff = F.when(
        F.col("degree") >= 2,
        2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    return joined.select("id", "triangles", "degree", coeff.alias("coefficient"))
