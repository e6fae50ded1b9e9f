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

Spark-first formulation (degree-ordered wedge enumeration): rank every
vertex by (degree, id) and orient each undirected edge from the LOWER
rank to the higher. Every triangle {x,y,z} with rank(x)<rank(y)<rank(z)
then appears as exactly one oriented wedge x→y, x→z closed by y→z, so
it is enumerated ONCE, at its lowest-rank corner:

    ord    = orient(E_und, by (deg, id))       (out-deg ≤ O(√E) per vertex)
    wedges = ord ⋈ ord on pivot, rank(a)<rank(b)
    tri    = wedges ⋉ ord on (a, b)            (closing-edge semi-join)
    count(v) = corner credits of tri,  0 for triangle-free vertices

This replaces the reference's hub "superedge cache" (one neighbor-list
message per target partition + pointer replay, TriangleCount.java:87-172)
with pure hash joins. The (degree, id) orientation bounds candidate
volume through any pivot by its LOWEST-degree endpoint's out-degree —
O(E·arboricity) total instead of Σ hub-deg² — so a celebrity hub (the
`role:`/`tool:` nodes of the transcript graph, which id-canonical
orientation previously made pivots) contributes ~deg candidates, not
~deg². Residual skew is still split by AQE skew-join at runtime — no
giant collect_set rows, no 2 GB record ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(und: DataFrame) -> DataFrame:
    """(lo, hi, dhi): each undirected edge once, oriented low-rank →
    high-rank under the total order rank(x) = (degree(x), x); dhi is
    the rank-degree of the high endpoint (carried so wedge pairs can be
    rank-ordered without re-joining degrees)."""
    deg = und.groupBy(F.col("src").alias("x")).agg(
        F.count(F.lit(1)).alias("d")
    )
    with_deg = und.join(
        deg.select(F.col("x").alias("src"), F.col("d").alias("ds")), "src"
    ).join(deg.select(F.col("x").alias("dst"), F.col("d").alias("dd")), "dst")
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    # und carries both directions of every edge, so keeping only the
    # rank-ascending copy yields each undirected edge exactly once
    return with_deg.where(fwd).select(
        F.col("src").alias("lo"), F.col("dst").alias("hi"), F.col("dd").alias("dhi")
    )


def _triangles_once(und: DataFrame) -> DataFrame:
    """(p, a, b): every triangle of the undirected SINGLE view exactly
    once, enumerated at its lowest-(degree, id)-rank corner p with
    rank(a) < rank(b).

    The oriented table is referenced three times (both wedge sides +
    the closing semi-join), so it is persisted — computed once, read
    from cache by the other references. A LAZY persist (not an eager
    pin): downstream count-only consumers keep full optimizer freedom
    (the final vertices left-join is eliminated under count(), and a
    lazy cache then never materializes anything), while any consumer
    that touches the data computes the orientation exactly once."""
    o = _oriented(und).persist()
    left = o.select(F.col("lo").alias("p"), F.col("hi").alias("a"), F.col("dhi").alias("da"))
    right = o.select(F.col("lo").alias("p"), F.col("hi").alias("b"), F.col("dhi").alias("db"))
    rank_lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    wedges = left.join(right, "p").where(rank_lt)
    # closing edge: rank(a) < rank(b) means the oriented copy is (a, b)
    closing = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    return wedges.join(closing, ["a", "b"], "left_semi").select("p", "a", "b")


def _counts_from_und(g, und: DataFrame) -> DataFrame:
    """(id, triangles) from a materialized undirected SINGLE view."""
    tri = _triangles_once(und)
    corners = (
        tri.select(F.col("p").alias("v"))
        .unionAll(tri.select(F.col("a").alias("v")))
        .unionAll(tri.select(F.col("b").alias("v")))
    )
    counts = corners.groupBy("v").agg(F.count(F.lit(1)).alias("triangles"))
    return g.vertices.join(counts, g.vertices["id"] == counts["v"], "left").select(
        "id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def triangle_count(g) -> DataFrame:
    """Per-vertex incident-triangle count over the undirected SINGLE view.

    Returns (id, triangles:long) for every vertex in g.vertices."""
    # lazy persist (see _triangles_once): the view feeds the degree agg
    # AND the orientation join, but must not materialize eagerly
    und = g.undirected_single().edges.select("src", "dst").persist()
    return _counts_from_und(g, und)


def clustering_coefficient(g) -> DataFrame:
    """Local clustering coefficient C(v) = 2T / (D(D-1)) with D = |N(v)|
    over the undirected SINGLE view (ClusteringCoefficient.java:55-57);
    C = 0 where D < 2."""
    # one cached undirected view shared by the triangle pass and the
    # degree pass (round 6 — previously derived twice)
    und = g.undirected_single().edges.select("src", "dst").persist()
    tri = _counts_from_und(g, und)
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
