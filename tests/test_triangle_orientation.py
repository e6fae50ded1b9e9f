"""Degree-ordered wedge enumeration (round 6): on a star-heavy graph the
candidate volume must be bounded by the LOW-degree endpoints' fan-out,
not the hub's deg² — the weak-at-scale item VERDICT r5 flagged for the
triangle/ktruss family. The fixture pivots the old id-canonical
orientation at a byte-HIGH hub (like the `role:`/`tool:` celebrity
nodes of the transcript graph) and asserts the new orientation's wedge
count collapses while every triangle count stays exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hugegraph_computer_spark.algorithms.triangle import (
    _oriented,
    _triangles_once,
    triangle_count,
)
from hugegraph_computer_spark.graph import Graph


N_LEAVES = 400


@pytest.fixture(scope="module")
def star_graph(spark):
    """A hub with a byte-HIGH id ('zz_hub') connected to N byte-low
    leaves, plus a chain of leaf-leaf edges so real triangles exist:
    leaves a0000..a0399, edges hub<->leaf for all, leaf_i<->leaf_{i+1}
    for i < 40 (40 triangles at the hub)."""
    leaves = [f"a{i:04d}" for i in range(N_LEAVES)]
    edges = [("zz_hub", leaf) for leaf in leaves]
    edges += [(leaves[i], leaves[i + 1]) for i in range(40)]
    edf = spark.createDataFrame(
        [(s, d, 1.0, "und") for s, d in edges], "src string, dst string, weight double, etype string"
    )
    vdf = spark.createDataFrame(
        [(v,) for v in ["zz_hub"] + leaves], "id string"
    )
    return Graph(vertices=vdf, edges=edf)


def _id_oriented_wedges(und):
    """Candidate volume of the OLD id-canonical formulation:
    Σ_mid deg_und(mid) · deg_lower(mid) — what flows through the
    two-hop join when wedges pivot at the byte-order midpoint."""
    deg = und.groupBy(F.col("src").alias("x")).agg(F.count(F.lit(1)).alias("d"))
    lower = (
        und.where(F.col("dst") < F.col("src"))
        .groupBy(F.col("src").alias("x"))
        .agg(F.count(F.lit(1)).alias("dl"))
    )
    row = (
        deg.join(lower, "x")
        .agg(F.sum(F.col("d") * F.col("dl")))
        .collect()[0][0]
    )
    return int(row or 0)


def _degree_oriented_wedges(und):
    """Candidate volume of the NEW formulation: Σ_p C(outdeg_ord(p), 2)
    over the (degree, id)-rank orientation."""
    o = _oriented(und)
    row = (
        o.groupBy("lo")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(F.sum(F.col("od") * (F.col("od") - 1) / 2))
        .collect()[0][0]
    )
    return int(row or 0)


def test_star_candidate_volume_collapses(star_graph):
    und = star_graph.undirected_single().edges.select("src", "dst")
    old_wedges = _id_oriented_wedges(und)
    new_wedges = _degree_oriented_wedges(und)
    # id-orientation pivots every wedge at the byte-high hub: ~deg²/2
    assert old_wedges >= N_LEAVES * (N_LEAVES - 1) // 2
    # degree-orientation pivots at the lowest-degree corner: leaves have
    # out-degree <= 3 in the orientation, so the volume is linear-ish
    assert new_wedges <= 10 * N_LEAVES
    assert new_wedges * 20 < old_wedges


def test_star_triangle_counts_exact(star_graph):
    got = {r["id"]: r["triangles"] for r in triangle_count(star_graph).collect()}
    # hub participates in every leaf-leaf chain triangle
    assert got["zz_hub"] == 40
    # chain leaf i (1 <= i <= 39) is in triangles with neighbors i-1, i+1
    assert got["a0001"] == 2
    assert got["a0000"] == 1
    assert got["a0040"] == 1
    assert got["a0041"] == 0
    assert sum(got.values()) == 3 * 40  # each triangle credits 3 corners


def test_triangles_once_unique(star_graph):
    und = star_graph.undirected_single().edges.select("src", "dst")
    tri = _triangles_once(und)
    assert tri.count() == 40
    # no triangle enumerated twice
    assert tri.dropDuplicates(["p", "a", "b"]).count() == 40
