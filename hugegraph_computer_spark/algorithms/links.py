"""Links — predicate-driven path extraction, reference semantics.

Reference: /root/reference/computer-algorithm/.../path/links/
Links.java:36-130 (+ LinksConditionDescribe.java, LinksSpreadFilter.java):
start vertices emit a walk; the walk spreads along edges passing an
edge predicate; when it reaches an END vertex the (vertex-path) is
recorded at that vertex and the walk stops (end vertices do not
forward, Links.java:53-56/:85-88). The reference's aviator expression
predicates map to Spark Column expressions.

Simplifications vs the reference (documented): edge ids are omitted
from the recorded path (our derived edges are identified by
(src,dst,etype) which the vertex path + edge filter already determine),
and end-EDGE conditions are subsumed by end-vertex conditions here.
No cycle check exists in the reference either — max_rounds bounds the
walk exactly like bsp.max_super_step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def links(
    g,
    start: Column,
    end: Column,
    edge_filter: Column | None = None,
    max_rounds: int = 10,
) -> DataFrame:
    """start/end: boolean Columns over vertex `id`; edge_filter: boolean
    Column over edge columns. Returns (id, path: array<string>) — one
    row per recorded walk, at the end vertex that recorded it."""
    spark = g.vertices.sparkSession
    edges = g.edges if edge_filter is None else g.edges.where(edge_filter)
    e = edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))

    verts = g.vertices.select(
        "id", start.alias("is_start"), end.alias("is_end")
    ).localCheckpoint(eager=True)

    results = spark.createDataFrame([], "id string, path array<string>")

    # compute0: start vertices that are themselves end record [self]
    starts = verts.where("is_start")
    self_end = starts.where("is_end").select(
        "id", F.array(F.col("id")).alias("path")
    )
    results = results.unionByName(self_end)

    # spreading starts: path=[self] along passing edges
    frontier = (
        starts.where(~F.col("is_end"))
        .join(e, starts["id"] == e["e_src"])
        .select(F.col("e_dst").alias("dst"), F.array(F.col("id")).alias("path"))
        .localCheckpoint(eager=True)
    )

    rounds = 0
    while rounds < max_rounds and not frontier.isEmpty():
        rounds += 1
        cur = frontier.join(verts, frontier["dst"] == verts["id"]).select(
            "id", "path", "is_end"
        )
        ended = cur.where("is_end").select(
            "id", F.concat("path", F.array(F.col("id"))).alias("path")
        )
        results = results.unionByName(ended).localCheckpoint(eager=True)

        cont = cur.where(~F.col("is_end")).select(
            "id", F.concat("path", F.array(F.col("id"))).alias("path")
        )
        frontier = (
            cont.join(e, cont["id"] == e["e_src"])
            .select(F.col("e_dst").alias("dst"), "path")
            .localCheckpoint(eager=True)
        )
    return results


def links_as_strings(g, start, end, edge_filter=None, max_rounds=10) -> DataFrame:
    return links(g, start, end, edge_filter, max_rounds).select(
        "id", F.array_join("path", "->").alias("path")
    )
