"""Link prediction over the undirected link graph — Adamic-Adar /
common-neighbors scoring of non-adjacent vertex pairs.

Beyond the reference's A1-A16 inventory but squarely in its domain:
the reference ships ring/path/link pattern extraction (rings/Links)
over the same undirected neighbor machinery; this operator is the
standard predictive companion (Adamic & Adar, "Friends and neighbors
on the Web", Social Networks 25(3), 2003):

  score(u, w) = sum over z in N(u) & N(w) of 1 / ln(deg(z))

for pairs (u, w) with at least one common neighbor and NO existing
edge, u < w. Common neighbors with huge degree contribute the least
information (1/ln d -> 0) but the MOST candidate pairs (deg^2 blowup
through role:/tool: hubs), so candidate generation excludes pivots
with undirected degree > `max_degree` — the identical knob shape as
the dedup pipeline's `max_df` hot-shingle cap and the reference's
`limit_edges_in_one_vertex` (ComputerOptions.java:214-221): at 100 TB
the deg^2 term of a single celebrity hub exceeds every other pair
combined while contributing ~0 to any score ranking.

Scale design: one self-join of the degree-capped undirected adjacency
on the pivot key (shuffle co-located by z, each pivot's fan-out
bounded by max_degree^2), one hash aggregation on (u, w), one
broadcast-able anti-join against the edge set, and a
TakeOrderedAndProject top-k — never a full sort. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adamic_adar(graph, max_degree: int = 32, k: int = 100) -> DataFrame:
    """Top-k non-adjacent pairs by Adamic-Adar score.

    Returns (u, w, common_neighbors, aa_score): u < w, common_neighbors
    counts only pivots with undirected degree <= max_degree (the same
    cap the score sum uses, so the two columns stay consistent).
    Deterministic output: ordered by (round(score, 6) DESC, u, w) so
    float noise below the emitted precision cannot reorder the cutoff.
    """
    und = graph.undirected_single().edges.select("src", "dst")
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    mid = deg.where(F.col("d") <= max_degree)
    adj = und.join(mid.withColumnRenamed("id", "src"), "src").select(
        F.col("src").alias("z"), F.col("dst").alias("n"), "d"
    )
    cand = (
        adj.alias("e1")
        .join(adj.alias("e2"), on=F.col("e1.z") == F.col("e2.z"))
        .where(F.col("e1.n") < F.col("e2.n"))
        .select(
            F.col("e1.n").alias("u"),
            F.col("e2.n").alias("w"),
            F.col("e1.d").alias("zd"),
        )
    )
    scored = cand.groupBy("u", "w").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("zd").cast("double"))).alias("aa"),
    )
    nonedge = scored.join(
        und.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    return (
        nonedge.select(
            "u", "w", "common_neighbors", F.round("aa", 6).alias("aa_score")
        )
        .orderBy(F.col("aa_score").desc(), F.col("u").asc(), F.col("w").asc())
        .limit(k)
    )
