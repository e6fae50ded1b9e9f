"""DegreeCentrality — single-superstep out-degree / weight-sum.

Reference: /root/reference/computer-algorithm/.../centrality/degree/
DegreeCentrality.java:61-110: value = numEdges, or when
calculateByWeightProperty the sum of the numeric edge weight property
(missing weight -> 1.0, weightValue() :90-107); vertex inactivates
immediately (single superstep). Pure groupBy — one shuffle, map-side
partial agg, trivially scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_centrality(g, by_weight: bool = False) -> DataFrame:
    if by_weight:
        agg = F.sum(F.coalesce(F.col("weight"), F.lit(1.0))).alias("degree")
    else:
        agg = F.count(F.lit(1)).cast("double").alias("degree")
    deg = g.edges.groupBy(F.col("src").alias("id")).agg(agg)
    return g.vertices.join(deg, "id", "left").select(
        "id", F.coalesce("degree", F.lit(0.0)).alias("degree")
    )
