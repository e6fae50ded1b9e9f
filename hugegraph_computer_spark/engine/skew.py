"""Skew & small-frontier utilities.

The reference handles hub-vertex skew with a "superedge cache": a hub
sends its (large) neighbor list once per target partition and pointer
messages to the rest (TriangleCount.java:87-115, threshold
`input.minimum_edges_use_superedge_cache` ComputerOptions.java:196-203).
The Spark-native analogues implemented here:

- salted two-stage aggregation for gathers whose combiner is algebraic
  (sum/min/max/count): spreads one hot destination key over `salt`
  reducers, then merges. Spark's map-side partial aggregation already
  absorbs most of this; the explicit salt is for extreme single-key
  skew where even the final reduce of one key's partials is hot.
- broadcast of small frontiers: once an iterative algorithm's changed
  set is tiny (late WCC/SSSP rounds), the scatter join is executed as a
  broadcast-hash join instead of a shuffle — no O(E) shuffle to deliver
  a handful of labels.
- AQE skew-join splitting is enabled globally in session.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BROADCAST_FRONTIER_THRESHOLD = 1_000_000  # rows; conservative for 1000-exec


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_expr: Column,
    out: str,
    merge: str = "sum",
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregate: groupBy(key, salt) -> groupBy(key).

    `merge` must re-reduce the partials: sum->sum, min->min, max->max,
    count->sum (partial counts add). Only valid for algebraic combiners
    (exactly the ones the reference ships: *ValueSumCombiner,
    ValueMin/MaxCombiner)."""
    merge_fn = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.sum}[merge]
    partial = (
        df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "_salt")
        .agg(agg_expr.alias("_partial"))
    )
    return partial.groupBy(key).agg(merge_fn("_partial").alias(out))


def maybe_broadcast(df: DataFrame, approx_rows: int | None) -> DataFrame:
    """Broadcast-hint a frontier when it is known to be small."""
    if approx_rows is not None and approx_rows <= BROADCAST_FRONTIER_THRESHOLD:
        return F.broadcast(df)
    return df
