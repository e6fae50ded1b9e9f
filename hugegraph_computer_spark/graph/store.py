"""Persisted-graph ingest — the reference's useMode=input / compute
job split.

Reference: WorkerService.java:440-480 — with useMode=input the workers
load + hash-partition the origin graph into partition files; with
useMode=compute they skip loading entirely and reuse the
previously-ingested partition state, so many algorithm runs amortize
one ingest. The Spark analogue: `ingest` derives the graph once and
writes vertices/edges as parquet keyed the same way the runtime
partitions them; `Graph.load` (via `load_graph`) starts any number of
compute runs from that store without re-derivation.

Scale notes: the store is plain parquet (columnar, splittable); edges
are written pre-repartitioned by src so files are key-clustered. On
load one repartition re-establishes the co-partitioning contract
(parquet cannot carry a Spark partitioner); on a real deployment the
store would be `bucketBy(src)` tables or Iceberg with a sorted layout
so even that shuffle disappears.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from hugegraph_computer_spark.graph.derive import (
    Graph,
    transcripts_from_events,
)


def save_graph(g: Graph, path: str) -> None:
    """useMode=input, phase 2: persist the partitioned graph."""
    verts = g.vertices
    edges = g.edges
    if g.partitions:
        verts = verts.repartition(g.partitions, "id")
        edges = edges.repartition(g.partitions, "src")
    verts.write.mode("overwrite").parquet(os.path.join(path, "vertices"))
    edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"partitions": g.partitions}, f)


def load_graph(
    spark: SparkSession, path: str, partitions: int | None = None, cache: bool = True
) -> Graph:
    """useMode=compute: start from the ingested store, no re-derivation."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    partitions = partitions or meta.get("partitions")
    verts = spark.read.parquet(os.path.join(path, "vertices"))
    edges = spark.read.parquet(os.path.join(path, "edges"))
    if partitions:
        verts = verts.repartition(partitions, "id")
        edges = edges.repartition(partitions, "src")
    if cache:
        verts = verts.persist()
        edges = edges.persist()
    return Graph(vertices=verts, edges=edges, partitions=partitions)


def ingest(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    partitions: int | None = None,
    expand: int = 1,
) -> Graph:
    """useMode=input end-to-end: derive from the events table and
    persist; returns the in-session graph too."""
    g = Graph.from_transcripts(
        transcripts_from_events(spark, sf_dir, expand=expand),
        partitions=partitions,
        cache=False,
    )
    save_graph(g, out_dir)
    return g
