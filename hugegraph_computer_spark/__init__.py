"""hugegraph_computer_spark — a from-scratch PySpark-native link-graph
analytics engine with the algorithm suite of hugegraph-computer
(reference: starhugegraph/hugegraph-computer, read-only at
/root/reference/), re-expressed as iterative DataFrame message-passing
rounds over an edge table derived from conversation-transcript data.

This is NOT a port: the reference is a Java Pregel/BSP system (netty
transport, etcd barriers, on-disk KV stores). Here every superstep is a
sparse gather-scatter of built-in Spark operators:

  scatter : vertex-state JOIN edges (repartitioned by source)
  gather  : groupBy(dst).agg(<combiner>)   (hash agg, map-side partial)
  master  : df.agg(...).collect() scalars drive convergence on the driver
  barrier : each Spark action is synchronous — the driver loop IS the BSP

Package layout:
  graph/      transcript -> nodes/edges derivation, directed/undirected views
  engine/     generic superstep runner, checkpoint/resume, skew utilities
  algorithms/ PageRank, WCC, LPA, TriangleCount, degree, SSSP, k-core, ...
  pipeline/   training-data ops (dedup, similarity, text analysis)
  oracles/    pure-Python reference-exact implementations for tests
"""

__version__ = "0.1.0"
