from hugegraph_computer_spark.graph.derive import (
    Graph,
    derive_edges,
    derive_nodes,
    transcripts_from_events,
    undensify,
)

__all__ = [
    "Graph",
    "derive_edges",
    "derive_nodes",
    "transcripts_from_events",
    "undensify",
]
