from hugegraph_computer_spark.graph.derive import (
    Graph,
    derive_edges,
    derive_nodes,
    transcripts_from_events,
    undensify,
)
from hugegraph_computer_spark.graph.sources import read_transcripts
from hugegraph_computer_spark.graph.store import ingest, load_graph, save_graph

__all__ = [
    "Graph",
    "derive_edges",
    "derive_nodes",
    "ingest",
    "load_graph",
    "read_transcripts",
    "save_graph",
    "transcripts_from_events",
    "undensify",
]
