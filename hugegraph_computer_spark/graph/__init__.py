from hugegraph_computer_spark.graph.derive import (
    Graph,
    derive_edges,
    derive_nodes,
    transcripts_from_events,
    undensify,
)
from hugegraph_computer_spark.graph.sources import read_transcripts
from hugegraph_computer_spark.graph.store import (
    ingest,
    ingest_bucketed,
    load_graph,
    load_graph_bucketed,
    load_mapping,
    load_mapping_bucketed,
    save_graph,
    save_graph_bucketed,
)

__all__ = [
    "Graph",
    "derive_edges",
    "derive_nodes",
    "ingest",
    "ingest_bucketed",
    "load_graph",
    "load_graph_bucketed",
    "load_mapping",
    "load_mapping_bucketed",
    "read_transcripts",
    "save_graph",
    "save_graph_bucketed",
    "transcripts_from_events",
    "undensify",
]
