from hugegraph_computer_spark.graph.derive import (
    Graph,
    derive_edges,
    derive_nodes,
    transcripts_from_events,
)

__all__ = ["Graph", "derive_edges", "derive_nodes", "transcripts_from_events"]
