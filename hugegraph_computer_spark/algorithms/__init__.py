from hugegraph_computer_spark.algorithms.cc_fast import (
    connected_components,
    wcc_fast,
)
from hugegraph_computer_spark.algorithms.degree import degree_centrality
from hugegraph_computer_spark.algorithms.lpa import Lpa
from hugegraph_computer_spark.algorithms.pagerank import PageRank
from hugegraph_computer_spark.algorithms.triangle import (
    clustering_coefficient,
    triangle_count,
)
from hugegraph_computer_spark.algorithms.wcc import Wcc

__all__ = [
    "PageRank",
    "Wcc",
    "Lpa",
    "triangle_count",
    "clustering_coefficient",
    "degree_centrality",
    "connected_components",
    "wcc_fast",
]
