from __future__ import annotations

import pytest

from hugegraph_computer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hcs-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def make_transcripts(spark, rows):
    """rows: (conv_id, turn_idx, role, tool|None) -> transcript DataFrame."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    import datetime as dt

    full = [
        (
            c,
            i,
            r,
            f"t:{c}:{i}",
            tool,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=7 * i),
        )
        for (c, i, r, tool) in rows
    ]
    return spark.createDataFrame(full, schema)


@pytest.fixture(scope="session")
def sf_graph(spark):
    """Graph derived from the real sf0.001 events table."""
    from hugegraph_computer_spark.graph import Graph, transcripts_from_events

    t = transcripts_from_events(spark, SF_DIR)
    return Graph.from_transcripts(t, partitions=8)


@pytest.fixture(scope="session")
def sf_edge_list(sf_graph):
    """Edge multiset + node list collected for the pure-Python oracles."""
    edges = [(r["src"], r["dst"]) for r in sf_graph.edges.select("src", "dst").collect()]
    nodes = [r["id"] for r in sf_graph.vertices.select("id").collect()]
    return nodes, edges
