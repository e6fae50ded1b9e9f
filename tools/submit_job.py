"""Sample spark-submit job: transcripts -> link graph -> PageRank.

Run (the package arrives on sys.path via --py-files, no install):

    spark-submit --master local[4] \
        --py-files dist/hugegraph_computer_spark.zip \
        tools/submit_job.py /root/testdata/sf0.001 [supersteps]

Prints one JSON line with graph sizes, superstep count, and the top-5
ranked vertices. Uses a plain SparkSession.builder (the session the
cluster/submit environment provides), not the repo's get_spark factory
— the engine must run under any externally-built session.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from hugegraph_computer_spark.algorithms import PageRank
from hugegraph_computer_spark.engine import PregelRunner
from hugegraph_computer_spark.graph import Graph, read_transcripts


def main() -> None:
    source = sys.argv[1]
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = SparkSession.builder.getOrCreate()

    # the driver passes an events-table directory in the sandbox layout;
    # accept either a ready transcript source or an events parquet dir
    import os

    if os.path.isdir(source) and os.path.exists(
        os.path.join(source, "events.parquet")
    ):
        from hugegraph_computer_spark.graph import transcripts_from_events

        transcripts = transcripts_from_events(spark, source)
    else:
        transcripts = read_transcripts(spark, source)

    g = Graph.from_transcripts(transcripts)
    res = PregelRunner().run(PageRank(max_supersteps=supersteps), g)
    top = [
        {"id": r["id"], "rank": round(r["rank"], 6)}
        for r in res.state.orderBy("rank", ascending=False).limit(5).collect()
    ]
    print(
        json.dumps(
            {
                "vertices": g.num_vertices,
                "edges": g.edges.count(),
                "supersteps": res.supersteps,
                "top5": top,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
