"""Structured-Streaming transcript ingest (beyond-reference).

The reference is strictly batch-iterative (SURVEY.md §2.3: no
watermarks/windows/state). A production transcript pipeline, however,
receives conversations continuously; this module ingests transcript
micro-batches and maintains the derived edge table incrementally so
the batch algorithms always run against fresh data:

  readStream(transcripts dir, file source)
    -> watermark on ts (late turns tolerated up to `lateness`)
    -> foreachBatch: derive the batch's edges (same derive_edges code
       path as batch) and append to the edge store; counters for
       uses/copart are additive, so appended rows aggregate correctly
       when the store is read with groupBy(src,dst,etype).sum(weight).

At 100 TB-rate this is the standard bronze->silver incremental design:
file/Kafka source, append-only edge log partitioned by etype, periodic
compaction; algorithms read the compacted view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hugegraph_computer_spark.graph.derive import derive_edges

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def stream_edges_to(
    spark: SparkSession,
    transcripts_dir: str,
    edge_store_dir: str,
    checkpoint_dir: str,
    lateness: str = "1 hour",
):
    """Returns the started StreamingQuery. Complete conversations per
    micro-batch are assumed (reply edges need adjacent turns; a
    production version keys state by conv_id with
    applyInPandasWithState to stitch split conversations)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(transcripts_dir)
        .withWatermark("ts", lateness)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        edges = derive_edges(batch_df)
        (
            edges.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("etype")
            .parquet(edge_store_dir)
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_edge_store(spark: SparkSession, edge_store_dir: str) -> DataFrame:
    """Compacted view of the append-only edge log: additive weights
    re-aggregated, duplicates across batches merged."""
    raw = spark.read.parquet(edge_store_dir)
    additive = raw.where(F.col("etype").isin("uses", "copart"))
    unit = raw.where(~F.col("etype").isin("uses", "copart"))
    return (
        unit.select("src", "dst", "weight", "etype")
        .dropDuplicates(["src", "dst", "etype"])
        .unionByName(
            additive.groupBy("src", "dst", "etype").agg(
                F.sum("weight").alias("weight")
            ).select("src", "dst", "weight", "etype")
        )
    )
