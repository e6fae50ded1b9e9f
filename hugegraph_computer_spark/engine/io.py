"""Output sinks & property combiners — the reference's R15-R18 surface.

Sinks (reference /root/reference/computer-core/.../output/):
- log sink (LogOutput.java:33-56, LimitedLogOutput): console show
- hdfs csv sink + partition merge (hdfs/HdfsOutput.java:50-124,
  HdfsOutputMerger): csv writer, merge == coalesce(1)
- blank-value filter (FilterBlankValueHdfsOutput.java): drop rows with
  empty result values before writing
- write-back sink (hg/HugeOutput.java:35-83): results table keyed by
  (algorithm, vertex) — parquet directory layout here, Iceberg in prod

Property combiners (computer-api/.../combiner/, options
worker.vertex_properties_combiner_class / worker.edge_properties_-
combiner_class, ComputerOptions.java:565-583): when duplicate
vertices/edges are loaded, merge their property maps by OVERWRITE
(last), MERGE_OLD (first wins per key) or MERGE_NEW (last wins per key)
— here groupBy + first/last over the identity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# -- sinks -------------------------------------------------------------------


def log_output(result: DataFrame, limit: int | None = None) -> None:
    """LogOutput / LimitedLogOutput analogue (dev only)."""
    result.show(n=limit or 20, truncate=False)


def csv_output(
    result: DataFrame,
    path: str,
    merge_partitions: bool = False,
    filter_blank: str | None = None,
) -> None:
    """HdfsOutput analogue: one csv part per partition; merge ==
    coalesce(1) (HdfsOutputMerger); filter_blank drops empty values
    (FilterBlankValueHdfsOutput)."""
    df = result
    if filter_blank is not None:
        df = df.where(
            F.col(filter_blank).isNotNull() & (F.col(filter_blank).cast("string") != "")
        )
    if merge_partitions:
        df = df.coalesce(1)
    df.write.mode("overwrite").option("header", True).csv(path)


def results_table_output(result: DataFrame, path: str, algorithm: str) -> None:
    """HugeOutput analogue: append results keyed by (algorithm, vertex);
    partitioned parquet here, format('iceberg') on a real deployment."""
    (
        result.withColumn("algorithm", F.lit(algorithm))
        .write.mode("append")
        .partitionBy("algorithm")
        .parquet(path)
    )


# -- property combiners ------------------------------------------------------


def combine_properties(
    df: DataFrame, key_cols: list[str], mode: str = "overwrite"
) -> DataFrame:
    """Merge duplicate rows by key. overwrite == keep last record's
    values (OverwriteCombiner); merge_old == first non-null per column
    (MergeOldPropertiesCombiner); merge_new == last non-null per column
    (MergeNewPropertiesCombiner).

    "First/last" is defined by the full-row (all value columns) sort
    order, enforced INSIDE the aggregate: per column we collect
    (order_key, value) structs for non-null values and pick the
    array_sort min/max — deterministic on any partitioning (Spark hash
    aggregation does NOT preserve a prior orderBy, so first/last over a
    sorted input would be partition-order-dependent)."""
    value_cols = [c for c in df.columns if c not in key_cols]
    if mode == "overwrite":
        aggs = [F.max(F.struct(*value_cols)).alias("_s")]
        out = df.groupBy(*key_cols).agg(*aggs)
        return out.select(*key_cols, *[F.col(f"_s.{c}").alias(c) for c in value_cols])
    if mode in ("merge_old", "merge_new"):
        order_key = F.struct(*[F.col(c) for c in value_cols])
        pos = 1 if mode == "merge_old" else -1
        aggs = []
        for c in value_cols:
            pairs = F.when(
                F.col(c).isNotNull(),
                F.struct(order_key.alias("o"), F.col(c).alias("v")),
            )
            # try_element_at: a column that is NULL in every row of the
            # group collects to an empty array — plain element_at throws
            # under ANSI mode (Spark 4 default); the combiner must yield
            # NULL for that case (sparse-property parity with the old
            # first/last(ignorenulls=True) behavior).
            aggs.append(
                F.try_element_at(F.array_sort(F.collect_list(pairs)), F.lit(pos))[
                    "v"
                ].alias(c)
            )
        return df.groupBy(*key_cols).agg(*aggs)
    raise ValueError(f"unknown combiner mode: {mode}")
