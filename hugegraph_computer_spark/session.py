"""SparkSession factory tuned for iterative graph workloads.

Scale rationale (100 TB / 1000-executor target, tested on local[N]):
- AQE on: runtime coalescing of the per-superstep shuffles and skew-join
  splitting for hub vertices (the reference's "superedge cache" analogue,
  cf. /root/reference/.../trianglecount/TriangleCount.java:87-115).
- shuffle partitions sized to parallelism here; on a real cluster set
  ~2-3x total cores and let AQE coalesce.
- Arrow enabled for the few pandas-UDF paths (no per-row Python anywhere).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hugegraph-computer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N] -> N; local[*] / cluster -> default 32
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = int(inner) if inner.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # prefer the advisory partition size over raw parallelism when
        # coalescing: iterative jobs issue many small shuffles whose task-
        # scheduling overhead otherwise dominates; at 100 TB the advisory
        # size (64 MB) yields full parallelism anyway
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # iterative gather/scatter joins: shuffled-hash beats sort-merge
        # (no per-superstep O(E log E) sorts; build sides are bounded by
        # hash partitioning, and AQE still splits skewed partitions)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: the driver JVM IS the executor — size it for the
        # box (32 concurrent tasks x SHJ build maps at large expansions
        # OOM an 8g heap; the sandbox has 128 GiB). On a real cluster
        # executor memory is the operative knob instead.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
