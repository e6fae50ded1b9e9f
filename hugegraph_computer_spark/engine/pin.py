"""AQE-safe materialize-and-truncate ("pin") for iterative plans.

localCheckpoint alone converts the UNCACHED plan to an RDD outside
adaptive execution (statically planned join strategies — measured ~60x
slower for complex round shapes, see louvain), while persist alone
keeps the full logical plan growing round-over-round (explain strings
go exponential -> driver OOM). So: force the computation through an
AQE SQL action into cache, THEN checkpoint the (now trivial) cache
scan and release the cache entry. The result is a lineage-free
LogicalRDD leaf that keeps its physical partitioning.

Round-6 measurement note (BENCH/BASELINE.md round-4 floor profile +
this round's re-profile): the per-superstep lazy-localCheckpoint
plan->RDD conversion cost scales with the size of the plan tree being
converted, and a persisted-but-not-pinned base table (e.g. the derived
edge set) re-contributes its whole derivation subtree to EVERY
superstep's plan. Pinning the base tables once at graph build removes
that subtree from all downstream per-step planning.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def static_conversion(spark):
    """Temporarily disable AQE around a localCheckpoint call.

    Two measured effects (round 6, see OPTIMIZATION_r06.md):
    - an AQE-planned checkpoint reports UnknownPartitioning on its
      LogicalRDD, so every downstream key-equal join/aggregation pays a
      fresh Exchange; a statically-planned checkpoint KEEPS the plan's
      hashpartitioning, making steady-state superstep joins
      co-partitioned and exchange-free;
    - AQE's plan->RDD conversion eagerly executes every query stage of
      the plan (each submitted as its own Spark job: broadcast builds,
      shuffle maps), so a lazy checkpoint under AQE pays several
      scheduling round-trips before the action even starts.
    """
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


# SQL confs are per-SESSION, not per-thread, and ComputerDriver runs
# jobs concurrently on one session (engine/driver.py) — so only ONE
# loop at a time may own the static-planning confs. A loop that cannot
# take the lock simply keeps AQE (today's default behavior; values are
# partition-count-independent, only the floor optimization is skipped).
# Non-blocking also makes nested scopes on the same thread safe: the
# inner scope no-ops and inherits the outer confs.
_STATIC_SCOPE_LOCK = threading.Lock()


@contextmanager
def static_plan_scope(spark, partitions: int | None):
    """Scope for a data-derived static round loop: AQE off + the given
    shuffle-partition count, restored on exit (exceptions included).
    `partitions=None` means "keep AQE" and the scope is a no-op — pass
    the result of `PregelRunner._static_step_partitions` directly.
    The scope is also a no-op when another loop currently owns the
    session's planning confs (see _STATIC_SCOPE_LOCK).

    Rationale and measurements: engine/superstep.py (the same planner
    decision the Pregel runner applies through this scope); also used
    by round loops outside the runner (cc_fast, hits)."""
    if partitions is None:
        yield
        return
    if not _STATIC_SCOPE_LOCK.acquire(blocking=False):
        yield
        return
    try:
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    finally:
        _STATIC_SCOPE_LOCK.release()


def pin(df: DataFrame) -> DataFrame:
    """Materialize + truncate lineage, AQE-safely (see module doc).

    The cache fill (count) runs UNDER AQE — complex round plans keep
    adaptive join planning — but the checkpoint of the now-trivial
    cache scan is statically planned so the LogicalRDD keeps its hash
    partitioning (`static_conversion`)."""
    df = df.persist()
    df.count()
    with static_conversion(df.sparkSession):
        out = df.localCheckpoint(eager=True)
    df.unpersist()
    return out


def pin_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """`pin`, also returning the row count the pin already paid for."""
    df = df.persist()
    n = df.count()
    with static_conversion(df.sparkSession):
        out = df.localCheckpoint(eager=True)
    df.unpersist()
    return out, n


def cut_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """Lazy lineage cut + materializing count — ONE pass, one store.

    The lazy localCheckpoint converts under AQE (adaptive execution of
    the plan's stages) and the count materializes the checkpoint blocks
    directly; later references read the stored RDD. Prefer this over
    `pin_counted` unless the preserved hash partitioning of the
    cache-scan pin is specifically needed — the pin stores the data
    twice (columnar cache + checkpoint blocks) for the same effect."""
    df = df.localCheckpoint(eager=False)
    return df, df.count()
