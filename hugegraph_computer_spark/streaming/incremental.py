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

import re

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


REPLY_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("etype", T.StringType(), False),
    ]
)

_STITCH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_turn", T.IntegerType(), True),
        T.StructField("pending", T.ArrayType(T.IntegerType()), True),
    ]
)


_DURATION_UNITS = {
    "ms": 1,
    "millisecond": 1,
    "s": 1000,
    "sec": 1000,
    "second": 1000,
    "m": 60_000,
    "min": 60_000,
    "minute": 60_000,
    "h": 3_600_000,
    "hour": 3_600_000,
    "d": 86_400_000,
    "day": 86_400_000,
}


def _duration_ms(spec: str) -> int:
    """'90 seconds' / '90s' / '2 min' / '1.5 hours' -> milliseconds.

    Accepts the same spellings people reach for with Spark's interval
    grammar (number + unit, space optional, trailing 's' optional) and
    fails with a message listing the accepted units — instead of the
    bare KeyError/ValueError a malformed spec used to raise while the
    sibling `lateness` argument silently accepted it (it goes straight
    to withWatermark, whose grammar is richer)."""
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*", spec)
    unit = m.group(2).lower() if m else ""
    key = unit if unit in _DURATION_UNITS else unit.rstrip("s")
    if not m or key not in _DURATION_UNITS:
        raise ValueError(
            f"invalid duration {spec!r}: expected '<number> <unit>' with "
            f"unit one of {sorted(set(_DURATION_UNITS))} (plural ok)"
        )
    return int(float(m.group(1)) * _DURATION_UNITS[key])


def stitch_reply_edges_stream(
    spark: SparkSession,
    transcripts_dir: str,
    edge_store_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    lateness: str = "1 hour",
    state_timeout: str = "30 minutes",
):
    """Reply-edge derivation that SURVIVES conversations split across
    micro-batches: applyInPandasWithState keyed by conv_id remembers
    each conversation's last-seen turn node, so the edge between the
    last turn of one batch and the first turn of the next is emitted —
    batch-parity where the plain foreachBatch path (stream_edges_to)
    assumes batch-complete conversations.

    Arrival order does NOT matter: state per conversation is the last
    *emitted* turn index plus a buffer of not-yet-contiguous turn
    indices. Each batch merges its turns into the buffer (duplicates
    and already-emitted turns dropped), then drains the contiguous
    prefix — so a turn arriving after its successor is held until the
    gap fills, and the emitted edge set equals the batch derivation
    regardless of how turns are split or reordered across batches.
    Turn indices are assumed to start at 0 per conversation (true of
    the derived transcript tables). State is O(out-of-order window)
    ints per live conversation, checkpointed by Structured Streaming's
    state store (RocksDB in prod).

    State is BOUNDED via EventTimeTimeout: each conversation's timeout
    is re-armed at (its latest event time + `state_timeout`) on every
    batch that touches it; once the stream's watermark (max event time
    seen minus `lateness`) passes that, the key times out. On timeout
    any still-buffered turns are flushed as the lag-chain over the
    turns that actually arrived (identical to what the batch
    derivation's `lag` window emits for that partial conversation) and
    the key is removed — so an abandoned conversation costs zero state
    after watermark + timeout, and an unbounded stream holds state only
    for conversations active inside the timeout horizon.

    WATERMARK DROPS: rows with event time older than (max event time
    seen - `lateness`) are discarded by Structured Streaming BEFORE the
    stateful operator — they produce no edges, silently. The default
    lateness is therefore '1 hour' (matching `stream_edges_to`), wide
    enough for the maxFilesPerTrigger=1 file replay of out-of-order
    transcript files; tighten it only when the source's disorder bound
    is known. Audit actual drops with `watermark_drop_counts(query)`.

    POST-EVICTION LATE ARRIVALS (defined semantics): a row that clears
    the watermark but belongs to an already-evicted conversation
    re-initializes that key from scratch (last_turn=-1) — the
    conversation RESUMES AS A NEW PARTIAL ONE. Consequences, bounded
    and intentional:
    - the edge spanning the silence gap (last flushed turn -> first
      resumed turn) is NOT emitted: eviction closed the chain, and
      state that could link across it is gone by design;
    - edges among the resumed turns themselves are emitted with the
      same gap-skipping lag-chain rule, so a turn re-delivered twice
      (at-least-once sources) can re-emit edges already flushed —
      `read_edge_store` compacts exact duplicates away, keeping the
      store at batch parity (tested);
    - the file source used here is exactly-once per file, so in this
      deployment only genuinely NEW turns can arrive post-eviction.
    A conversation only hits this path after > `state_timeout` of
    event-time silence; size the timeout to the source's real
    resumption horizon.

    Returns the started StreamingQuery (availableNow trigger)."""
    import pandas as pd

    timeout_ms = _duration_ms(state_timeout)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(transcripts_dir)
        .withWatermark("ts", lateness)
    )

    def _edges_frame(conv_id, srcs, dsts):
        return pd.DataFrame(
            {
                "src": srcs,
                "dst": dsts,
                "weight": 1.0,
                "etype": "reply",
            }
        )

    def stitch(key, pdfs, state):
        conv_id = key[0]
        if state.hasTimedOut:
            # Watermark passed this conversation's quiet horizon: emit
            # the lag-chain over whatever arrived (== batch derivation
            # on the partial conversation; gaps that never filled are
            # skipped over exactly like F.lag does) and drop the key.
            last_turn = state.get[0]
            pending = sorted(state.get[1] or [])
            state.remove()
            srcs, dsts = [], []
            prev = last_turn
            for t in pending:
                if prev >= 0:
                    srcs.append(f"{conv_id}#{prev:02d}")
                    dsts.append(f"{conv_id}#{t:02d}")
                prev = t
            if srcs:
                yield _edges_frame(conv_id, srcs, dsts)
            return
        batches = [p for p in pdfs]
        rows = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
        if rows.empty:
            return
        if state.exists:
            last_turn = state.get[0]
            pending = set(state.get[1] or [])
        else:
            last_turn, pending = -1, set()
        turns = {int(t) for t in rows["turn_idx"]}
        if any(t >= 100 for t in turns):
            # node ids are formatted ':02d' to match graph/derive.py's
            # lpad(..., 2); a 3-digit turn would silently diverge from
            # the batch ids, so fail loudly instead (TURNS_PER_CONV=16
            # today — this guards the invariant, not a real input)
            raise ValueError(
                f"turn_idx >= 100 in conversation {conv_id}: "
                "node-id format (2-digit lpad) would diverge from batch"
            )
        pending |= {t for t in turns if t > last_turn}
        srcs: list[str] = []
        dsts: list[str] = []
        while (last_turn + 1) in pending:
            pending.discard(last_turn + 1)
            if last_turn >= 0:
                srcs.append(f"{conv_id}#{last_turn:02d}")
                dsts.append(f"{conv_id}#{last_turn + 1:02d}")
            last_turn += 1
        state.update((last_turn, sorted(pending)))
        # Re-arm eviction at this conversation's latest event time plus
        # the timeout. Session tz is UTC (session.py) so the naive
        # pandas timestamp is epoch-UTC, same clock as the watermark;
        # the max() keeps the call legal (must exceed the watermark)
        # even for a key fed entirely by late-but-not-dropped rows.
        wm_ms = state.getCurrentWatermarkMs()
        ts = rows["ts"].dropna()
        ev_ms = int(ts.max().timestamp() * 1000) if len(ts) else wm_ms
        state.setTimeoutTimestamp(max(ev_ms + timeout_ms, wm_ms + 1))
        if not srcs:
            return
        yield _edges_frame(conv_id, srcs, dsts)

    stitched = stream.groupBy("conv_id").applyInPandasWithState(
        stitch,
        outputStructType=REPLY_EDGE_SCHEMA,
        stateStructType=_STITCH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(edge_store_dir)

    return (
        stitched.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def watermark_drop_counts(query) -> dict[str, int]:
    """Surface late-row drops from a (finished or running) streaming
    query's progress: sums `numRowsDroppedByWatermark` across the
    state operators of every recorded progress event. A non-zero count
    means turns arrived later than `lateness` and were silently
    excluded from edge derivation — widen `lateness` or fix the
    source's disorder bound."""
    dropped = 0
    updated = 0
    removed = 0
    for prog in query.recentProgress:
        for op in prog.get("stateOperators", []):
            dropped += int(op.get("numRowsDroppedByWatermark", 0))
            updated += int(op.get("numRowsUpdated", 0))
            removed += int(op.get("numRowsRemoved", 0))
    return {
        "rows_dropped_by_watermark": dropped,
        "state_rows_updated": updated,
        "state_rows_removed": removed,
    }


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
