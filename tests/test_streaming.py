"""Structured-Streaming incremental edge ingest test: two micro-batches
of transcript rows produce the same compacted edge table as one batch
derivation over their union."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hugegraph_computer_spark.graph import derive_edges
from hugegraph_computer_spark.streaming.incremental import (
    read_edge_store,
    stream_edges_to,
)
from tests.conftest import make_transcripts

BATCH1 = [
    ("conv_x", 0, "user", "search"),
    ("conv_x", 1, "assistant", None),
    ("conv_x", 2, "user", "search"),
]
BATCH2 = [
    ("conv_y", 0, "system", None),
    ("conv_y", 1, "agent_0", "sql"),
    ("conv_z", 0, "user", "search"),
    ("conv_z", 1, "assistant", None),
]


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for (c, i, r, tool) in rows:
            f.write(
                json.dumps(
                    {
                        "conv_id": c,
                        "turn_idx": i,
                        "role": r,
                        "text": f"t:{c}:{i}",
                        "tool": tool,
                        "ts": f"2026-01-01T00:00:{7 * i:02d}.000Z",
                    }
                )
                + "\n"
            )


SPLIT_A = [  # first half of conv_s arrives in batch 1 ...
    ("conv_s", 0, "user", "search"),
    ("conv_s", 1, "assistant", None),
]
SPLIT_B = [  # ... the rest in batch 2, plus an unrelated conversation
    ("conv_s", 2, "user", None),
    ("conv_s", 3, "assistant", "code"),
    ("conv_t", 0, "user", "search"),
    ("conv_t", 1, "assistant", None),
]


def test_stitching_survives_split_conversations(spark):
    """A conversation split across micro-batches must still yield the
    cross-batch reply edge (conv_s#01 -> conv_s#02) — the stateful
    stitching the plain foreachBatch ingest cannot do."""
    import os as _os
    import time as _time

    from hugegraph_computer_spark.streaming.incremental import (
        stitch_reply_edges_stream,
    )

    base = tempfile.mkdtemp(prefix="hcs_stitch_")
    src = _os.path.join(base, "in")
    store = _os.path.join(base, "edges")
    ck = _os.path.join(base, "ck")
    _os.makedirs(src)
    try:
        _write_batch(src, "b1.json", SPLIT_A)
        _write_batch(src, "b2.json", SPLIT_B)
        now = _time.time()
        _os.utime(_os.path.join(src, "b1.json"), (now - 60, now - 60))
        _os.utime(_os.path.join(src, "b2.json"), (now, now))
        q = stitch_reply_edges_stream(spark, src, store, ck)
        q.awaitTermination(180)

        got = {
            (r["src"], r["dst"])
            for r in spark.read.parquet(store).collect()
        }
        expected = {
            (r["src"], r["dst"])
            for r in derive_edges(make_transcripts(spark, SPLIT_A + SPLIT_B))
            .where(F.col("etype") == "reply")
            .collect()
        }
        assert got == expected
        assert ("conv_s#01", "conv_s#02") in got  # the cross-batch edge
    finally:
        shutil.rmtree(base, ignore_errors=True)


OOO_A = [  # batch 1: turn 1 is missing (late), turn 2 arrives early
    ("conv_o", 0, "user", "search"),
    ("conv_o", 2, "user", None),
]
OOO_B = [  # batch 2: the late turn 1, a duplicate of turn 0, and turn 3
    ("conv_o", 1, "assistant", None),
    ("conv_o", 0, "user", "search"),
    ("conv_o", 3, "assistant", "code"),
]


def test_stitching_out_of_order_and_duplicates(spark):
    """A turn arriving AFTER its successor (and a replayed duplicate)
    must still yield exactly the batch-derivation reply chain: the
    stitcher buffers non-contiguous turns in state and only emits the
    contiguous prefix, so no reversed or duplicate edges appear."""
    import time as _time

    from hugegraph_computer_spark.streaming.incremental import (
        stitch_reply_edges_stream,
    )

    base = tempfile.mkdtemp(prefix="hcs_ooo_")
    src = os.path.join(base, "in")
    store = os.path.join(base, "edges")
    ck = os.path.join(base, "ck")
    os.makedirs(src)
    try:
        _write_batch(src, "b1.json", OOO_A)
        _write_batch(src, "b2.json", OOO_B)
        now = _time.time()
        os.utime(os.path.join(src, "b1.json"), (now - 60, now - 60))
        os.utime(os.path.join(src, "b2.json"), (now, now))
        q = stitch_reply_edges_stream(spark, src, store, ck)
        q.awaitTermination(180)

        rows = spark.read.parquet(store).collect()
        got = [(r["src"], r["dst"]) for r in rows]
        expected = {
            (r["src"], r["dst"])
            for r in derive_edges(
                make_transcripts(spark, sorted(set(OOO_A + OOO_B), key=lambda t: t[1]))
            )
            .where(F.col("etype") == "reply")
            .collect()
        }
        assert len(got) == len(set(got))  # no duplicate edges
        assert set(got) == expected  # exactly the batch chain 0->1->2->3
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _write_batch_at(d, name, rows, base_iso):
    """Like _write_batch but with an explicit event-time base so tests
    can advance the watermark between micro-batches."""
    with open(os.path.join(d, name), "w") as f:
        for (c, i, r, tool) in rows:
            f.write(
                json.dumps(
                    {
                        "conv_id": c,
                        "turn_idx": i,
                        "role": r,
                        "text": f"t:{c}:{i}",
                        "tool": tool,
                        "ts": f"{base_iso}:{7 * i:02d}.000Z",
                    }
                )
                + "\n"
            )


EVICT_A = [  # batch 1: a gap at turn 1 that never fills (abandoned)
    ("conv_a", 0, "user", "search"),
    ("conv_a", 2, "user", None),
]
EVICT_B = [("conv_b", 0, "user", None), ("conv_b", 1, "assistant", None)]
EVICT_C = [("conv_c", 0, "user", None), ("conv_c", 1, "assistant", None)]


def test_stitching_evicts_idle_conversation_state(spark):
    """An abandoned conversation must (a) have its buffered turns
    flushed as the lag-chain over what actually arrived and (b) have
    its state key REMOVED once the watermark passes its event-time
    timeout — bounded state on an unbounded stream.

    Timeline (lateness 1 minute, state_timeout 10 minutes):
      b1 conv_a at 10:00 (turns 0 and 2; turn 1 never arrives)
      b2 conv_b at 12:00  -> watermark during b2 ~= 09:59 (a alive)
      b3 conv_c at 14:00  -> watermark during b3 ~= 11:59 > 10:10
                             => conv_a times out: flush a#00->a#02,
                                key dropped
    """
    import time as _time

    from hugegraph_computer_spark.streaming.incremental import (
        stitch_reply_edges_stream,
    )

    base = tempfile.mkdtemp(prefix="hcs_evict_")
    src = os.path.join(base, "in")
    store = os.path.join(base, "edges")
    ck = os.path.join(base, "ck")
    os.makedirs(src)
    try:
        _write_batch_at(src, "b1.json", EVICT_A, "2026-01-01T10:00")
        _write_batch_at(src, "b2.json", EVICT_B, "2026-01-01T12:00")
        _write_batch_at(src, "b3.json", EVICT_C, "2026-01-01T14:00")
        now = _time.time()
        for k, name in enumerate(["b1.json", "b2.json", "b3.json"]):
            t = now - 60 + 10 * k
            os.utime(os.path.join(src, name), (t, t))
        q = stitch_reply_edges_stream(
            spark, src, store, ck,
            lateness="1 minute", state_timeout="10 minutes",
        )
        q.awaitTermination(180)
        progress = [p for p in q.recentProgress if p.get("stateOperators")]

        got = [
            (r["src"], r["dst"])
            for r in spark.read.parquet(store).collect()
        ]
        # Flush-on-timeout == batch lag-derivation over the turns that
        # arrived: conv_a's 0->2 edge (skipping the never-filled gap)
        # can ONLY appear via the timeout path, since the contiguity
        # drain held it back during data batches.
        expected = {
            (r["src"], r["dst"])
            for r in derive_edges(
                make_transcripts(spark, EVICT_A + EVICT_B + EVICT_C)
            )
            .where(F.col("etype") == "reply")
            .collect()
        }
        assert len(got) == len(set(got))
        assert set(got) == expected
        assert ("conv_a#00", "conv_a#02") in set(got)
        # State bound: after conv_a's timeout fired its key is gone —
        # the final batch reports at most conv_b + conv_c live keys
        # (never 3), and at least one earlier batch removed a row.
        final_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
        assert final_rows <= 2
        removed = sum(
            p["stateOperators"][0].get("numRowsRemoved", 0) for p in progress
        )
        assert removed >= 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_duration_ms_parsing():
    """_duration_ms accepts the spellings people reach for (space
    optional, plural optional, short units) and rejects garbage with a
    message naming the accepted units — instead of a bare KeyError."""
    import pytest

    from hugegraph_computer_spark.streaming.incremental import _duration_ms

    assert _duration_ms("90 seconds") == 90_000
    assert _duration_ms("90s") == 90_000
    assert _duration_ms("2 min") == 120_000
    assert _duration_ms("1.5 hours") == 5_400_000
    assert _duration_ms("30 minutes") == 1_800_000
    assert _duration_ms("250ms") == 250
    assert _duration_ms("1 day") == 86_400_000
    for bad in ("fortnight", "10 fortnights", "", "10", "h10"):
        with pytest.raises(ValueError, match="expected '<number> <unit>'"):
            _duration_ms(bad)


LATE_DUP = [  # re-delivery of conv_a's already-flushed turns 0 and 2
    ("conv_a", 0, "user", "search"),
    ("conv_a", 2, "user", None),
]
EVICT_D = [("conv_d", 0, "user", None), ("conv_d", 1, "assistant", None)]
EVICT_E = [("conv_e", 0, "user", None), ("conv_e", 1, "assistant", None)]


def test_post_eviction_late_arrival_keeps_store_at_batch_parity(spark):
    """Defined post-eviction semantics (round-4 verdict 'what's wrong'
    #3): a row that clears the watermark but belongs to an ALREADY
    EVICTED conversation re-initializes the key as a new partial
    conversation. Re-delivered turns may re-emit an already-flushed
    edge into the append-only log — and `read_edge_store`'s compaction
    must absorb it, leaving the store at exact batch parity.

    Timeline (lateness 1 minute, state_timeout 10 minutes):
      b1 conv_a {0,2} @10:00        (gap at 1 never fills)
      b2 conv_b @12:00
      b3 conv_c @14:00  -> wm ~11:59 evicts conv_a, flush a#00->a#02
      b4 conv_a {0,2} RE-DELIVERED @14:30 (fresh ts clears the wm;
         state re-initializes at last_turn=-1)
      b5 conv_d @17:00
      b6 conv_e @19:00  -> wm evicts the RESUMED conv_a, whose flush
         re-emits a#00->a#02 (duplicate in the raw log)
    """
    import time as _time

    from hugegraph_computer_spark.streaming.incremental import (
        stitch_reply_edges_stream,
        watermark_drop_counts,
    )

    base = tempfile.mkdtemp(prefix="hcs_lateevict_")
    src = os.path.join(base, "in")
    store = os.path.join(base, "edges")
    ck = os.path.join(base, "ck")
    os.makedirs(src)
    try:
        _write_batch_at(src, "b1.json", EVICT_A, "2026-01-01T10:00")
        _write_batch_at(src, "b2.json", EVICT_B, "2026-01-01T12:00")
        _write_batch_at(src, "b3.json", EVICT_C, "2026-01-01T14:00")
        _write_batch_at(src, "b4.json", LATE_DUP, "2026-01-01T14:30")
        _write_batch_at(src, "b5.json", EVICT_D, "2026-01-01T17:00")
        _write_batch_at(src, "b6.json", EVICT_E, "2026-01-01T19:00")
        now = _time.time()
        names = [f"b{k}.json" for k in range(1, 7)]
        for k, name in enumerate(names):
            t = now - 70 + 10 * k
            os.utime(os.path.join(src, name), (t, t))
        q = stitch_reply_edges_stream(
            spark, src, store, ck,
            lateness="1 minute", state_timeout="10 minutes",
        )
        q.awaitTermination(240)

        raw = [
            (r["src"], r["dst"])
            for r in spark.read.parquet(store).collect()
        ]
        # the resumed conversation's timeout flush re-emitted the edge
        assert raw.count(("conv_a#00", "conv_a#02")) == 2
        # ... and the compacted view is exactly the batch derivation
        # over the distinct turns (conv_a's re-delivery adds nothing)
        compacted = {
            (r["src"], r["dst"])
            for r in read_edge_store(spark, store)
            .where(F.col("etype") == "reply")
            .collect()
        }
        expected = {
            (r["src"], r["dst"])
            for r in derive_edges(
                make_transcripts(
                    spark, EVICT_A + EVICT_B + EVICT_C + EVICT_D + EVICT_E
                )
            )
            .where(F.col("etype") == "reply")
            .collect()
        }
        assert compacted == expected
        # drop audit surface: nothing here was watermark-dropped (the
        # re-delivery carried a fresh ts), and both evictions of conv_a
        # show up as state removals
        counts = watermark_drop_counts(q)
        assert counts["rows_dropped_by_watermark"] == 0
        assert counts["state_rows_removed"] >= 2
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_ingest_matches_batch(spark):
    base = tempfile.mkdtemp(prefix="hcs_stream_")
    src = os.path.join(base, "in")
    store = os.path.join(base, "edges")
    ck = os.path.join(base, "ck")
    os.makedirs(src)
    try:
        _write_batch(src, "b1.json", BATCH1)
        _write_batch(src, "b2.json", BATCH2)
        q = stream_edges_to(spark, src, store, ck)
        q.awaitTermination(120)

        got = {
            (r["src"], r["dst"], r["etype"]): r["weight"]
            for r in read_edge_store(spark, store).collect()
        }
        expected = {
            (r["src"], r["dst"], r["etype"]): r["weight"]
            for r in derive_edges(make_transcripts(spark, BATCH1 + BATCH2)).collect()
        }
        # reply/mention edges identical; uses/copart weights additive
        # across batches == batch counts because batches hold complete,
        # disjoint conversations
        assert got == expected
    finally:
        shutil.rmtree(base, ignore_errors=True)
