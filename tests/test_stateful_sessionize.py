"""Gap sessionization: batch (lag+running-sum windows) and streaming
(applyInPandasWithState) must agree; streaming state must survive
micro-batch boundaries via the checkpoint (the property no windowed agg
has)."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.streaming.stateful import (
    sessionize,
    sessionize_stream,
)

EV_SCHEMA = "event_id long, ts timestamp, user_id long, value double"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(i, secs, user, val=1.0):
    return (i, T0 + dt.timedelta(seconds=secs), user, val)


# user 1: two sessions (gap 100s > 60s); user 2: one session
BATCH1 = [
    _ev(0, 0, 1), _ev(1, 30, 1), _ev(2, 130, 1, 2.5),
    _ev(3, 10, 2), _ev(4, 50, 2),
]
# user 1's 130s-session CONTINUES at 170s (gap 40 <= 60) then breaks at 300
BATCH2 = [
    _ev(5, 170, 1), _ev(6, 300, 1),
    _ev(7, 80, 2),  # continues user 2's open session (gap 30)
]


def _batch_rows(spark, rows):
    got = sessionize(spark.createDataFrame(rows, EV_SCHEMA), gap_secs=60)
    return sorted(
        (
            r["user_id"],
            r["session_start"].isoformat(),
            r["session_end"].isoformat(),
            r["n_events"],
            round(r["sum_value"], 4),
        )
        for r in got.collect()
    )


def test_batch_sessionize(spark):
    rows = _batch_rows(spark, BATCH1)
    assert rows == [
        (1, "2024-01-01T00:00:00", "2024-01-01T00:00:30", 2, 2.0),
        (1, "2024-01-01T00:02:10", "2024-01-01T00:02:10", 1, 2.5),
        (2, "2024-01-01T00:00:10", "2024-01-01T00:00:50", 2, 2.0),
    ]


def _run_stream_once(spark, src_dir, ckpt, out_dir):
    """One availableNow run into a durable parquet sink (the memory sink
    cannot recover from a checkpoint, which is the whole point here).
    Returns the rows this run APPENDED."""
    before = set()
    try:
        before = {
            tuple(r)
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        pass
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src_dir)
    q = (
        sessionize_stream(stream, gap_secs=60)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r for r in spark.read.parquet(out_dir).collect() if tuple(r) not in before]
    return rows


def test_streaming_sessionize_state_spans_batches(spark, tmp_path):
    """Closed sessions emitted across two availableNow runs (shared
    checkpoint) must equal the batch sessionization of the UNION minus
    each user's still-open tail session — proof the open session rode
    the state store across the run boundary instead of being cut at it."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(BATCH1, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out1 = _run_stream_once(spark, src, ckpt, out)
    emitted1 = {
        (r["user_id"], r["session_start"].isoformat()) for r in out1
    }
    # batch 1 alone: user 1's [0,30] closed by the 130s event; everything
    # else is still open in state
    assert emitted1 == {(1, "2024-01-01T00:00:00")}

    spark.createDataFrame(BATCH2, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = _run_stream_once(spark, src, ckpt, out)
    emitted = sorted(
        (
            r["user_id"],
            r["session_start"].isoformat(),
            r["session_end"].isoformat(),
            r["n_events"],
            round(r["sum_value"], 4),
        )
        for r in out2
    )
    # user 1's open 130s session ABSORBED the 170s event from run 2 (state
    # carried across the boundary), then closed by the 300s event:
    assert emitted == [
        (1, "2024-01-01T00:02:10", "2024-01-01T00:02:50", 2, 3.5),
    ]

    # cross-check vs batch semantics: closed streaming sessions == batch
    # sessions of the union minus each user's open tail
    all_batch = _batch_rows(spark, BATCH1 + BATCH2)
    tails = {}
    for row in all_batch:
        tails[row[0]] = row  # sorted => last per user wins
    expect_closed = sorted(r for r in all_batch if r != tails[r[0]])
    got_closed = sorted(
        set(
            (
                r["user_id"],
                r["session_start"].isoformat(),
                r["session_end"].isoformat(),
                r["n_events"],
                round(r["sum_value"], 4),
            )
            for r in out1
        )
        | set(
            (
                r["user_id"],
                r["session_start"].isoformat(),
                r["session_end"].isoformat(),
                r["n_events"],
                round(r["sum_value"], 4),
            )
            for r in out2
        )
    )
    assert got_closed == expect_closed


def test_streaming_timeout_flushes_open_sessions(spark, tmp_path):
    """Resident-serving mode: with flush_timeout_secs set, open tail
    sessions flush after quiet processing time — the registered timer
    keeps the trigger ticking no-data batches until it fires."""
    import time

    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(BATCH1, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (
        sessionize_stream(stream, gap_secs=60, flush_timeout_secs=3)
        .writeStream.format("memory")
        .queryName("sess_flush")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM sess_flush").collect()[0]["c"] >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = sorted(
        (r["user_id"], r["session_start"].isoformat(), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_flush").collect()
    )
    # all three sessions of BATCH1 eventually emitted: [0,30] closed by
    # evidence, the open [130] and [10,50] flushed by the timer
    assert rows == [
        (1, "2024-01-01T00:00:00", 2),
        (1, "2024-01-01T00:02:10", 1),
        (2, "2024-01-01T00:00:10", 2),
    ]


def test_batch_sessionize_on_events_fixture(spark):
    """Sanity on the driver events table: sessions partition the events
    (sum of n_events == row count) and bounds are ordered."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = sessionize(ev, gap_secs=1800)
    rows = got.collect()
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert all(r["session_start"] <= r["session_end"] for r in rows)


def test_streaming_late_event_beyond_gap_is_its_own_session(spark, tmp_path):
    """Review r4h: a cross-batch late event whose gap to the OPEN session
    exceeds gap_secs must form its own session (batch-twin semantics),
    not be absorbed into a session it doesn't belong to."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    # batch 1: open session for user 9 at t=1000s
    b1 = [_ev(0, 1000, 9), _ev(1, 1010, 9)]
    spark.createDataFrame(b1, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out1 = _run_stream_once(spark, src, ckpt, out)
    assert out1 == []  # everything still open
    # batch 2: one event 900s EARLIER than the open session start
    # (gap 60s) plus a later event that closes everything
    b2 = [_ev(2, 100, 9, 7.0), _ev(3, 5000, 9)]
    spark.createDataFrame(b2, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = sorted(
        (
            r["session_start"].isoformat(),
            r["session_end"].isoformat(),
            r["n_events"],
            round(r["sum_value"], 4),
        )
        for r in _run_stream_once(spark, src, ckpt, out)
    )
    # batch twin over the union: [100], [1000-1010], [5000(open)] -> the
    # two closed sessions emit, the late event is NOT merged into
    # [1000-1010]
    assert out2 == [
        ("2024-01-01T00:01:40", "2024-01-01T00:01:40", 1, 7.0),
        ("2024-01-01T00:16:40", "2024-01-01T00:16:50", 2, 2.0),
    ]
