"""Custom stateful streaming operator: gap sessionization (r4).

The round brief mandates ``applyInPandasWithState`` for operators whose
state outlives a micro-batch.  Gap sessionization of the ``events``
stream is the canonical case: a user's session stays OPEN across batch
boundaries until a quiet gap closes it, so no per-batch window can
express it — per-key state must carry (start, last_ts, count, sum)
forward.  (Reference analog: Gigablast keeps per-host spider quota /
last-hit state resident in SpiderColl the same way — state keyed by
entity, mutated per event, flushed on quiescence.)

Two implementations with identical close-session semantics:

- ``sessionize``      — BATCH over a bounded table: lag + running-sum
  window (SQL-oracle expressible; certified by the ``sessionize`` driver
  entry's DuckDB twin).
- ``sessionize_stream`` — STREAMING via ``applyInPandasWithState``:
  emits a session row the moment evidence of its end exists (a later
  event of the same user opens the next session) or when the state
  times out; the open tail session rides the state store across
  micro-batches and process restarts (checkpointed).

A session = maximal run of one user's events where consecutive gaps are
<= ``gap_secs``.  Output: (user_id, session_start, session_end,
n_events, sum_value).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
# open-session state: epoch-nanosecond bounds + running aggregates
_STATE_SCHEMA = "start long, last long, n int, sv double"


def sessionize(events: DataFrame, gap_secs: int = 1800) -> DataFrame:
    """Batch gap sessionization: a new session starts when the gap to the
    user's previous event exceeds ``gap_secs``.  One shuffle on user_id;
    the lag flag, the running session counter, and the final per-session
    agg all ride the same partitioning."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microsecond gap math (unix_micros), not float seconds: the
    # SQL oracle compares epoch_us the same way, so a boundary-exact gap
    # can never flip between engines on float rounding.  unix_micros only
    # accepts TIMESTAMP — fixture columns may be TIMESTAMP_NTZ, and the
    # cast shifts both sides of the difference identically.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    flagged = (
        events.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (
                    us(F.col("ts")) - us(F.col("_prev"))
                    > F.lit(int(gap_secs) * 1_000_000)
                )
            ).cast("int"),
        )
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("session_seq")
    )


def _sessionize_fn(gap_secs: int, flush_timeout_secs: int | None):
    gap_ns = int(gap_secs) * 1_000_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # quiescence flush: the open session is over by timeout
            start, last, n, sv = state.get
            state.remove()
            yield _row(user_id, start, last, n, sv)
            return
        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        # normalize to epoch NANOseconds regardless of the Arrow-side
        # datetime unit (pandas 2 may hand back us- or ns-resolution)
        ts_ns = ev["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        vals = ev["value"].fillna(0.0).to_numpy()
        # 1) sessionize THIS batch's (sorted) events on their own
        sessions: list[list] = []
        for t, v in zip(ts_ns.tolist(), vals.tolist()):
            if sessions and t - sessions[-1][1] <= gap_ns:
                s = sessions[-1]
                s[1], s[2], s[3] = max(s[1], t), s[2] + 1, s[3] + float(v)
            else:
                sessions.append([t, t, 1, float(v)])
        # 2) merge with the OPEN session interval by the same gap rule —
        # a cross-batch late event whose gap to the open session exceeds
        # gap_secs forms its OWN session (the batch twin's semantics),
        # it must not be absorbed just because it arrived later.  The
        # bounded-state deviation that remains: a session other than the
        # latest emits at the end of the micro-batch that completes it,
        # so an event arriving in a LATER batch can no longer merge into
        # it (it will session on its own) — the usual watermark-style
        # lateness bound, documented on sessionize_stream.
        if state.exists:
            sessions.append(list(state.get))
            sessions.sort(key=lambda s: s[0])
        merged: list[list] = []
        for s in sessions:
            if merged and s[0] - merged[-1][1] <= gap_ns:
                m = merged[-1]
                m[1], m[2], m[3] = max(m[1], s[1]), m[2] + s[2], m[3] + s[3]
            else:
                merged.append(s)
        if not merged:  # defensively: no events and no prior state
            return
        out = [tuple(s) for s in merged[:-1]]  # all but the open tail
        start, last, n, sv = merged[-1]
        state.update((start, last, n, sv))
        if flush_timeout_secs is not None:
            # flush the open tail if the user goes quiet for this much
            # PROCESSING time (the streaming analog of end-of-input).
            # NB a registered timer keeps even an availableNow run
            # ticking no-data batches until it fires — leave it None for
            # run-to-completion jobs that only want evidence-closed
            # sessions.
            state.setTimeoutDuration(int(flush_timeout_secs) * 1000)
        for s in out:
            yield _row(user_id, *s)

    return fn


def _row(user_id: int, start: int, last: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start, unit="ns")],
            "session_end": [pd.Timestamp(last, unit="ns")],
            "n_events": [int(n)],
            "sum_value": [round(float(sv), 4)],
        }
    )


def sessionize_stream(
    events_stream: DataFrame,
    gap_secs: int = 1800,
    flush_timeout_secs: int | None = None,
) -> DataFrame:
    """Streaming gap sessionization over an events stream with columns
    (event_id, ts, user_id, value, ...).

    Per-user state (open session bounds + aggregates) lives in the state
    store: it survives micro-batch boundaries AND restarts from the
    checkpoint, which is exactly what distinguishes this from a windowed
    agg.  A closed session is emitted as soon as a later event proves the
    gap; with ``flush_timeout_secs`` set, a user's open tail session
    additionally flushes after that much quiet processing time (resident
    serving mode — the timer keeps the trigger ticking, so leave it None
    for availableNow run-to-completion jobs).  Append output mode.

    Out-of-order events: each micro-batch is sessionized sorted and
    MERGED with the open session by the same gap rule, so a late event
    whose gap to the open session exceeds ``gap_secs`` forms its own
    session exactly like the batch twin — it is never absorbed into a
    session it doesn't belong to.  The bounded-state lateness limit:
    once a non-latest session is emitted (end of the micro-batch that
    completed it), an even-later event can no longer merge into it and
    sessions on its own — the streaming-vs-batch deviation is confined
    to events arriving a micro-batch AFTER a session they should have
    extended was closed."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.NoTimeout
        if flush_timeout_secs is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_secs, flush_timeout_secs),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
