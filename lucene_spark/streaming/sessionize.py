"""Gap-based conversation sessionization — batch and stateful streaming.

A transcript table (input_hint shape) carries per-turn timestamps; a
training-data pipeline segments each conversation into *sessions*
wherever the inter-turn gap exceeds a threshold (agent runs that pause
and resume, users returning hours later). Two implementations with
identical semantics:

- :func:`sessionize` — batch: one shuffle on the conversation key,
  then pure window functions (lag → gap flag → running sum). At 100 TB
  this is the plan you want: conversations are small and numerous, so
  the shuffle is well-balanced by construction, and everything after
  it is whole-stage-codegen'd — no Python in the path. Integer-exact,
  so a SQL oracle reproduces it bit-for-bit.
- :func:`sessionize_stream` — Structured Streaming:
  ``groupBy(conv).applyInPandasWithState`` keeps (last_ts,
  session_idx, session_start) per conversation across micro-batches,
  so an unbounded stream of turns gets the same numbering the batch
  job would produce. Assumes per-conversation monotone arrival across
  micro-batches (within a batch, rows are sorted in the kernel);
  out-of-order sources need an upstream watermark+sort stage, which
  is the standard Structured Streaming contract for this operator
  class.

Session identity: ``session_idx`` is 0-based per conversation;
``session_start_ms`` is the timestamp of the session's first turn.
A new session starts when ``ts - prev_ts > gap_ms`` (strict).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("sess_idx", LongType()),
        StructField("sess_start", LongType()),
    ]
)


def sessionize(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts_ms",
    gap_ms: int = 90_000,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Batch gap sessionization: adds ``session_idx`` (0-based per
    conversation) and ``session_start_ms`` columns.

    ``order_cols``: tie-break columns after ``ts_col`` for a total
    per-conversation order (default: none — supply e.g.
    ``["turn_idx"]`` when timestamps can collide).
    """
    if gap_ms < 0:
        raise ValueError(f"gap_ms must be >= 0 (got {gap_ms})")
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(conv_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_flag = (
        prev.isNull() | (F.col(ts_col) - prev > F.lit(int(gap_ms)))
    ).cast("long")
    run = Window.partitionBy(conv_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = df.withColumn("session_idx", F.sum(new_flag).over(run) - 1)
    sess = Window.partitionBy(conv_col, "session_idx")
    return out.withColumn(
        "session_start_ms", F.min(F.col(ts_col)).over(sess).cast("long")
    )


def _sessionize_kernel(gap_ms: int, conv_col: str, ts_col: str, timeout_ms: int):
    gap = int(gap_ms)

    def fn(key, pdf_iter, state):
        if timeout_ms and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts, sess_idx, sess_start = state.get
        else:
            # sess_idx == -1 is the no-state sentinel (it is always
            # >= 0 after the first turn); last_ts itself may be any
            # int64 — negative timestamps are legal
            last_ts, sess_idx, sess_start = 0, -1, 0
        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values(ts_col)
        ts = pdf[ts_col].astype("int64").to_numpy()
        idxs = []
        starts = []
        for t in ts:
            if sess_idx < 0 or t - last_ts > gap:
                sess_idx += 1
                sess_start = int(t)
            last_ts = int(t)
            idxs.append(sess_idx)
            starts.append(sess_start)
        state.update((last_ts, sess_idx, sess_start))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                conv_col: [key[0]] * len(ts),
                ts_col: ts,
                "session_idx": pd.array(idxs, dtype="int64"),
                "session_start_ms": pd.array(starts, dtype="int64"),
            }
        )

    return fn


def sessionize_stream(
    sdf: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts_ms",
    gap_ms: int = 90_000,
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming gap sessionization over an unbounded turn stream.

    ``groupBy(conv).applyInPandasWithState``: per-conversation state
    (last_ts, session_idx, session_start) persists across micro-batches
    in the state store, so session numbering continues exactly where
    the previous batch left off — checkpoint/restart safe like any
    stateful Structured Streaming query. Emits one row per input turn
    (update mode): (conv, ts, session_idx, session_start_ms).

    The per-turn loop is driver-free and per-GROUP (conversations are
    tiny); at cluster scale parallelism is the number of conversations
    per micro-batch, the same key distribution the batch variant
    shuffles on.

    ``state_timeout_ms``: evict a conversation's state after that much
    processing-time inactivity (ProcessingTimeTimeout). Without it the
    state store keeps one row per conversation EVER seen — fine for a
    bounded key space, unbounded growth on an open-ended stream. A
    conversation that resumes after eviction restarts numbering at
    session 0, so pick a timeout well above the longest expected
    real-world pause (the standard state-TTL tradeoff). Caveat: with a
    timeout configured Spark keeps a state-cleanup trigger pending, so
    ``query.processAllAvailable()`` does not return — long-running
    queries (the intended use) are unaffected; tests should poll the
    sink.
    """
    if gap_ms < 0:
        raise ValueError(f"gap_ms must be >= 0 (got {gap_ms})")
    if state_timeout_ms is not None and state_timeout_ms <= 0:
        raise ValueError(
            f"state_timeout_ms must be > 0 when set (got {state_timeout_ms})"
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    conv_field = next(
        (f for f in sdf.schema.fields if f.name == conv_col),
        StructField(conv_col, StringType()),
    )
    out_schema = StructType(
        [
            conv_field,
            StructField(ts_col, LongType()),
            StructField("session_idx", LongType()),
            StructField("session_start_ms", LongType()),
        ]
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        sdf.select(conv_col, ts_col)
        .groupBy(conv_col)
        .applyInPandasWithState(
            _sessionize_kernel(gap_ms, conv_col, ts_col, int(state_timeout_ms or 0)),
            out_schema,
            _STATE_SCHEMA,
            "update",
            timeout_conf,
        )
    )
