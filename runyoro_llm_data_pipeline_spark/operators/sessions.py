"""Ordered / windowed operators: turn enumeration + gap sessionization.

W1 — per-key dense ordinal, generalizing the reference's segment
enumeration (``scripts/audio_processing.py:50-62``: ``enumerate(segments)``
→ ``segment_index`` in time order).

W2 — gaps-and-islands sessionization, generalizing silence-based audio
splitting (``scripts/audio_processing.py:42-47``: contiguous runs split at
gaps ≥ threshold). Classic lag + cumulative-sum; both window passes share
one ``partitionBy(key) orderBy(ts)`` shuffle+sort (Catalyst reuses the
exchange), so the cost is one shuffle of the events — the minimum any
order-sensitive per-key operator can do.

Scale: both are single-shuffle window ops; skewed keys are bounded by
per-key data volume (a session window cannot be split across keys). For a
pathological single hot key, pre-aggregate to (key, coarse-time-bucket)
first — not needed for the engine's Zipf fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    """Seconds-since-epoch for TIMESTAMP or TIMESTAMP_NTZ columns (NTZ
    cannot cast straight to long; session TZ is pinned to UTC so the
    NTZ→LTZ hop is value-preserving)."""
    return col.cast("timestamp").cast("long")


def enumerate_turns(
    df: DataFrame,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
    out: str = "turn_idx",
) -> DataFrame:
    """Dense 0-based ordinal per key in ``order`` order (W1)."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    return df.withColumn(out, (F.row_number().over(w) - 1).cast("int"))


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    out: str = "session_id",
) -> DataFrame:
    """Assign a 0-based session ordinal per key: a new session starts when
    the gap to the previous event exceeds ``gap_seconds`` (W2).

    Streaming analogue: ``session_window(ts, gap)`` — see streaming module.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col("event_id"))
    prev = F.lag(F.col(ts)).over(w)
    new_sess = (
        prev.isNull()
        | ((_epoch(F.col(ts)) - _epoch(prev)) > gap_seconds)
    ).cast("int")
    return df.withColumn(
        out,
        (F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("int"),
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-key session summary: session count, events, span — the aggregate
    form used by the oracle-checked query (ints only; no float drift)."""
    s = sessionize(df, key=key, ts=ts, gap_seconds=gap_seconds)
    return (
        s.groupBy(key)
        .agg(
            (F.max("session_id") + 1).cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
            (_epoch(F.max(ts)) - _epoch(F.min(ts))).alias("span_seconds"),
        )
    )


def conversation_threads(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Consumer-contract view: one row per conversation with its turns'
    text concatenated in stable ``(conv_id, turn_idx)`` order — exactly
    the shape the reference's training loop consumes (it reads the final
    table ordered per source and writes line-joined text per conversation,
    ``scripts/train_llm.py:154-187``). This is the read-side half of the
    per-turn text-equality invariant: two engines whose threads compare
    equal agree on every turn AND on the ordering.

    ONE hash aggregate: collect (turn_idx, text) structs per conversation
    and sort the collected array driver-free (``array_sort`` on struct
    sorts by the leading field; turn_idx is unique per conversation after
    latest-wins collapse, so the order is total). Per-group state is one
    conversation's turns — bounded by transcript length, never by corpus
    size — so a 10^10-row table threads with shuffle ∝ rows and no global
    sort.
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(idx_col), F.col(text_col)))
    )
    return turns.groupBy(F.col(conv_col)).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.concat_ws(
            sep, F.transform(ordered, lambda x: x[text_col])
        ).alias("thread"),
    )
