"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_conversation_totals`` keeps per-conversation running state
(event count, max applied lsn, last-seen event time) across micro-batches
— the streaming-native form of the engine's lineage/watermark tracking,
and the extension-point shape for any custom stateful CDC operator
(e.g. per-key conflation, out-of-order alarms, per-conversation SLA
timers). State is Arrow-batched per group: the update function receives
whole pandas chunks, no per-row Python.

Scale: state lives in the streaming state store, partitioned by the
group key — same hash partitioning as the lake's buckets, so a hot
conversation is bounded by its own event volume per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "conv_id string, n_events long, max_lsn long, last_event_ts timestamp"
)
STATE_SCHEMA = "n_events long, max_lsn long, last_seen_us long"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    if state.exists:
        n, mx, last_us = state.get
    else:
        n, mx, last_us = 0, -1, 0
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        mx = max(mx, int(pdf["lsn"].max()))
        ts_max = pdf["event_ts"].max()
        if pd.notna(ts_max):
            last_us = max(last_us, int(pd.Timestamp(ts_max).value // 1000))
    state.update((n, mx, last_us))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_events": [n],
            "max_lsn": [mx],
            "last_event_ts": [pd.Timestamp(last_us * 1000) if last_us else pd.NaT],
        }
    )


def running_conversation_totals(stream: DataFrame) -> DataFrame:
    """Per-conversation running totals, updated every micro-batch with
    state carried across batches (output mode: update)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
