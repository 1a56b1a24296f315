"""Change-event model + admission validation.

The engine input is a CDC log of transcript turns, keyed on
``(conv_id, turn_idx)`` with ``(event_ts, lsn)`` total ordering — the target
analogue of the reference's source identity ``(original_source, content_hash)``
(``scripts/orchestrator.py:63-86``) plus its per-source ``segment_index``
ordinal (``scripts/audio_processing.py:50-62``).

Validation generalizes the reference's admission predicates: empty-extraction
early-out (``scripts/text_processing.py:77-79``), audio validity
(``scripts/core_components.py:125-134``) — here: key completeness, op-enum
membership, parsable ordering columns. Rejected rows are returned (not
dropped silently) so callers can route them to a quarantine sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OPS = ("insert", "update", "delete", "upsert")

# Payload columns an event may carry. `tool` arrives mid-stream (additive
# schema evolution) — early batches simply lack the column.
PAYLOAD_COLS = ("role", "text", "tool", "ts")
KEY_COLS = ("conv_id", "turn_idx")
ORDER_COLS = ("event_ts", "lsn")

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_ts", T.TimestampType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("batch_id", T.LongType(), False),
    ]
)

# The lake-table shape, per BASELINE.json:input_hint.
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def conform_events(df: DataFrame) -> DataFrame:
    """Additive schema evolution on the read side: add any EVENT_SCHEMA
    column the batch lacks as typed nulls (old producers don't know `tool`),
    preserving any extra columns the batch carries beyond the known set."""
    present = set(df.columns)
    for f in EVENT_SCHEMA.fields:
        if f.name not in present:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df


def validity_condition() -> Column:
    """The admission predicate (P9) as one JVM column expression."""
    return (
        F.col("conv_id").isNotNull()
        & (F.length("conv_id") > 0)
        & F.col("turn_idx").isNotNull()
        & (F.col("turn_idx") >= 0)
        & F.col("event_ts").isNotNull()
        & F.col("lsn").isNotNull()
        & F.col("op").isin(*OPS)
        # deletes carry no payload; everything else must carry text
        & ((F.col("op") == "delete") | F.col("text").isNotNull())
    )


def validate_events(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split an event batch into (valid, rejected).

    All predicates are JVM column expressions — Catalyst pushes them into the
    scan; nothing runs in Python.
    """
    df = conform_events(df)
    cond = validity_condition()
    return df.filter(cond), df.filter(~cond)
