"""JSON-lines CDC event source — the wire format a binlog/WAL tailer or a
webhook relay typically emits (one JSON object per change event).

The reference's ledger is schema-dynamic JSON read/written wholesale
(``scripts/orchestrator.py:34-61``); here JSON is a *source encoding* for
the same event model: records are parsed against EVENT_SCHEMA via ``from_json`` (poison events become rejected rows,
not job failures — generalizing the reference's corrupted-ledger recovery,
``scripts/orchestrator.py:56-61``), timestamps accept ISO-8601, and
columns the producer doesn't know yet simply don't appear (additive
schema evolution on the wire — ``conform_events`` null-fills).

At scale: JSON decode is JVM-side Jackson inside the scan (no Python),
splittable per line, and the first thing apply does is project to typed
columns — the JSON cost is paid once per event at the edge.

``apply_batch`` is source-agnostic: anything that yields a conforming
DataFrame per offset range plugs into the same exactly-once commit. A
Kafka source is this module with ``spark.read.format("kafka")`` +
``from_json(value, EVENT_SCHEMA)`` and offset ranges instead of batch ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from runyoro_llm_data_pipeline_spark.cdc.events import EVENT_SCHEMA, conform_events

def read_events_jsonl(
    spark: SparkSession, path: str, drop_corrupt: bool = False
) -> DataFrame:
    """Read a JSON-lines event batch into EVENT_SCHEMA shape.

    Parsed as ``spark.read.text`` → ``from_json`` (all JVM, line-
    splittable): a malformed line yields a null struct → a row of null
    fields, which the admission validator routes to the rejected side
    (fails key/op checks) — one poison line can never abort an ingest.
    (``from_json`` avoids the DataFrameReader restriction on querying
    only the corrupt-record column.) ``drop_corrupt=True`` drops
    unparseable lines at the scan."""
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        F.from_json(
            "value",
            EVENT_SCHEMA,
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]"},
        ).alias("e"),
        F.col("value"),
    )
    if drop_corrupt:
        # PERMISSIVE from_json yields an all-null struct for a malformed
        # line; a record with no op, no key and no lsn is indistinguishable
        # from (and as useless as) garbage, so that's the drop predicate
        parsed = parsed.filter(
            F.col("e").isNotNull()
            & (
                F.col("e.op").isNotNull()
                | F.col("e.conv_id").isNotNull()
                | F.col("e.lsn").isNotNull()
            )
        )
    df = parsed.select("e.*")
    return conform_events(df)


def write_events_jsonl(events: DataFrame, path: str, n_files: int | None = None) -> None:
    """Materialize an event DataFrame as JSON-lines (test/fixture helper;
    ISO-8601 timestamps so any consumer can re-parse)."""
    out = events
    for f in events.schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            out = out.withColumn(
                f.name, F.date_format(f.name, "yyyy-MM-dd'T'HH:mm:ssXXX")
            )
    if n_files:
        out = out.repartition(n_files)
    out.write.mode("overwrite").json(path)


def jsonl_batch_dirs_to_parquet(
    spark: SparkSession, jsonl_dir: str, parquet_dir: str
) -> list[str]:
    """Convert a directory of JSON-lines batch dirs (``batch_*/``) into the
    Parquet layout ``CdcIngest`` tails — the decode-at-the-edge pattern
    (pay JSON parsing once, downstream passes are columnar)."""
    out = []
    for name in sorted(os.listdir(jsonl_dir)):
        if not name.startswith("batch_"):
            continue
        df = read_events_jsonl(spark, os.path.join(jsonl_dir, name))
        dst = os.path.join(parquet_dir, name)
        df.write.mode("overwrite").parquet(dst)
        out.append(dst)
    return out
