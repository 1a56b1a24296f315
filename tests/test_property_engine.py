"""Property-based engine correctness: hypothesis generates arbitrary op
sequences (insert/update/upsert/delete with duplicate deliveries and
out-of-order versions), the engine replays them in batches, and the final
table must equal a brute-force single-threaded Python replay.

This is the strongest form of SURVEY.md §5 item 6 — the oracle shares NO
code with the engine (plain dict, latest-wins by (event_ts, lsn))."""

import datetime
import os

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
from pyspark.sql import types as T

from runyoro_llm_data_pipeline_spark.cdc.apply import apply_batch
from runyoro_llm_data_pipeline_spark.cdc.events import EVENT_SCHEMA
from runyoro_llm_data_pipeline_spark.lake.merge import with_internal_schema
from runyoro_llm_data_pipeline_spark.lake.table import LakeTable

_BASE = datetime.datetime(2024, 1, 1)

# one logical event: (key_id 0-5, op 0-3, version 0-7, payload 0-9, batch 0-2)
event_strategy = st.tuples(
    st.integers(0, 5),
    st.integers(0, 3),
    st.integers(0, 7),
    st.integers(0, 9),
    st.integers(0, 2),
)

OPS = ["insert", "update", "upsert", "delete"]


def _rows_from_spec(spec):
    rows = []
    for lsn, (kid, op_i, ver, pay, batch) in enumerate(spec):
        op = OPS[op_i]
        conv, turn = f"c{kid % 3}", kid // 3
        ts = _BASE + datetime.timedelta(seconds=ver)
        is_del = op == "delete"
        rows.append(
            (
                op, conv, turn,
                None if is_del else "user",
                None if is_del else f"text_{pay}",
                None,
                None if is_del else ts,
                ts,            # event_ts: the version
                ver * 100 + lsn,  # lsn: version-major, arrival tie-break
                batch,
            )
        )
    return rows


def _python_oracle(rows):
    """Single-threaded latest-wins replay over ALL events (batch order is
    irrelevant by commutativity)."""
    state = {}
    for op, conv, turn, role, text, tool, ts, event_ts, lsn, _ in rows:
        key = (conv, turn)
        cur = state.get(key)
        if cur is None or (event_ts, lsn) > (cur[0], cur[1]):
            state[key] = (event_ts, lsn, op, role, text)
    return sorted(
        (k[0], k[1], v[3], v[4])
        for k, v in state.items()
        if v[2] != "delete"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(event_strategy, min_size=1, max_size=40), st.booleans())
def test_engine_matches_python_replay(shared_spark_holder, tmp_path_factory, spec, use_mor):
    spark = shared_spark_holder
    rows = _rows_from_spec(spec)
    relaxed = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in EVENT_SCHEMA.fields]
    )
    base = str(tmp_path_factory.mktemp("prop"))
    t = LakeTable.create(
        os.path.join(base, "t"),
        with_internal_schema(
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType(), False),
                    T.StructField("turn_idx", T.IntegerType(), False),
                    T.StructField("role", T.StringType(), True),
                    T.StructField("text", T.StringType(), True),
                    T.StructField("tool", T.StringType(), True),
                    T.StructField("ts", T.TimestampType(), True),
                ]
            )
        ),
        num_buckets=4,
    )
    mode = "mor" if use_mor else "cow"
    for b in sorted({r[9] for r in rows}):
        batch_rows = [r for r in rows if r[9] == b]
        df = spark.createDataFrame(batch_rows, relaxed)
        apply_batch(spark, t, df, b, normalize_text=False, mode=mode)
    if use_mor:
        t.compact(spark)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in t.read(spark).collect()
    )
    assert got == _python_oracle(rows)
