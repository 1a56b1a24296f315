"""Structured Streaming ingest: AvailableNow drain, exactly-once across
restarts, and windowed/session aggregates."""

import os

import pytest
from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.cdc.generator import (
    gen_change_log,
    write_batch_files,
)
from runyoro_llm_data_pipeline_spark.streaming.ingest_stream import (
    CdcStreamIngest,
    conversation_sessions,
    turn_rate,
)


def _rows(df):
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    return [
        tuple(r) for r in df.select(*cols).orderBy("conv_id", "turn_idx").collect()
    ]


@pytest.fixture(scope="module")
def log(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("streamlog"))
    events, expected = gen_change_log(
        spark, n_turns=500, n_convs=20, n_batches=4, tool_from_batch=0
    )
    write_batch_files(events, d)
    return d, _rows(expected), events


def test_stream_available_now_matches_expected(spark, log, tmp_lake):
    src, expected, _ = log
    ing = CdcStreamIngest(
        os.path.join(tmp_lake, "t"),
        src,
        os.path.join(tmp_lake, "cp"),
        num_buckets=8,
        max_files_per_trigger=4,
    )
    results = ing.run_available_now(spark)
    assert len(results) >= 2  # multiple micro-batches actually happened
    assert all(r["status"] == "applied" for r in results)
    assert _rows(ing.table().read(spark)) == expected


def test_stream_restart_is_noop_then_incremental(spark, log, tmp_lake):
    src, expected, events = log
    t = os.path.join(tmp_lake, "t")
    cp = os.path.join(tmp_lake, "cp")
    ing = CdcStreamIngest(t, src, cp, num_buckets=8)
    ing.run_available_now(spark)
    v1 = ing.table().current_version()

    # restart with same checkpoint: nothing new → no new commits
    ing2 = CdcStreamIngest(t, src, cp, num_buckets=8)
    r2 = ing2.run_available_now(spark)
    assert all(x["status"] in ("applied", "skipped") for x in r2)
    assert ing2.table().current_version() == v1
    assert _rows(ing2.table().read(spark)) == expected

    # drop a brand-new event file in → only it is picked up
    late = events.limit(0).sparkSession.createDataFrame(
        [("insert", "conv_late", 0, "user", "late arrival", None, None, None)],
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, event_ts timestamp",
    ).withColumn("event_ts", F.lit("2024-06-01 00:00:00").cast("timestamp")) \
     .withColumn("lsn", F.lit(10_000_000).cast("long")) \
     .withColumn("batch_id", F.lit(999).cast("long"))
    late.coalesce(1).write.mode("append").parquet(os.path.join(src, "late_batch"))
    ing3 = CdcStreamIngest(t, src, cp, num_buckets=8)
    r3 = ing3.run_available_now(spark)
    assert any(x["status"] == "applied" for x in r3)
    final = ing3.table().read(spark)
    assert final.filter(F.col("conv_id") == "conv_late").count() == 1
    # previously-applied rows untouched
    assert final.count() == len(expected) + 1


def test_turn_rate_and_sessions_batch_parity(spark, log):
    _, _, events = log
    tr = turn_rate(events.withColumn("event_ts", F.col("event_ts")))
    assert tr.agg(F.sum("n_events")).collect()[0][0] == events.count()
    cs = conversation_sessions(events, gap="30 minutes")
    total_turns = cs.agg(F.sum("n_turns")).collect()[0][0]
    assert total_turns == events.count()
    # session bounds are consistent
    bad = cs.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_stateful_running_totals(spark, log, tmp_lake):
    """applyInPandasWithState carries per-conversation state across
    micro-batches: the final per-conv running total equals the batch
    ground truth even though each micro-batch sees only a slice."""
    from runyoro_llm_data_pipeline_spark.cdc.events import EVENT_SCHEMA
    from runyoro_llm_data_pipeline_spark.streaming.stateful import (
        running_conversation_totals,
    )

    src, _, events = log
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    totals = running_conversation_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_lake, "cp_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT conv_id, max(n_events) AS n, max(max_lsn) AS mx "
        "FROM running_totals GROUP BY conv_id"
    )
    got = {r["conv_id"]: (r["n"], r["mx"]) for r in out.collect()}
    # ground truth from the source dir itself (an earlier test may have
    # appended extra event files to the shared fixture)
    from runyoro_llm_data_pipeline_spark.cdc.events import EVENT_SCHEMA as ES

    ground = (
        spark.read.schema(ES)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    want = {
        r["conv_id"]: (r["n"], r["mx"])
        for r in ground.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("lsn").alias("mx"))
        .collect()
    }
    assert got == want


def test_dedup_within_watermark_stream_and_batch_parity(spark, log, tmp_lake):
    """Wire duplicates (an at-least-once source re-emitting events) are
    suppressed by dropDuplicatesWithinWatermark in a real stream, and the
    batch frame through the same function agrees."""
    import tempfile

    from runyoro_llm_data_pipeline_spark.streaming.ingest_stream import (
        dedup_within_watermark,
    )

    src, _, events = log
    # duplicate EVERY event once (worst-case redelivery), stream the union
    dup_dir = tempfile.mkdtemp(prefix="dupsrc_", dir=tmp_lake)
    doubled = events.unionAll(events)
    doubled.write.mode("overwrite").parquet(os.path.join(dup_dir, "b0"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("recursiveFileLookup", "true")
        .parquet(dup_dir)
    )
    out_dir = os.path.join(tmp_lake, "dedup_out")
    ckpt = os.path.join(tmp_lake, "dedup_ckpt")
    q = (
        dedup_within_watermark(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    batch = dedup_within_watermark(events.unionAll(events))
    # one row per (conv_id, turn_idx, lsn): counts agree with the batch
    # path and with the distinct-key count of the original log
    n_keys = events.select("conv_id", "turn_idx", "lsn").distinct().count()
    assert got.count() == n_keys
    assert batch.count() == n_keys
    assert (
        got.groupBy("conv_id", "turn_idx", "lsn").count().filter("count > 1").count()
        == 0
    )
