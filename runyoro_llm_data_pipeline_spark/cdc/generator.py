"""Deterministic synthetic transcript + CDC-log generator (FIXTURES.md §1-2).

All randomness is hash-of-id based (``xxhash64``), generated executor-side
from ``spark.range`` — no Python RNG, no wall clock, fully reproducible at
any scale (SURVEY.md §7 hard part (d)). This mirrors the reference's
deterministic fixture idiom (sine-wave WAV builder,
``scripts/test_pipeline.py:14-27``; 12-sentence corpus,
``test_training_fix.py:18-31``).

The generator first fixes a **final transcript state**, then emits a change
history that replays to it:

* one *insert/update/upsert* event per final row (the winner — max
  ``(event_ts, lsn)`` for its key);
* superseded earlier versions for ~1/3 of keys (stale text, lower version);
* duplicate deliveries (identical ``lsn``) for ~1/5 of keys;
* delete-then-reinsert histories for ~1/10 of keys;
* *ghost* keys that are inserted then deleted and must be absent from the
  final state;
* hot-key skew: ``conv_hot`` holds ~30% of all turns (FIXTURES.md §2 (f));
* additive schema evolution: events in batches < ``tool_from_batch`` carry
  no ``tool`` (and their files are written without the column).

``expected_final`` is computed by an *independent* path (window-function
collapse + the reference's exact CPython normalizer) so engine tests don't
compare the engine against itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.cdc.dedup import collapse_latest_wins_window
from runyoro_llm_data_pipeline_spark.operators.text import (
    clean_and_preprocess_text_pandas,
)

_WORDS = (
    "omu kandi webale ekyalo obusinge amaizi ekitabu okusoma omuntu engoma "
    "data spark merge batch window table join stream value query lake "
    "checkpoint offset lineage snapshot bucket shuffle skew arrow vector"
).split()

_BASE_EPOCH = 1_700_000_000  # fixed, no wall clock


def _h(*cols) -> F.Column:
    return F.abs(F.xxhash64(*cols))


def gen_final_transcripts(
    spark: SparkSession,
    n_turns: int = 1000,
    n_convs: int = 50,
    hot_share_pct: int = 30,
    seed: int = 42,
) -> DataFrame:
    """The target final state: (conv_id, turn_idx, role, text(raw), tool, ts).
    ``text`` is *raw* — it contains HTML entities, tabs, CRLF, emoji and
    guillemets so the P2 normalizer is genuinely exercised."""
    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    df = spark.range(n_turns).withColumn("__seed", F.lit(seed))
    df = df.withColumn(
        "conv_id",
        F.when(
            _h("id", F.lit("hot"), "__seed") % 100 < hot_share_pct, F.lit("conv_hot")
        ).otherwise(
            F.concat(F.lit("conv_"), (_h("id", "__seed") % n_convs).cast("string"))
        ),
    )
    from pyspark.sql import Window

    df = df.withColumn(
        "turn_idx",
        (
            F.row_number().over(Window.partitionBy("conv_id").orderBy("id")) - 1
        ).cast("int"),
    )
    h = _h("conv_id", "turn_idx", "__seed")
    df = df.withColumn(
        "role",
        F.when(h % 11 == 0, F.lit("tool"))
        .when(h % 11 == 1, F.lit("system"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")),
    )
    # deterministic word salad, 6-15 words
    base_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), (h % 10 + 5).cast("int")),
            lambda i: F.element_at(
                words_arr,
                (
                    _h(F.col("conv_id"), F.col("turn_idx"), i, F.col("__seed"))
                    % len(_WORDS)
                    + 1
                ).cast("int"),
            ),
        ),
    )
    noise = h % 7
    df = df.withColumn(
        "text",
        F.when(noise == 0, F.concat(base_text, F.lit(" Q&amp;A 🙂")))
        .when(noise == 1, F.concat(F.lit("\t«"), base_text, F.lit("»\r\nend")))
        .when(noise == 2, F.concat(F.lit("  "), base_text, F.lit(" — fin… ")))
        .when(noise == 3, F.concat(base_text, F.lit(" &lt;tag&gt; ’tis")))
        .otherwise(base_text),
    )
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.concat(F.lit("tool_"), (h % 5).cast("string")),
        ).otherwise(F.lit(None).cast("string")),
    )
    df = df.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(_BASE_EPOCH) + F.col("id") * 60 + (h % 60)
        ),
    )
    return df.select("id", "conv_id", "turn_idx", "role", "text", "tool", "ts")


def gen_change_log(
    spark: SparkSession,
    n_turns: int = 1000,
    n_convs: int = 50,
    n_batches: int = 8,
    tool_from_batch: int = 0,
    seed: int = 42,
    permute_batches: bool = False,
    hot_share_pct: int = 30,
) -> tuple[DataFrame, DataFrame]:
    """Returns (events, expected_final).

    ``events`` has EVENT_SCHEMA (+``batch_id``); every key's winning event is
    its final-state row; history events have strictly smaller
    ``(event_ts, lsn)``. ``expected_final`` is the normalized final table
    computed via the independent window path.
    """
    final = gen_final_transcripts(
        spark, n_turns, n_convs, hot_share_pct=hot_share_pct, seed=seed
    ).withColumn("__k", F.col("id"))
    h = _h("conv_id", "turn_idx", F.lit(seed + 1))
    # winner lsn leaves room below for history events
    final = final.withColumn("__final_lsn", F.col("__k") * 10 + 9)

    def ev(df, op_col, lsn_col, text_col, role_col, tool_col, is_payload=True):
        return df.select(
            op_col.alias("op"),
            F.col("conv_id"),
            F.col("turn_idx"),
            (role_col if is_payload else F.lit(None).cast("string")).alias("role"),
            (text_col if is_payload else F.lit(None).cast("string")).alias("text"),
            (tool_col if is_payload else F.lit(None).cast("string")).alias("tool"),
            (F.col("ts") if is_payload else F.lit(None).cast("timestamp")).alias(
                "ts"
            ),
            F.timestamp_seconds(F.lit(_BASE_EPOCH) + lsn_col).alias("event_ts"),
            lsn_col.cast("long").alias("lsn"),
        )

    op_final = (
        F.when(h % 3 == 0, F.lit("insert"))
        .when(h % 3 == 1, F.lit("update"))
        .otherwise(F.lit("upsert"))
    )
    winners = ev(
        final, op_final, F.col("__final_lsn"), F.col("text"), F.col("role"),
        F.col("tool"),
    )

    stale = final.filter(h % 3 == 0)  # ~1/3: superseded earlier version
    stale_ev = ev(
        stale,
        F.lit("insert"),
        F.col("__final_lsn") - 6,
        F.concat(F.lit("STALE "), F.col("text")),
        F.col("role"),
        F.lit(None).cast("string"),
    )

    dup = final.filter(h % 5 == 0)  # ~1/5: exact duplicate delivery of winner
    dup_ev = ev(
        dup, op_final, F.col("__final_lsn"), F.col("text"), F.col("role"),
        F.col("tool"),
    )

    deleted_mid = final.filter(h % 10 == 0)  # delete-then-reinsert
    del_ev = ev(
        deleted_mid, F.lit("delete"), F.col("__final_lsn") - 3,
        F.lit(None), F.lit(None), F.lit(None), is_payload=False,
    )

    # ghost keys: inserted then deleted, absent from final state
    n_ghosts = max(n_turns // 20, 1)
    ghosts = gen_final_transcripts(
        spark, n_ghosts, n_convs, seed=seed + 777
    ).select(
        F.col("conv_id"),
        # offset must exceed any real turn_idx (the hot conv holds ~30% of
        # all turns) — 2e9 is safe for int32 up to ~6.6B-turn runs
        (F.col("turn_idx") + 2_000_000_000).cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
        F.col("id").alias("__k"),
    )
    ghost_base_lsn = F.lit(n_turns * 10 + 100) + F.col("__k") * 10
    ghost_ins = ev(
        ghosts, F.lit("insert"), ghost_base_lsn, F.col("text"), F.col("role"),
        F.col("tool"),
    )
    ghost_del = ev(
        ghosts, F.lit("delete"), ghost_base_lsn + 5,
        F.lit(None), F.lit(None), F.lit(None), is_payload=False,
    )

    events = (
        winners.unionByName(stale_ev)
        .unionByName(dup_ev)
        .unionByName(del_ev)
        .unionByName(ghost_ins)
        .unionByName(ghost_del)
    )
    if permute_batches:
        batch_col = (_h("lsn", F.lit(seed + 9)) % n_batches).cast("long")
    else:
        max_lsn = n_turns * 10 + 100 + n_ghosts * 10 + 10
        batch_col = F.least(
            (F.col("lsn") * n_batches / F.lit(max_lsn)).cast("long"),
            F.lit(n_batches - 1).cast("long"),
        )
    events = events.withColumn("batch_id", batch_col)
    # additive schema evolution: early batches predate the `tool` column
    events = events.withColumn(
        "tool",
        F.when(F.col("batch_id") < tool_from_batch, F.lit(None).cast("string"))
        .otherwise(F.col("tool")),
    )

    expected = _expected_from_events(events)
    return events, expected


def _expected_from_events(events: DataFrame) -> DataFrame:
    """Independent oracle path: window-function collapse + CPython-exact
    normalization (never the engine's max_by/JVM-regex path)."""
    collapsed = collapse_latest_wins_window(events)
    return (
        collapsed.filter(F.col("__op") != "delete")
        .select(
            "conv_id",
            "turn_idx",
            "role",
            clean_and_preprocess_text_pandas(F.col("text")).alias("text"),
            "tool",
            "ts",
        )
    )


def write_batch_files(
    events: DataFrame,
    out_dir: str,
    tool_from_batch: int = 0,
    files_per_batch: int | None = None,
) -> list[tuple[int, str]]:
    """Materialize the log as one Parquet directory per batch —
    ``batch_00000/`` … — dropping the ``tool`` column entirely for batches
    below ``tool_from_batch`` (column-absent, not just null: real additive
    schema evolution on the wire). ``files_per_batch`` defaults to
    4 files per core — a realistic binlog-tailer chunking that also keeps
    the consumer's scan stage parallelizable."""
    batch_ids = sorted(
        r["batch_id"] for r in events.select("batch_id").distinct().collect()
    )
    if files_per_batch is None:
        files_per_batch = events.sparkSession.sparkContext.defaultParallelism * 4
    out = []
    for b in batch_ids:
        sub = events.filter(F.col("batch_id") == b)
        if b < tool_from_batch:
            sub = sub.drop("tool")
        path = os.path.join(out_dir, f"batch_{b:05d}")
        sub.repartition(files_per_batch).write.mode("overwrite").parquet(path)
        out.append((int(b), path))
    return out
