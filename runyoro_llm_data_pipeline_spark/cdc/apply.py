"""apply_batch — validate → normalize → collapse → MERGE → atomic commit.

One call = one exactly-once unit, generalizing the reference's per-source
ingest transaction (dedup check ``scripts/orchestrator.py:88-101`` …
ledger rewrite ``scripts/orchestrator.py:184-186``):

* **idempotency gate**: if ``batch_id`` is already in the current snapshot's
  applied-offset map the call is a no-op (returns ``skipped``) — replaying a
  batch after a crash, or delivering it twice, cannot double-apply;
* **normalization** (P2): the reference's ``clean_and_preprocess_text``
  (``scripts/text_processing.py:15-40``) applied to the ``text`` payload as a
  JVM column expression — the per-turn equality invariant lives here;
* **collapse** (W3): latest-wins by ``(event_ts, lsn)`` per key;
* **MERGE**: bucket-pruned copy-on-write upsert (``lake.merge``);
* **commit**: data files + applied offsets + lineage rows land in ONE
  snapshot; the version-pointer rename is the commit point. Crash anywhere
  before it → next run re-applies the batch onto the previous snapshot and
  converges to the same state (orphan files are ignored by manifests).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.cdc.dedup import collapse_latest_wins
from runyoro_llm_data_pipeline_spark.cdc.events import validate_events
from runyoro_llm_data_pipeline_spark.lake.merge import merge_into
from runyoro_llm_data_pipeline_spark.lake.table import LINEAGE_DIR, LakeTable
from runyoro_llm_data_pipeline_spark.operators.text import clean_and_preprocess_text_col


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    normalize_text: bool = True,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> dict[str, Any]:
    snap = table.current()
    if str(batch_id) in snap.applied:
        return {"status": "skipped", "batch_id": batch_id, "version": snap.version}

    valid, rejected = validate_events(events)
    n_rejected = rejected.count()

    if normalize_text:
        valid = valid.withColumn(
            "text", clean_and_preprocess_text_col(F.col("text"))
        )

    changes = collapse_latest_wins(valid, keys=key_cols)
    plan = merge_into(spark, table, changes, key_cols=key_cols, snap=snap)

    version = plan["version"]
    stats = plan["bucket_stats"]
    if stats:
        min_lsn = min(s["min_lsn"] for s in stats)
        max_lsn = max(s["max_lsn"] for s in stats)
    else:
        min_lsn = max_lsn = -1

    # lineage rows written BEFORE the pointer swap; referenced by the snapshot
    lineage_rel = os.path.join(LINEAGE_DIR, f"v{version:08d}")
    lineage_df = spark.createDataFrame(
        [
            (
                int(batch_id),
                int(s["__bucket"]),
                int(s["min_lsn"]),
                int(s["max_lsn"]),
                int(s["row_count"]),
                int(version),
            )
            for s in stats
        ],
        schema="batch_id long, bucket int, min_lsn long, max_lsn long, "
        "row_count long, snapshot_version long",
    )
    lineage_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(table.path, lineage_rel)
    )

    table.commit(
        new_files=plan["new_files"],
        carried_files=plan["carried_files"],
        schema=plan["schema"],
        applied_update={str(batch_id): [int(min_lsn), int(max_lsn)]},
        summary_update={
            "last_batch_id": int(batch_id),
            "watermark_lsn": max(
                int(snap.summary.get("watermark_lsn", -1)), int(max_lsn)
            ),
        },
        lineage_rel_path=lineage_rel,
        parent=snap,
    )
    return {
        "status": "applied",
        "batch_id": batch_id,
        "version": version,
        "affected_buckets": plan["affected_buckets"],
        "rejected_rows": n_rejected,
        "applied_keys": sum(s["row_count"] for s in stats),
        "min_lsn": min_lsn,
        "max_lsn": max_lsn,
    }
