"""runyoro_llm_data_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the query & data-processing capabilities of
``nyacly/runyoro-llm-data-pipeline`` (single-process Python pipeline) as an
idiomatic Spark engine:

* change-event log (insert/update/delete/upsert keyed on ``conv_id, turn_idx``)
  applied to a snapshot-atomic lake table of multi-turn transcripts,
* latest-wins dedup via map-side-combinable aggregation (skew-proof),
* bucket-pruned copy-on-write MERGE,
* exactly-once commits (offsets live inside the table snapshot),
* additive schema evolution, per-partition lineage, checkpoint resume,
* plus the training-data operator library (dedup, similarity, text stats).

Reference parity is documented per-module via ``file:line`` citations into
``/root/reference``.
"""

__version__ = "0.1.0"

from runyoro_llm_data_pipeline_spark.session import get_spark  # noqa: F401
