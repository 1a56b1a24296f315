from runyoro_llm_data_pipeline_spark.lake.table import LakeTable, Snapshot  # noqa: F401
