"""Point-lookup serving path: read one conversation via bucket pruning."""

import os

from runyoro_llm_data_pipeline_spark.cdc.generator import (
    gen_change_log,
    write_batch_files,
)
from runyoro_llm_data_pipeline_spark.cdc.ingest import CdcIngest


def test_read_conversation_prunes_and_matches(spark, tmp_lake, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pl"))
    events, expected = gen_change_log(spark, n_turns=400, n_convs=20, n_batches=3)
    write_batch_files(events, d)
    ing = CdcIngest(os.path.join(tmp_lake, "t"), d, num_buckets=8, mode="mor")
    results = ing.run(spark)
    assert all(r["sec"] is not None and r["sec"] > 0 for r in results)
    t = ing.table()

    full = t.read(spark)
    convs = [r["conv_id"] for r in full.select("conv_id").distinct().collect()]
    for conv in convs[:3]:
        got = t.read_conversation(spark, conv)
        want = full.filter(full.conv_id == conv)
        assert sorted(r["turn_idx"] for r in got.collect()) == sorted(
            r["turn_idx"] for r in want.collect()
        )
        assert got.columns == full.columns
    # missing conversation → empty, not error
    assert t.read_conversation(spark, "no_such_conv").count() == 0
