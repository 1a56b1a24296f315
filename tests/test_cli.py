"""spark-submit CLI entry: end-to-end subprocess smoke (fresh JVM, the
deployment-shaped invocation)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_ingest_roundtrip(spark, tmp_lake, tmp_path_factory):
    from runyoro_llm_data_pipeline_spark.cdc.generator import (
        gen_change_log,
        write_batch_files,
    )

    log_dir = str(tmp_path_factory.mktemp("clilog"))
    events, _ = gen_change_log(spark, n_turns=200, n_convs=10, n_batches=2)
    write_batch_files(events, log_dir, files_per_batch=4)
    table = os.path.join(tmp_lake, "t")

    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, "-m", "runyoro_llm_data_pipeline_spark.cli",
            "--table", table, "--batch-dir", log_dir,
            "--num-buckets", "4", "--mode", "mor", "--master", "local[4]",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["batches_applied"] == 2
    assert rep["keys_applied"] > 0
    # rerun in-process: nothing pending
    from runyoro_llm_data_pipeline_spark.cdc.ingest import CdcIngest

    assert CdcIngest(table, log_dir).run(spark) == []
