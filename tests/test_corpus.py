"""Corpus-prep operators: tokenize/truncate/pad, split, validation gate."""

import pytest
from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.operators.corpus import (
    admission_filter,
    tokenize_fixed_width,
    train_eval_split,
    validate_token_dataset,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_tokenize_shapes(spark, docs):
    tok = tokenize_fixed_width(admission_filter(docs), block_size=32)
    rows = tok.select("input_ids", "labels", "n_real_tokens").collect()
    for r in rows:
        assert len(r["input_ids"]) == 32
        assert len(r["labels"]) == 32
        n = r["n_real_tokens"]
        assert 1 <= n <= 32
        # padding is masked in labels, real tokens mirrored
        for i, (x, y) in enumerate(zip(r["input_ids"], r["labels"])):
            if i < n:
                assert x == y and x > 0
            else:
                assert x == 0 and y == -100


def test_tokenize_deterministic(spark, docs):
    a = tokenize_fixed_width(docs, block_size=16).select("doc_id", "input_ids")
    b = tokenize_fixed_width(docs, block_size=16).select("doc_id", "input_ids")
    assert a.exceptAll(b).count() == 0


def test_split_is_seeded_and_disjoint(spark, docs):
    tok = tokenize_fixed_width(docs, block_size=16)
    tr1, ev1 = train_eval_split(tok, seed=7)
    tr2, ev2 = train_eval_split(tok, seed=7)
    assert tr1.count() == tr2.count() and ev1.count() == ev2.count()
    assert tr1.count() + ev1.count() == tok.count()
    both = tr1.select("doc_id").intersect(ev1.select("doc_id"))
    assert both.count() == 0


def test_validation_gate(spark, docs):
    tok = tokenize_fixed_width(admission_filter(docs), block_size=32)
    stats = validate_token_dataset(tok, block_size=32)
    assert stats["bad_width"] == 0 and stats["bad_ids"] == 0
    with pytest.raises(ValueError, match="too small"):
        validate_token_dataset(tok.limit(3), block_size=32)
    broken = tok.withColumn("input_ids", F.slice("input_ids", 1, 5))
    with pytest.raises(ValueError, match="malformed"):
        validate_token_dataset(broken, block_size=32)
