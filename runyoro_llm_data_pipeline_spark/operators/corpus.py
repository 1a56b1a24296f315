"""Training-corpus preparation operators — the downstream-consumer path.

Re-expresses the reference's dataset pipeline (``scripts/train_llm.py:
154-224`` scan → filter → batched tokenize map → random split → validation
gates; ``scripts/tokenizer_utils.py:9-18`` corpus iteration) as DataFrame
stages:

* corpus scan: ``spark.read.text(dir/*.txt)`` / parquet documents;
* admission filters P5/P6 (blank, min-length);
* fixed-width tokenization to integer id arrays (O5 truncation +
  padding), with a deterministic hash vocab standing in for a trained BPE
  (the operator shape — ``text → input_ids/labels`` arrays — is what the
  engine owns; a real tokenizer slots in as a pandas_udf);
* seeded random 90/10 split (O4);
* the NaN/shape validation gate (A4, ``train_llm.py:210-224``) as one
  aggregate.

All JVM expressions except nothing — zero Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.operators.textstats import tokens_col

PAD_ID = 0
UNK_VOCAB = 32_000


def scan_text_corpus(spark: SparkSession, path_glob: str) -> DataFrame:
    """S3/S4: line-oriented corpus scan, blank lines dropped
    (``scripts/train_llm.py:154-161``, ``scripts/tokenizer_utils.py:14-16``).
    """
    return (
        spark.read.text(path_glob)
        .select(F.col("value").alias("text"))
        .filter(F.length(F.trim("text")) > 0)
    )


def admission_filter(df: DataFrame, text_col: str = "text", min_len: int = 10) -> DataFrame:
    """P5 + P6 (``scripts/train_llm.py:161-162``)."""
    t = F.col(text_col)
    return df.filter(t.isNotNull() & (F.trim(t) != "") & (F.length(t) > min_len))


def tokenize_fixed_width(
    df: DataFrame,
    text_col: str = "text",
    block_size: int = 64,
    vocab_size: int = UNK_VOCAB,
) -> DataFrame:
    """``text → input_ids/labels`` fixed-width arrays: whitespace tokens →
    deterministic hash ids → truncate to ``block_size`` (O5,
    ``train_llm.py:172-176``) → right-pad. ``labels`` mirror ``input_ids``
    with pad masked to -100, per the causal-LM convention the reference
    uses (``train_llm.py:178-180``)."""
    toks = tokens_col(F.col(text_col))
    ids_full = F.transform(
        toks,
        lambda t: (F.pmod(F.xxhash64(t), F.lit(vocab_size - 1)) + 1).cast("int"),
    )
    ids = F.slice(ids_full, 1, block_size)
    n = F.least(F.size(ids_full), F.lit(block_size))
    pad = F.transform(
        F.sequence(F.lit(1), F.lit(block_size)),
        lambda i: F.when(i <= n, F.element_at(ids, i)).otherwise(F.lit(PAD_ID)),
    )
    labels = F.transform(
        pad, lambda x: F.when(x == PAD_ID, F.lit(-100)).otherwise(x)
    )
    return df.select(
        "*",
        pad.alias("input_ids"),
        labels.alias("labels"),
        n.cast("int").alias("n_real_tokens"),
    )


def train_eval_split(
    df: DataFrame, eval_fraction: float = 0.1, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """O4 (``train_llm.py:189``): seeded random split."""
    train, ev = df.randomSplit([1.0 - eval_fraction, eval_fraction], seed=seed)
    return train, ev


def validate_token_dataset(
    df: DataFrame, block_size: int = 64, min_rows: int = 10
) -> dict:
    """A4 gate (``train_llm.py:190-224``): dataset-size guards plus a full
    scan for malformed arrays (wrong width, out-of-range ids) in ONE
    aggregate. Raises ValueError exactly like the reference does."""
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum((F.size("input_ids") != block_size).cast("long")).alias("bad_width"),
        F.sum(
            F.exists("input_ids", lambda x: x.isNull() | (x < 0)).cast("long")
        ).alias("bad_ids"),
        F.sum((F.col("n_real_tokens") == 0).cast("long")).alias("empty_rows"),
    ).collect()[0]
    if agg["n"] < min_rows:
        raise ValueError(
            f"dataset too small: {agg['n']} rows < {min_rows} "
            "(cf. scripts/train_llm.py:192-203)"
        )
    if agg["bad_width"] or agg["bad_ids"]:
        raise ValueError(
            f"malformed token arrays: width={agg['bad_width']} ids={agg['bad_ids']} "
            "(cf. scripts/train_llm.py:210-224)"
        )
    return {
        "rows": agg["n"],
        "bad_width": agg["bad_width"],
        "bad_ids": agg["bad_ids"],
        "empty_rows": agg["empty_rows"],
    }


def corpus_from_lake(
    spark: SparkSession, table_path: str, min_len: int = 10
) -> DataFrame:
    """End-to-end consumer hookup: lake transcripts → admission-filtered
    line corpus — what the reference's trainer reads from processed_data/
    (``train_llm.py:126-129``), served straight from the table."""
    from runyoro_llm_data_pipeline_spark.lake.table import LakeTable

    t = LakeTable.load(table_path)
    df = t.read(spark).select(
        F.col("conv_id"), F.col("turn_idx"), F.col("text")
    )
    return admission_filter(df, min_len=min_len)
