"""Scalar / column-function facade — one import point for the engine's
reusable column expressions (the "functions library" layer over the
operator modules).

>>> from runyoro_llm_data_pipeline_spark import functions as EF
>>> df.select(EF.clean_text(F.col("text")), EF.token_count(F.col("text")))
"""

from runyoro_llm_data_pipeline_spark.operators.dispatch import (  # noqa: F401
    detect_source_type,
    dir_pair_flags,
    output_name,
    pair_audio_text,
)
from runyoro_llm_data_pipeline_spark.operators.multimodal import (  # noqa: F401
    align_audio_text_cogroup,
    align_audio_text_proportional,
)
from runyoro_llm_data_pipeline_spark.operators.similarity import (  # noqa: F401
    build_lsh_index,
    infer_dim,
)
from runyoro_llm_data_pipeline_spark.operators.text import (  # noqa: F401
    clean_and_preprocess_text_col as clean_text,
    clean_and_preprocess_text_pandas as clean_text_exact,
    clean_text_initial_col as clean_text_initial,
    min_length_filter,
    non_empty_text,
)
from runyoro_llm_data_pipeline_spark.operators.textstats import (  # noqa: F401
    punct_count,
    stopword_count,
    token_count,
    tokens_col,
)
from runyoro_llm_data_pipeline_spark.operators.dedup import (  # noqa: F401
    shingles_col,
)
