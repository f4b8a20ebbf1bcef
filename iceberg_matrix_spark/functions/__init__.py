from iceberg_matrix_spark.functions.text import (
    md5_fingerprint,
    norm_text,
    token_count,
    tokens,
    word_shingles,
)
from iceberg_matrix_spark.functions.vectors import cosine, dot, l2_norm, to_double_array

__all__ = [
    "tokens",
    "token_count",
    "word_shingles",
    "norm_text",
    "md5_fingerprint",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine",
]
