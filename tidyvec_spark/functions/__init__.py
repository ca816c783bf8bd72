from tidyvec_spark.functions.vector import (
    dot_expr,
    embedding_stats_expr,
    l2_norm_expr,
    cosine_sim_expr,
    euclidean_sim_expr,
    l2_normalize_expr,
    matryoshka_expr,
    similarity_expr,
)
from tidyvec_spark.functions import quality, text, urls

__all__ = [
    "dot_expr",
    "embedding_stats_expr",
    "l2_norm_expr",
    "matryoshka_expr",
    "cosine_sim_expr",
    "euclidean_sim_expr",
    "l2_normalize_expr",
    "similarity_expr",
    "quality",
    "text",
    "urls",
]
