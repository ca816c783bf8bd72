from tidyvec_spark.functions.vector import (
    dot_expr,
    l2_norm_expr,
    cosine_sim_expr,
    euclidean_sim_expr,
    l2_normalize_expr,
    similarity_expr,
)
from tidyvec_spark.functions import quality, text

__all__ = [
    "dot_expr",
    "l2_norm_expr",
    "cosine_sim_expr",
    "euclidean_sim_expr",
    "l2_normalize_expr",
    "similarity_expr",
    "quality",
    "text",
]
