from tidyvec_spark.embedders.base import (
    EmbedderSpec,
    FittedEmbedder,
    CallableEmbedder,
    register_embedder,
    resolve_embedder,
)
from tidyvec_spark.embedders.tfidf import TfidfEmbedder, FittedTfidf
from tidyvec_spark.embedders.hf import HFEmbedder

__all__ = [
    "EmbedderSpec",
    "FittedEmbedder",
    "CallableEmbedder",
    "TfidfEmbedder",
    "FittedTfidf",
    "HFEmbedder",
    "register_embedder",
    "resolve_embedder",
]
