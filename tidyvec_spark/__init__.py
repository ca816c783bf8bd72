"""tidyvec_spark — a PySpark-native vector analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference R package flmnh-ai/tidyvec (an in-memory vector database
over tibbles), re-expressed Spark-first:

- ``VecFrame``: a collection = ``pyspark.sql.DataFrame`` + embedding
  metadata (the Spark analog of the tidyvec S3 class, reference
  R/core.R:8-26).
- Embedders: serializable specs compiled to Spark dataflow (TF-IDF) or
  Arrow-batched pandas UDFs (HuggingFace, custom callables) — the Spark
  analog of the reference's embedder closures (R/embedders.R).
- Query verbs (``nearest``, ``similarity``) compile to stock DataFrame
  expressions ending in TakeOrderedAndProject (reference R/core.R:241-328).
- Analytics: pyspark.ml KMeans / PCA (reference R/core.R:337-367,
  R/visualization.R:17-113).
- LLM-data-pipeline extensions designed for 100 TB: exact/near
  deduplication, similarity join / ANN, text analysis, multimodal
  column plumbing, streaming aggregation.

Everything here is built only from the public Apache Spark / PySpark
API; no code is copied from the reference.
"""

from tidyvec_spark.collection import VecFrame, vec
from tidyvec_spark.embedders.base import EmbedderSpec, CallableEmbedder
from tidyvec_spark.embedders.tfidf import TfidfEmbedder
from tidyvec_spark.functions.vector import (
    similarity,
    dot_expr,
    l2_norm_expr,
    cosine_sim_expr,
    euclidean_sim_expr,
    l2_normalize_expr,
    similarity_expr,
)
from tidyvec_spark.sources.vec_io import write_vec, read_vec
from tidyvec_spark.session import configure, make_session

__all__ = [
    "configure",
    "make_session",
    "VecFrame",
    "vec",
    "EmbedderSpec",
    "CallableEmbedder",
    "TfidfEmbedder",
    "dot_expr",
    "l2_norm_expr",
    "cosine_sim_expr",
    "euclidean_sim_expr",
    "l2_normalize_expr",
    "similarity",
    "similarity_expr",
    "write_vec",
    "read_vec",
]

__version__ = "0.1.0"
