"""embed — materialize embeddings for un-embedded rows.

Reference semantics (R/core.R:127-227): compute embeddings only where
the embedding is NULL (incremental), unless ``force``; error if the
content column is missing; early-exit when nothing to do.

Spark shape: one ``withColumn`` with
``when(isNull(emb), embedder(content)).otherwise(emb)`` — lazy, no job
until an action; Catalyst only evaluates the embedder branch on rows
that need it. The reference's hand-rolled batch-of-32 loop
(R/core.R:162-197) disappears: Arrow batching inside pandas_udf (or
pure dataflow for TF-IDF) is the batching.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import functions as F

from tidyvec_spark.collection import VecFrame
from tidyvec_spark.embedders.base import EmbedderSpec, FittedEmbedder


def embed(
    vf: VecFrame,
    content_col: str,
    embedder: Optional[Union[EmbedderSpec, FittedEmbedder]] = None,
    force: bool = False,
) -> VecFrame:
    if content_col not in vf.columns:
        # parity: reference raises on a missing content column (R/core.R:142-144)
        raise ValueError(
            f"content column {content_col!r} not found in {vf.columns}"
        )
    emb = embedder or vf.embedder
    if emb is None:
        # parity: reference raises when no embedder attached (R/core.R:133-139)
        raise ValueError(
            "no embedding function: attach one via vec(embedding_fn=...) "
            "or pass embedder="
        )
    if isinstance(emb, EmbedderSpec) and not isinstance(emb, FittedEmbedder):
        emb = emb.fit(vf.df, content_col)

    c = vf.embedding_col
    tmp = "__tv_new_emb"
    df = emb.embed_column(vf.df, content_col, tmp)
    if force or c not in vf.df.columns:
        # force=TRUE re-embeds every row (R/core.R:147-149)
        out = df.withColumn(c, F.col(tmp)).drop(tmp)
    else:
        out = df.withColumn(
            c, F.when(F.col(c).isNull(), F.col(tmp)).otherwise(F.col(c))
        ).drop(tmp)
    return VecFrame(
        out,
        embedding_col=c,
        embedder=emb,
        dim=getattr(emb, "dim", None) or vf.dim,
        normalized=vf.normalized,
    )
