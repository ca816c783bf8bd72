"""Dimensionality reduction (reference viz_embeddings,
R/visualization.R:17-113).

- PCA: fully distributed via pyspark.ml (StandardScaler first, matching
  the reference's ``prcomp(scale. = TRUE)``, R/visualization.R:58-61);
  the n x d matrix never reaches the driver.
- UMAP / t-SNE: inherently driver-side algorithms — the engine collects
  a BOUNDED sample (seeded, like the reference's seed 42,
  R/visualization.R:45,53) and delegates to umap-learn / scikit-learn
  when installed (they are not in this container; import-gated exactly
  like the reference keeps them in Suggests).

Coordinates come back as a DataFrame so plotting stays separable from
computation (the reference couples them; documented improvement).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(
    df: DataFrame,
    embedding_col: str,
    k: int = 2,
    id_cols: Optional[Sequence[str]] = None,
    scale: bool = True,
    out_prefix: str = "pc",
) -> DataFrame:
    """Project embeddings to k principal components, distributed."""
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    id_cols = list(id_cols or [])
    feat = df.filter(F.col(embedding_col).isNotNull()).withColumn(
        "__v", array_to_vector(F.col(embedding_col).cast("array<double>"))
    )
    if scale:
        scaler = StandardScaler(
            inputCol="__v", outputCol="__vs", withMean=True, withStd=True
        )
        feat = scaler.fit(feat).transform(feat)
        vec_col = "__vs"
    else:
        vec_col = "__v"
    pca = PCA(k=int(k), inputCol=vec_col, outputCol="__pc")
    model = pca.fit(feat)
    out = model.transform(feat).withColumn("__arr", vector_to_array("__pc"))
    cols = id_cols + [
        F.col("__arr")[i].alias(f"{out_prefix}{i + 1}") for i in range(int(k))
    ]
    return out.select(*cols)


def umap_coords(
    df: DataFrame,
    embedding_col: str,
    id_cols: Optional[Sequence[str]] = None,
    n_neighbors: int = 15,
    seed: int = 42,
    max_rows: int = 50_000,
):
    """UMAP on a bounded sample (driver-side; needs umap-learn)."""
    return _driver_reduce(df, embedding_col, id_cols, "umap",
                          dict(n_neighbors=n_neighbors), seed, max_rows)


def tsne_coords(
    df: DataFrame,
    embedding_col: str,
    id_cols: Optional[Sequence[str]] = None,
    perplexity: float = 30.0,
    seed: int = 42,
    max_rows: int = 50_000,
):
    """t-SNE on a bounded sample (driver-side; needs scikit-learn)."""
    return _driver_reduce(df, embedding_col, id_cols, "tsne",
                          dict(perplexity=perplexity), seed, max_rows)


def _driver_reduce(df, embedding_col, id_cols, method, params, seed, max_rows):
    import numpy as np

    id_cols = list(id_cols or [])
    sub = df.filter(F.col(embedding_col).isNotNull()).limit(int(max_rows))
    pdf = sub.select(*id_cols, embedding_col).toPandas()
    mat = np.array(pdf[embedding_col].tolist(), dtype=np.float32)
    if method == "umap":
        try:
            import umap  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "UMAP needs the umap-learn package (not installed; "
                "reference keeps it optional too)"
            ) from e
        coords = umap.UMAP(random_state=seed, **params).fit_transform(mat)
    else:
        try:
            from sklearn.manifold import TSNE  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "t-SNE needs scikit-learn (not installed; reference keeps "
                "Rtsne optional too)"
            ) from e
        coords = TSNE(n_components=2, random_state=seed, **params).fit_transform(mat)
    out = pdf[id_cols].copy()
    out["x"] = coords[:, 0]
    out["y"] = coords[:, 1]
    return df.sparkSession.createDataFrame(out)
