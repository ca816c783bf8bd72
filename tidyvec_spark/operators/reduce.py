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


def random_projection_expr(
    emb_col,
    dim: int,
    out_dim: int,
    seed: int = 42,
    scale: bool = True,
):
    """Johnson-Lindenstrauss random projection as a PURE map-side
    column expression: ``out_dim`` Gaussian dot products (the same
    deterministic rounded-literal planes the LSH family embeds —
    operators/ann.py::random_planes), scaled by 1/sqrt(out_dim) so
    pairwise distances are preserved in expectation (JL lemma).

    The scan-cost lever BEFORE quantization: a 1024-dim float corpus
    projected to 64 dims is a 16x cheaper exact scan with bounded
    distortion, no training pass (vs PCA), and the projection embeds
    in the expression itself — any reader reproduces it from
    (dim, out_dim, seed) alone, the same zero-artifact property the
    ANN sidecars rely on. No shuffle, no Python, no fitted state.
    """
    from tidyvec_spark.functions.vector import array_lit, dot_expr
    from tidyvec_spark.operators.ann import random_planes

    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    planes = random_planes(int(dim), nbits=int(out_dim), seed=seed)
    col = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    s = 1.0 / float(out_dim) ** 0.5 if scale else 1.0
    return F.array(
        *[dot_expr(col, array_lit(p)) * F.lit(s) for p in planes]
    )


def random_projection_py(
    vec: Sequence[float],
    out_dim: int,
    seed: int = 42,
    scale: bool = True,
) -> list:
    """Driver-side twin of :func:`random_projection_expr` (same planes,
    same arithmetic order) for projecting literal query vectors."""
    from tidyvec_spark.operators.ann import random_planes

    planes = random_planes(len(vec), nbits=int(out_dim), seed=seed)
    s = 1.0 / float(out_dim) ** 0.5 if scale else 1.0
    out = []
    for p in planes:
        acc = 0.0
        for x, w in zip(vec, p):
            acc += float(x) * w
        out.append(acc * s)
    return out
