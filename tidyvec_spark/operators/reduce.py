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


def covariance_stats(
    df: DataFrame,
    emb_col: str,
    dim: int,
) -> DataFrame:
    """The lazy moment aggregate behind :func:`embedding_covariance`
    and :func:`whiten_embeddings`: upper-triangle rows
    (i, j, n, sx, sy, sxy) with i ≤ j < ``dim`` where sx = Σx_i,
    sy = Σx_j, sxy = Σx_i·x_j over non-NULL embeddings.

    ONE corpus scan: each Arrow batch contributes BLAS partials
    (n, Σx per dim, XᵀX upper triangle) via ``mapInPandas`` — never a
    row explosion into n·d² records — and the final aggregate is
    d(d+1)/2 rows regardless of corpus size, fully map-side-combined.
    Covariance AND per-dimension means both read off this one frame:
    cov(i,j) = sxy/n − (sx/n)(sy/n), μ_i = sx/n on the diagonal rows —
    so a consumer that needs both (whitening) pays one scan, one
    collect. Rows with a different length than ``dim`` raise — a
    silent skip would bias every entry."""
    import numpy as np
    from pyspark.sql import types as T

    d = int(dim)
    if d < 1:
        raise ValueError("dim must be >= 1")
    iu = np.triu_indices(d)
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType(), False),
            T.StructField("j", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("sx", T.DoubleType(), False),
            T.StructField("sy", T.DoubleType(), False),
            T.StructField("sxy", T.DoubleType(), False),
        ]
    )
    col = emb_col

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            vals = pdf[col].dropna()
            if not len(vals):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vals])
            if X.shape[1] != d:
                raise ValueError(
                    f"embedding length {X.shape[1]} != dim {d}"
                )
            g = X.T @ X
            s = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "n": np.full(len(iu[0]), len(X), dtype="int64"),
                    "sx": s[iu[0]],
                    "sy": s[iu[1]],
                    "sxy": g[iu],
                }
            )

    return (
        df.select(F.col(emb_col).cast("array<double>").alias(col))
        .filter(F.col(col).isNotNull())
        .mapInPandas(partials, schema)
        .groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
            F.sum("sxy").alias("sxy"),
        )
    )


def embedding_covariance(
    df: DataFrame,
    emb_col: str,
    dim: int,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Population covariance of an embedding column as the UPPER
    TRIANGLE (i, j, cov), i ≤ j < ``dim`` — the spectral health
    primitive behind anisotropy diagnosis (Ethayarajh 2019: contextual
    embeddings concentrate in a narrow cone; Mu & Viswanath 2018
    remove the top components) and the input to
    :func:`whiten_embeddings`. One corpus scan via
    :func:`covariance_stats`; NULL embeddings are excluded (they carry
    no coordinates)."""
    agg = covariance_stats(df, emb_col, dim)
    cov = F.col("sxy") / F.col("n") - (F.col("sx") / F.col("n")) * (
        F.col("sy") / F.col("n")
    )
    if round_to is not None:
        # + 0.0 folds IEEE -0.0 (a tiny negative covariance rounding to
        # zero) into +0.0 — DuckDB's ROUND preserves the sign bit while
        # Spark's BigDecimal HALF_UP does not, so without the fold the
        # two engines emit bit-different zeros for the same value.
        cov = F.round(cov, int(round_to)) + F.lit(0.0)
    return agg.select("i", "j", cov.alias("cov"))


def effective_rank(
    df: DataFrame,
    emb_col: str,
    dim: int,
    cov_round: int = 4,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Participation-ratio EFFECTIVE RANK of the embedding space:
    PR = (Σλ)² / Σλ² = trace(C)² / ‖C‖_F² (Roy & Vetterli 2007;
    the participation ratio of statistical physics) — the one-number
    dimensional-collapse diagnostic: an isotropic d-dim cloud reads
    ≈ d, an anisotropic cone (Ethayarajh 2019's contextual-embedding
    pathology) reads a small fraction of d, and a DROP release-over-
    release means the embedder started wasting dimensions.

    Computed WITHOUT any eigendecomposition: trace(C) is the diagonal
    sum and ‖C‖_F² = Σ_ij C_ij² comes off the same d(d+1)/2 upper-
    triangle covariance rows (off-diagonal entries count twice) — so
    the whole diagnostic is :func:`embedding_covariance`'s ONE corpus
    scan plus a 2080-row aggregate, and the SQL twin replays it
    exactly over the same ``cov_round``-rounded covariances. Returns
    ONE row (dim, trace, frob_sq, effective_rank)."""
    cov = embedding_covariance(df, emb_col, dim, round_to=cov_round)
    diag = F.when(F.col("i") == F.col("j"), F.col("cov"))
    w = F.when(F.col("i") == F.col("j"), F.lit(1.0)).otherwise(F.lit(2.0))
    agg = cov.agg(
        F.sum(diag).alias("trace"),
        F.sum(w * F.col("cov") * F.col("cov")).alias("frob_sq"),
    )
    pr = F.when(
        F.col("frob_sq") > 0,
        F.col("trace") * F.col("trace") / F.col("frob_sq"),
    )
    trace, fro = F.col("trace"), F.col("frob_sq")
    if round_to is not None:
        trace = F.round(trace, int(round_to)) + F.lit(0.0)
        fro = F.round(fro, int(round_to))
        pr = F.round(pr, int(round_to))
    return agg.select(
        F.lit(int(dim)).alias("dim"),
        trace.alias("trace"),
        fro.alias("frob_sq"),
        pr.alias("effective_rank"),
    )


def whiten_embeddings(
    df: DataFrame,
    emb_col: str,
    dim: int,
    id_cols: Optional[Sequence[str]] = None,
    out_col: str = "whitened",
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA-whiten an embedding column: x ↦ C^{-1/2}(x − μ) so the
    output covariance is (numerically) the identity — the fix for
    anisotropic embedding spaces where a few dominant directions
    drown cosine similarity (Mu & Viswanath 2018's all-but-the-top is
    the rank-k cousin; ZCA is the full correction and stays closest
    to the original basis).

    ONE fitting scan, ONE collect: :func:`covariance_stats` already
    carries the per-dimension sums (sx on the diagonal rows), so the
    covariance matrix AND the mean vector both come off the same
    d(d+1)/2-row collect — a BOUNDED driver artifact, like PQ
    codebooks. Eigendecomposition on the driver (d×d, microseconds),
    then one map-side BLAS projection per Arrow batch. ``eps`` floors
    the eigenvalues so near-singular directions do not explode.

    Rows whose embedding is NULL pass through with a NULL ``out_col``
    (no coordinates to project) — the output has exactly one row per
    input row, so joining whitened vectors back by id is lossless.
    The fit itself excludes NULLs, matching
    :func:`embedding_covariance`."""
    import numpy as np
    from pyspark.sql import types as T

    d = int(dim)
    id_cols = list(id_cols or [])
    stats = covariance_stats(df, emb_col, d).collect()
    C = np.zeros((d, d))
    mu = np.zeros(d)
    for r in stats:
        n = r["n"]
        cov = r["sxy"] / n - (r["sx"] / n) * (r["sy"] / n)
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = cov
        if r["i"] == r["j"]:
            mu[r["i"]] = r["sx"] / n
    lam, U = np.linalg.eigh(C)
    W = U @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + float(eps))) @ U.T
    fields = [df.schema[c] for c in id_cols]
    fields.append(
        T.StructField(out_col, T.ArrayType(T.DoubleType(), False), True)
    )
    schema = T.StructType(fields)
    col = emb_col

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mask = pdf[col].notna().to_numpy()
            out = {c: pdf[c].values for c in id_cols}
            proj = [None] * len(pdf)
            if mask.any():
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[col][mask]]
                )
                Y = (X - mu) @ W.T
                for k, p in enumerate(np.flatnonzero(mask)):
                    proj[p] = Y[k]
            out[out_col] = pd.Series(proj, dtype="object")
            yield pd.DataFrame(out)

    return df.select(
        *id_cols, F.col(emb_col).cast("array<double>").alias(col)
    ).mapInPandas(project, schema)


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


def embedding_anisotropy(
    df: DataFrame,
    emb_col: str,
    scale: int = 1_000_000,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Mean pairwise cosine similarity of the embedding cloud —
    Ethayarajh 2019's ANISOTROPY number, the directional-bias
    complement of :func:`effective_rank`'s dimensional-collapse ratio
    (a cone can use all d dimensions yet point one way; ~0 means
    directions balance, → 1 means every vector says the same thing and
    cosine retrieval loses its contrast).

    Never all-pairs: over unit-normalized rows ``u_i``, the pair mean
    has the closed form ``(‖Σu‖² − Σ‖u_i‖²) / (n(n−1))`` — ONE scan,
    no join. Engine-exactness: each row is normalized (a per-row
    IEEE-deterministic fold + sqrt + divide), then quantized ONCE to
    int64 (``round(u·scale)``), so the cross-row sums the identity
    needs are exact integers in any order/partitioning; the two
    quadratic reductions accumulate in DECIMAL(38,0) (``Σ_d S_d²``
    reaches n²·scale²·d — past int64 by ~n=1200 already). Quantization
    perturbs each coordinate by ≤ 5e-7, so the estimate is exact to
    ~1e-6 — the output grain.

    Returns ONE row: (n_vectors, anisotropy)."""
    s = int(scale)
    x = F.col(emb_col).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.transform(x, lambda v: v * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    u = F.transform(x, lambda v: F.round(v / norm * s, 0).cast("long"))
    ex = (
        df.filter(F.col(emb_col).isNotNull())
        .select(F.posexplode(u).alias("d", "ui"))
    )
    per_dim = ex.groupBy("d").agg(
        F.sum("ui").alias("sd"),                      # Σ_i u_id  (exact)
        F.sum(F.col("ui") * F.col("ui")).alias("qd"),  # Σ_i u_id² (exact)
        F.count("*").alias("nd"),
    )
    dec = "decimal(38,0)"
    agg = per_dim.agg(
        (
            F.sum(F.col("sd").cast(dec) * F.col("sd").cast(dec))
            - F.sum(F.col("qd").cast(dec))
        ).alias("__num"),
        F.max("nd").cast("long").alias("__n"),
    )
    a = F.when(
        F.col("__n") > 1,
        F.col("__num").cast("double")
        / (F.col("__n") * (F.col("__n") - F.lit(1))).cast("double")
        / F.lit(float(s) * float(s)),
    )
    if round_to is not None:
        a = F.round(a, int(round_to)) + F.lit(0.0)
    return agg.select(
        F.col("__n").alias("n_vectors"), a.alias("anisotropy")
    )
