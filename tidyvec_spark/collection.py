"""VecFrame — the collection abstraction (reference R/core.R:8-116).

A tidyvec collection is a tibble + two attributes (embedding column
name, embedder) whose class survives subsetting (reference
R/core.R:8-26, 98-116). The Spark analog is composition: ``VecFrame``
wraps a ``pyspark.sql.DataFrame`` plus metadata, and every DataFrame
verb accessed through the wrapper returns a re-wrapped ``VecFrame`` —
the engine-side solution to the ``[.tidyvec`` metadata-propagation
problem. The wrapped plan stays fully lazy; Catalyst sees only stock
expressions.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidyvec_spark.embedders.base import EmbedderSpec, FittedEmbedder

# DataFrame methods that return DataFrames and should re-wrap into VecFrame
_WRAPPED_METHODS = {
    "filter", "where", "select", "selectExpr", "limit", "distinct",
    "dropDuplicates", "drop", "withColumn", "withColumns",
    "withColumnRenamed", "withColumnsRenamed", "orderBy", "sort",
    "sample", "repartition", "repartitionByRange", "coalesce", "union",
    "unionByName", "join", "crossJoin", "alias", "cache", "persist",
    "unpersist", "hint", "dropna", "fillna", "exceptAll", "intersectAll",
    "offset",
}


class VecFrame:
    """A vector collection: DataFrame + {embedding_col, embedder, dim,
    normalized}. Mirrors vec()'s attribute plumbing (R/core.R:8-26)."""

    def __init__(
        self,
        df: DataFrame,
        embedding_col: str = "embedding",
        embedder: Optional[FittedEmbedder] = None,
        dim: Optional[int] = None,
        normalized: bool = False,
        index_spec: Optional[dict] = None,
    ):
        self._df = df
        self.embedding_col = embedding_col
        self.embedder = embedder
        self.dim = dim
        self.normalized = normalized
        # ANN index artifacts (LSH planes / IVF centroids / PQ
        # codebooks) — small literals persisted in the write_vec
        # sidecar so probe sets are recomputable without caller state
        self.index_spec = index_spec

    # -- metadata propagation ------------------------------------------
    def _wrap(self, df: DataFrame) -> "VecFrame":
        return VecFrame(
            df,
            embedding_col=self.embedding_col,
            embedder=self.embedder,
            dim=self.dim,
            normalized=self.normalized,
            index_spec=self.index_spec,
        )

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def spark(self) -> SparkSession:
        return self._df.sparkSession

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def schema(self) -> T.StructType:
        return self._df.schema

    def __getattr__(self, name: str) -> Any:
        attr = getattr(self._df, name)
        if name in _WRAPPED_METHODS and callable(attr):
            def _call(*args: Any, **kwargs: Any) -> Any:
                args = tuple(a.df if isinstance(a, VecFrame) else a for a in args)
                out = attr(*args, **kwargs)
                return self._wrap(out) if isinstance(out, DataFrame) else out
            return _call
        return attr

    def __getitem__(self, item: Any) -> Any:
        out = self._df[item]
        return self._wrap(out) if isinstance(out, DataFrame) else out

    # -- reference API ---------------------------------------------------
    def _require_embedding_col(self) -> None:
        """Clean error when the embedding column was projected away —
        the wrapper keeps metadata alive across select/drop, but the
        vector verbs need the column itself (cf. [.tidyvec keeping
        attrs under subsetting, R/core.R:98-116)."""
        if self.embedding_col not in self._df.columns:
            raise ValueError(
                f"embedding column {self.embedding_col!r} is not present "
                f"in the collection (columns: {self._df.columns}); it was "
                "projected away — re-add it with vec() or keep it in "
                "select()"
            )

    def first_valid_embedding(self) -> Optional[list]:
        """First non-NULL embedding (reference R/core.R:57-62) — one
        aggregate, no full scan materialized on the driver."""
        self._require_embedding_col()
        row = self._df.select(
            F.first(F.col(self.embedding_col), ignorenulls=True).alias("e")
        ).first()
        return None if row is None else row["e"]

    def inferred_dim(self) -> Optional[int]:
        if self.dim is not None:
            return self.dim
        self._require_embedding_col()
        row = self._df.select(
            F.min(
                F.when(
                    F.col(self.embedding_col).isNotNull(),
                    F.size(F.col(self.embedding_col)),
                )
            ).alias("d")
        ).first()
        return None if row is None or row["d"] is None else int(row["d"])

    def inspect(self) -> dict[str, Any]:
        """Collection description (reference inspect_collection,
        R/core.R:375-404) — a single aggregate pass."""
        self._require_embedding_col()
        c = self.embedding_col
        row = self._df.select(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(c)).alias("n_embedded"),
            F.min(F.when(F.col(c).isNotNull(), F.size(F.col(c)))).alias("min_dim"),
            F.max(F.when(F.col(c).isNotNull(), F.size(F.col(c)))).alias("max_dim"),
        ).first()
        dim = None
        if row["min_dim"] is not None:
            if row["min_dim"] != row["max_dim"]:
                raise ValueError(
                    f"inconsistent embedding dimensions "
                    f"[{row['min_dim']}, {row['max_dim']}] — the engine "
                    "enforces a single dim (documented divergence from the "
                    "reference, which silently allows mixed lengths)"
                )
            dim = int(row["min_dim"])
        return {
            "n_rows": row["n_rows"],
            "columns": self._df.columns,
            "embedding_column": c,
            "has_embedder": self.embedder is not None,
            "n_embedded": row["n_embedded"],
            "dim": dim if dim is not None else self.dim,
        }

    def __repr__(self) -> str:  # print.tidyvec analog (R/core.R:65-95)
        has_fn = "yes" if self.embedder is not None else "no"
        return (
            f"<VecFrame embedding_col={self.embedding_col!r} "
            f"embedder={has_fn} dim={self.dim} normalized={self.normalized}>"
        )

    def show(self, n: int = 20, truncate: bool = True) -> None:
        """Print with embeddings masked as <embedding>/<NULL>
        (reference R/core.R:86-90)."""
        self._require_embedding_col()
        c = self.embedding_col
        cols = [
            F.when(F.col(c).isNull(), F.lit("<NULL>"))
            .otherwise(F.lit("<embedding>"))
            .alias(c)
            if name == c
            else F.col(name)
            for name in self._df.columns
        ]
        print(repr(self))
        self._df.select(*cols).show(n=n, truncate=truncate)

    # -- verbs (implemented in operators/, re-exported as methods) ------
    def embed(
        self,
        content_col: str,
        embedder: Optional[Union[EmbedderSpec, FittedEmbedder]] = None,
        force: bool = False,
    ) -> "VecFrame":
        from tidyvec_spark.operators.embed import embed as _embed
        return _embed(self, content_col, embedder=embedder, force=force)

    def nearest(
        self,
        query: Any,
        n: int = 5,
        as_embedding: bool = False,
        method: str = "cosine",
        min_score: float = 0.0,
        keyword_weight: float = 0.0,
        keyword_column: Optional[str] = None,
        score_col: str = "similarity",
        tiebreak: Optional[str] = None,
        round_to: Optional[int] = None,
        approx: bool = False,
        probe_hamming: Optional[int] = None,
    ) -> "VecFrame":
        from tidyvec_spark.operators.nearest import nearest as _nearest
        return _nearest(
            self, query, n=n, as_embedding=as_embedding, method=method,
            min_score=min_score, keyword_weight=keyword_weight,
            keyword_column=keyword_column, score_col=score_col,
            tiebreak=tiebreak, round_to=round_to,
            approx=approx, probe_hamming=probe_hamming,
        )

    def similarity(
        self,
        query_vec: Sequence[float],
        method: str = "cosine",
        score_col: str = "similarity",
    ) -> "VecFrame":
        """Per-row similarity against a vector — the collection x vector
        form of the documented ``%~%`` contract (reference
        man/grapes-twiddle-grapes.Rd:10-19): appends the score column,
        no threshold/sort/limit (that composition is ``nearest``).
        NULL embeddings score 0.0 (R/core.R:281-292 convention)."""
        from tidyvec_spark.functions.vector import array_lit, similarity_expr

        self._require_embedding_col()
        c = F.col(self.embedding_col)
        sim = F.when(c.isNull(), F.lit(0.0)).otherwise(
            similarity_expr(c, array_lit([float(x) for x in query_vec]), method)
        )
        return self._wrap(self._df.withColumn(score_col, sim))

    def cluster_embeddings(
        self, n_clusters: int = 5, cluster_col: str = "cluster", seed: int = 123
    ) -> "VecFrame":
        from tidyvec_spark.operators.cluster import cluster_embeddings as _ce
        return _ce(self, n_clusters=n_clusters, cluster_col=cluster_col, seed=seed)

    def write_vec(self, path: str, mode: str = "error") -> None:
        from tidyvec_spark.sources.vec_io import write_vec as _wv
        _wv(self, path, mode=mode)


def vec(
    df: Union[DataFrame, VecFrame],
    embedding_column: str = "embedding",
    embedding_fn: Optional[Union[EmbedderSpec, FittedEmbedder]] = None,
    dim: Optional[int] = None,
    normalized: bool = False,
) -> VecFrame:
    """Construct a collection (reference vec(), R/core.R:8-26).

    If the embedding column is absent it is added as a typed NULL
    column (``array<float>``), the lazily-populated state the reference
    models with a list of NULLs (R/core.R:13-16).
    """
    if isinstance(df, VecFrame):
        df = df.df
    if embedding_column not in df.columns:
        df = df.withColumn(
            embedding_column,
            F.lit(None).cast(T.ArrayType(T.FloatType())),
        )
    fitted = embedding_fn if isinstance(embedding_fn, FittedEmbedder) else embedding_fn
    return VecFrame(
        df,
        embedding_col=embedding_column,
        embedder=fitted,
        dim=dim,
        normalized=normalized,
    )
