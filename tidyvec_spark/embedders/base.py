"""Embedder specs — the Spark replacement for the reference's closures.

The reference attaches an *R closure* to the collection and calls it in
a hand-rolled batch loop of 32 (reference R/core.R:160-224,
R/embedders.R:41-98). Closures don't survive serialization to Spark
executors, so the engine's contract is different by design:

- An :class:`EmbedderSpec` is a small, JSON-serializable description
  (kind + params). ``fit(df, content_col)`` produces a
  :class:`FittedEmbedder` holding any learned state (e.g. a TF-IDF
  vocabulary DataFrame) plus the logic to embed a column distributed
  and a single query string on the driver.
- Batching is not hand-rolled: column embedding compiles to either
  native Spark dataflow (TF-IDF) or an Arrow-batched ``pandas_udf``
  (SCALAR_ITER, so per-python-worker model state loads once) — the
  Spark analog of the reference's ``supports_batch`` attribute
  (R/embedders.R:100 et al.), which this engine makes unconditional.
"""

from __future__ import annotations

import abc
import importlib
import json
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class FittedEmbedder(abc.ABC):
    """A fitted embedder: embeds a column (distributed) or one query (driver)."""

    #: embedding dimensionality; None until known
    dim: int | None = None

    @abc.abstractmethod
    def embed_column(
        self, df: DataFrame, content_col: str, out_col: str
    ) -> DataFrame:
        """Return ``df`` with ``out_col`` = ``array<double>`` embedding."""

    @abc.abstractmethod
    def embed_query(self, text: str) -> list[float]:
        """Embed one query string driver-side (reference R/core.R:252-260)."""

    # -- persistence ------------------------------------------------------
    def spec_json(self) -> dict[str, Any]:
        """JSON-serializable description for the write_vec sidecar."""
        return {"kind": type(self).__name__}


class EmbedderSpec(abc.ABC):
    """Serializable, unfitted embedder description."""

    kind: str = "abstract"

    @abc.abstractmethod
    def fit(self, df: DataFrame, content_col: str) -> FittedEmbedder:
        ...


_REGISTRY: dict[str, Callable[..., Any]] = {}


def register_embedder(kind: str, factory: Callable[..., Any]) -> None:
    """Register a factory so specs in write_vec sidecars can rehydrate."""
    _REGISTRY[kind] = factory


def resolve_embedder(spec: dict[str, Any], spark: SparkSession) -> Any:
    """Rehydrate a fitted embedder from a sidecar spec dict."""
    kind = spec.get("kind")
    if kind not in _REGISTRY:
        raise ValueError(
            f"unknown embedder kind {kind!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[kind](spec, spark)


class CallableEmbedder(EmbedderSpec, FittedEmbedder):
    """User-supplied Python embedder — the engine's UDF surface.

    The reference lets users pass any R closure mapping text -> numeric
    vector (vignettes/getting-started.Rmd:278-298). Here the user
    supplies ``fn: list[str] -> sequence of float-vectors`` (one vector
    per input); the engine wraps it in an Arrow-batched iterator
    ``pandas_udf`` so the callable's setup cost (model load, vocab
    build) is paid once per Python worker, not per row.

    Stateless w.r.t. the corpus: ``fit`` is the identity.
    """

    kind = "callable"

    def __init__(self, fn: Callable[[list[str]], Any], dim: int | None = None):
        self.fn = fn
        self.dim = dim

    def fit(self, df: DataFrame, content_col: str) -> "CallableEmbedder":
        return self

    def embed_column(self, df: DataFrame, content_col: str, out_col: str) -> DataFrame:
        fn = self.fn

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def emb(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in it:
                vecs = fn(s.astype(object).where(s.notna(), None).tolist())
                yield pd.Series(
                    [None if v is None else [float(x) for x in v] for v in vecs]
                )

        return df.withColumn(out_col, emb(F.col(content_col)))

    def embed_query(self, text: str) -> list[float]:
        out = self.fn([text])
        vec = list(out)[0]
        return [float(x) for x in vec]

    def spec_json(self) -> dict[str, Any]:
        # A Python callable is not serializable by design — record enough
        # to rehydrate via a module path if the user provided one.
        mod = getattr(self.fn, "__module__", None)
        name = getattr(self.fn, "__qualname__", None)
        return {"kind": self.kind, "fn_module": mod, "fn_name": name, "dim": self.dim}


def _rehydrate_callable(spec: dict[str, Any], spark: SparkSession) -> CallableEmbedder:
    mod, name = spec.get("fn_module"), spec.get("fn_name")
    if not mod or not name or "<" in str(name):
        raise ValueError(
            "CallableEmbedder can only be rehydrated from an importable "
            f"module-level function; got {mod}.{name}"
        )
    fn = importlib.import_module(mod)
    for part in str(name).split("."):
        fn = getattr(fn, part)
    return CallableEmbedder(fn, dim=spec.get("dim"))


register_embedder("callable", _rehydrate_callable)


def spec_to_json_str(fitted: FittedEmbedder | None) -> str | None:
    if fitted is None:
        return None
    return json.dumps(fitted.spec_json())
