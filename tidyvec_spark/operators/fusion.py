"""Rank fusion and chunk-embedding pooling.

Two glue operators every retrieval pipeline ends up needing:

- :func:`rrf_fuse` — Reciprocal Rank Fusion (Cormack et al., SIGIR
  2009): combine any number of ranked lists (BM25, dense ANN, recency)
  by summing 1/(k + rank). Score-scale-free — no per-system
  normalization to tune — which is why it is the default hybrid
  combiner in most search stacks. Plan shape: one window per input
  list (rank), union, one groupBy — shuffles bounded by the number of
  lists, each over candidate sets (top-N per system), not the corpus.
- :func:`mean_pool_embeddings` — collapse chunk embeddings back to one
  vector per parent document (element-wise mean). The standard
  long-document trick: embed chunks, pool to a document vector for
  coarse retrieval, keep chunk vectors for fine scoring. One
  aggregation; the element-wise sums use ``zip_with`` inside the
  aggregate buffer — JVM-side, no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "mean_pool_embeddings"]


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str,
    score_cols: Sequence[str],
    k: int = 60,
    n: int | None = 10,
    round_to: int | None = 6,
    max_list_size: int = 10_000,
) -> DataFrame:
    """Fuse ranked candidate lists into one RRF-ordered result.

    Each input frame carries (id_col, score_col); rank within a list is
    dense by (score desc, id asc) — the deterministic tie rule the
    oracle mirrors. Output: (id, rrf_score) sorted desc, top ``n``.
    A document missing from a list simply contributes nothing for that
    list (the standard RRF convention).

    RRF needs a GLOBAL rank per list, which plans as a one-partition
    window — safe only because inputs are candidate lists, not corpora.
    ``max_list_size`` enforces that: each input is truncated to its top
    ``max_list_size`` rows *in rank order* first, via orderBy+limit —
    Spark plans that as a distributed TakeOrderedAndProject (per-
    partition top-N, then merge), so a caller who passes a scored
    corpus pays a distributed top-N, never a single-task sort of
    everything, and ranks 1..max are preserved exactly.
    """
    if len(ranked) != len(score_cols):
        raise ValueError("one score_col per ranked input")
    if not ranked:
        raise ValueError("need at least one ranked input")
    if max_list_size < 1 or (n is not None and max_list_size < n):
        raise ValueError("max_list_size must be >= 1 (and >= n)")
    parts = []
    for df, sc in zip(ranked, score_cols):
        bounded = (
            df.select(F.col(id_col), F.col(sc))
            .orderBy(F.desc(sc), F.asc(id_col))
            .limit(int(max_list_size))
        )
        w = Window.orderBy(F.desc(sc), F.asc(id_col))
        parts.append(
            bounded.select(
                F.col(id_col),
                (1.0 / (F.lit(int(k)) + F.row_number().over(w))).alias("__rr"),
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    score: Column = F.sum("__rr").alias("rrf_score")
    out = unioned.groupBy(id_col).agg(score)
    if round_to is not None:
        out = out.select(
            id_col, F.round("rrf_score", round_to).alias("rrf_score")
        )
    out = out.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return out.limit(int(n)) if n is not None else out


def mean_pool_embeddings(
    df: DataFrame,
    emb_col: str,
    parent_col: str,
    out_col: str = "embedding",
    dim: int | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """(parent, mean embedding, n_chunks): element-wise mean of every
    chunk vector per parent. One shuffle on the parent key; the
    element-wise sum folds inside the aggregation buffer via
    ``aggregate(collect? no) — zip_with over an array aggregate``.

    Implementation note: Spark has no native element-wise array SUM
    aggregate, so the fold is expressed as ``aggregate(collect_list)``
    — acceptable because chunks-per-parent is small and bounded (a
    document's chunk count), never corpus-sized. For unbounded groups
    use posexplode + groupBy(parent, pos) instead.

    NULL embeddings are excluded from both the sum (``collect_list``
    drops them) AND the denominator/``n_chunks`` (``count(emb_col)``
    is the non-null count) — dividing by ``count(*)`` would silently
    bias the mean low. With ``dim`` set, rows whose vector length
    differs are dropped too (``zip_with`` over mismatched lengths
    yields NULL elements silently).
    """
    if dim is not None:
        df = df.filter(F.size(F.col(emb_col)) == int(dim))
    pooled = F.aggregate(
        F.collect_list(F.col(emb_col)),
        F.lit(None).cast("array<double>"),
        lambda acc, x: F.when(acc.isNull(), x.cast("array<double>")).otherwise(
            F.zip_with(acc, x, lambda a, b: a + b)
        ),
    )
    cnt = F.count(F.col(emb_col))  # non-null count, matching collect_list
    mean = F.transform(pooled, lambda s: s / cnt)
    if round_to is not None:
        mean = F.transform(mean, lambda v: F.round(v, round_to))
    return df.groupBy(parent_col).agg(
        mean.alias(out_col), cnt.cast("long").alias("n_chunks")
    )
