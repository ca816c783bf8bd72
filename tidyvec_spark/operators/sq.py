"""Scalar (int8) quantization for embedding columns.

The cheapest compression in the ANN toolbox: per-dimension min/max over
the corpus, then each float becomes one byte — an 8× narrower scan than
float64 (4× vs float32) with ~no recall loss at 8 bits, and unlike PQ
there is no codebook training. The standard first step before
IVF/PQ-grade compression (FAISS ``SQ8``; Guo et al. 2020 §3.1).

Spark shapes:

- :func:`sq_fit` — per-dimension (min, max): one aggregation with 2·d
  scalar aggregates (d ≤ a few thousand — the result is tiny and
  drives literal-folded encode/search expressions).
- :func:`sq_encode` — pure projection: two ``zip_with`` passes against
  literal arrays; zero shuffle, zero Python.
- :func:`sq_topk` — asymmetric distance over the CODE column only
  (query stays float): reconstruct x̂ = min + code·step inside the
  expression; the float embedding column is pruned from the scan
  exactly like the PQ ADC path. Ends in TakeOrderedAndProject.

Rounding contract: ``code = floor((x − min)·inv_step + 0.5)`` — spelled
as floor(+0.5), NOT round(), so Spark and the DuckDB oracle agree
bit-for-bit on ties regardless of each engine's round() convention.
Degenerate dimensions (max == min) encode to 0 and reconstruct to min.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.functions.vector import array_lit

__all__ = ["sq_fit", "sq_encode", "sq_topk"]


def sq_fit(df: DataFrame, emb_col: str, dim: int) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxs) over the corpus — ONE aggregation
    (2·d scalar min/max aggs, map-side partials), tiny driver result."""
    aggs = []
    for j in range(int(dim)):
        e = F.element_at(F.col(emb_col), j + 1)
        aggs.append(F.min(e).alias(f"mn{j}"))
        aggs.append(F.max(e).alias(f"mx{j}"))
    row = df.agg(*aggs).first()
    mins = [float(row[f"mn{j}"]) for j in range(dim)]
    maxs = [float(row[f"mx{j}"]) for j in range(dim)]
    return mins, maxs


def _steps(mins: Sequence[float], maxs: Sequence[float], bits: int):
    levels = (1 << int(bits)) - 1
    steps, invs = [], []
    for mn, mx in zip(mins, maxs):
        rng = float(mx) - float(mn)
        steps.append(rng / levels if rng > 0 else 0.0)
        invs.append(levels / rng if rng > 0 else 0.0)
    return steps, invs


def sq_encode(
    df: DataFrame,
    emb_col: str,
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 8,
    code_col: str = "sq_code",
) -> DataFrame:
    """array<float> → array<int> codes in [0, 2^bits): a pure
    projection (two zip_with passes against literal min / inv-step
    arrays), so encoding 100 TB is exactly one scan. Out-of-range
    values (streaming appends beyond the fitted min/max) clamp."""
    levels = (1 << int(bits)) - 1
    _, invs = _steps(mins, maxs, bits)
    shifted = F.zip_with(
        F.col(emb_col), array_lit(mins), lambda x, m: x - m
    )
    code = F.zip_with(
        shifted,
        array_lit(invs),
        lambda y, s: F.greatest(
            F.lit(0),
            F.least(F.lit(levels), F.floor(y * s + F.lit(0.5)).cast("int")),
        ),
    )
    return df.withColumn(code_col, code)


def sq_topk(
    codes: DataFrame,
    id_col: str,
    query_vec: Sequence[float],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 8,
    k: int = 10,
    code_col: str = "sq_code",
    round_to: int | None = 6,
    dist_col: str = "sq_dist",
) -> DataFrame:
    """Approximate L2 top-k over the int codes only: per dimension the
    reconstruction x̂ = min + code·step folds the query into literal
    a = q − min, so the row-side work is Σ (a_i − code_i·step_i)² —
    two zip_with + one aggregate, float column never read. Returns
    (id, sq_dist) ascending, id-asc ties."""
    steps, _ = _steps(mins, maxs, bits)
    a = [float(q) - float(m) for q, m in zip(query_vec, mins)]
    recon = F.zip_with(
        F.col(code_col), array_lit(steps), lambda c, s: c.cast("double") * s
    )
    diffs = F.zip_with(recon, array_lit(a), lambda r, av: (av - r) * (av - r))
    dist = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        codes.withColumn(dist_col, dist)
        .orderBy(F.asc(dist_col), F.asc(id_col))
        .limit(int(k))
        .select(id_col, dist_col)
    )
