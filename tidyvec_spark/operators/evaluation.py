"""Retrieval-quality evaluation: recall of approximate search against
exact ground truth.

Every ANN knob in the engine (LSH planes / probe_hamming, IVF nprobe,
PQ codebook size, binary-quantization prefilter depth) trades recall
for scan cost; tuning them at 100 TB needs recall measured ON the
actual corpus, not assumed from the literature. These operators
compare two top-k result sets per query — both distributed frames —
so the evaluation itself scales with the query batch, not the corpus.

No reference counterpart (the reference's search is always exact).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["topk_recall", "mean_recall"]


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str,
    id_col: str,
    k: int,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Per-query recall@k: |approx ∩ exact| / k.

    ``approx`` and ``exact`` are (query, result-id) frames — extra
    columns are ignored. Every query present in ``exact`` gets a row;
    queries the approximate index returned nothing for score 0.0.

    Shape: one equi-join on (query, id) + one per-query hash-agg —
    both sides are k×|queries| rows, so this is negligible next to
    the searches being evaluated.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    a = approx.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    ).distinct()
    e = exact.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    ).distinct()
    hits = (
        a.join(e, ["__q", "__i"])
        .groupBy("__q")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    queries = e.select("__q").distinct()
    rec = F.col("n_hits").cast("double") / F.lit(float(k))
    if round_to is not None:
        rec = F.round(rec, round_to)
    return (
        queries.join(hits, "__q", "left")
        .fillna({"n_hits": 0})
        .select(
            F.col("__q").alias(query_col),
            F.col("n_hits"),
            rec.alias("recall"),
        )
    )


def mean_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str,
    id_col: str,
    k: int,
    round_to: Optional[int] = None,
) -> float:
    """Scalar mean recall@k over all queries (driver-side single
    value — the tuning-loop objective)."""
    per_q = topk_recall(approx, exact, query_col, id_col, k)
    row = per_q.agg(F.avg("recall").alias("m")).first()
    m = float(row["m"]) if row["m"] is not None else 0.0
    return round(m, round_to) if round_to is not None else m
