"""Corpus-level diagnostic reports (engine extension).

Aggregate views a curation team reads before committing a 100 TB
crawl to training: vocabulary growth (is the corpus still adding new
types, or is it recycling the same material — a flattening Heaps
curve is an early duplication/over-crawl smell). The reference has no
corpus-report surface (its `inspect_collection` is per-collection
metadata only, R/core.R); these compose the engine's tokenization law
(`functions/text.tokens`) with bounded aggregations.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens

__all__ = ["vocab_growth"]


def vocab_growth(
    df: DataFrame,
    text_col: str,
    id_col: str,
    id_thresholds: Sequence[int],
    round_to: int = 6,
) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: for each id threshold
    ``t``, the number of distinct token types and total token
    occurrences over the prefix ``id <= t`` — one row per threshold.

    The prefix law is defined on the ID ORDER (``id <= t``), not a
    row-number order, so no global sort of the corpus is ever taken:
    per-type first appearance is ``min(id)`` (one groupBy over the
    exploded token table), and each threshold's vocabulary is a
    conditional count over that bounded type table. Occurrences per
    threshold are conditional sums over per-document token counts —
    corpus-wide but map-side partial-aggregated to one row.

    Scale shape: ONE explode+groupBy(token) shuffle (the type table,
    bounded by vocabulary size) + ONE map-side aggregation of
    per-doc counts; thresholds are literals in both aggregations, so
    the row count out is ``len(id_thresholds)`` regardless of corpus
    size.

    Returns ``(max_doc_id, n_docs, n_tokens, vocab, ttr)`` ordered by
    ``max_doc_id``, where ``ttr = vocab / n_tokens`` (type-token
    ratio; 0.0 for an empty prefix).
    """
    ths = sorted(int(t) for t in id_thresholds)
    if not ths:
        raise ValueError("id_thresholds must be non-empty")
    tok = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    first = tok.groupBy("__tok").agg(F.min("__id").alias("__first"))
    vocab_row = first.agg(
        *[
            F.sum((F.col("__first") <= t).cast("long")).alias(f"v{i}")
            for i, t in enumerate(ths)
        ]
    )
    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.size(tokens(text_col)).cast("long").alias("__n"),
    )
    occ_row = base.agg(
        *(
            [
                F.sum(
                    F.when(F.col("__id") <= t, F.col("__n")).otherwise(0)
                ).alias(f"o{i}")
                for i, t in enumerate(ths)
            ]
            + [
                F.sum((F.col("__id") <= t).cast("long")).alias(f"d{i}")
                for i, t in enumerate(ths)
            ]
        )
    )
    both = vocab_row.crossJoin(occ_row)  # two 1-row frames
    per_t = both.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("long").alias("max_doc_id"),
                        F.col(f"d{i}").alias("n_docs"),
                        F.col(f"o{i}").alias("n_tokens"),
                        F.col(f"v{i}").alias("vocab"),
                    )
                    for i, t in enumerate(ths)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return per_t.select(
        "max_doc_id",
        "n_docs",
        "n_tokens",
        "vocab",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("vocab").cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(0.0),
            round_to,
        ).alias("ttr"),
    ).orderBy("max_doc_id")
