"""Per-document TF-IDF keyword extraction.

The labeling/tagging half of the lexical stack: where ``tfidf_search``
ranks documents for a query, this ranks TERMS for each document — the
standard corpus-exploration / weak-labeling primitive (topic tags,
index terms, per-source vocabulary drift). Same idf convention as
``embedders/tfidf.py``.

Scale shape:

- ONE explode → groupBy(doc, term) count: the (doc, term) table is the
  classic inverted-index build, partial-aggregated map-side, shuffled
  on the composite key (no hot key: a term's rows stay spread across
  its documents).
- Document frequencies reduce that table by term (vocabulary-sized
  output) and come back via a hash join on the term — at 100 TB this
  is the exchange you cannot avoid and the one you want (both sides
  keyed by term; AQE handles the skewed stopword keys).
- Per-document top-k is a window over the (doc, term) table keyed by
  doc — bounded by the documents' own term counts, never a global
  sort.

Determinism: scores ROUND before ranking and ties break on the term
string, so the selection is engine-portable (the DuckDB oracle replays
rank-over-rounded-score identically).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens

__all__ = ["keyword_topk"]


def keyword_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    min_df: int = 1,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf.

    tf = in-document occurrence count; idf = ln((N+1)/(df+1)) with
    df = number of documents containing the term (the smoothed
    Robertson form shared with ``embedders/tfidf.py``). ``min_df``
    drops hapax noise before ranking. Returns
    (``id_col``, term, score, kw_rank) with kw_rank 1..k.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    tt = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf = tt.groupBy("__id", "term").agg(F.count("*").alias("__tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n")).first()["n"]
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("__id").alias("__df")
    )
    scored = (
        tf.join(dfreq, "term")
        .filter(F.col("__df") >= int(min_df))
        .select(
            "__id",
            "term",
            (
                F.col("__tf").cast("double")
                * F.log(
                    (F.lit(float(n_docs) + 1.0))
                    / (F.col("__df").cast("double") + F.lit(1.0))
                )
            ).alias("__s"),
        )
    )
    if round_to is not None:
        scored = scored.withColumn("__s", F.round("__s", round_to))
    w = Window.partitionBy("__id").orderBy(F.desc("__s"), F.asc("term"))
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= int(k))
        .select(
            F.col("__id").alias(id_col),
            "term",
            F.col("__s").alias("score"),
            "kw_rank",
        )
    )
