"""Persisted inverted index: build once, query by posting lists.

:func:`~tidyvec_spark.operators.search.bm25_topk` scores a query with
ONE corpus scan — the right plan when the corpus is already in memory
or the query batch is large. At 100 TB with interactive queries the
scan itself is the bottleneck: every query re-reads every document.
The classic fix is the inverted index — persist (term, doc, tf)
postings ONCE, then each query touches only the postings of its own
terms.

Spark-first layout (no custom file format, no serving server):

- **Postings** are a parquet table ``(term, id, tf, dl)`` written
  ``partitionBy(term_bucket)`` where ``term_bucket =
  pmod(xxhash64(term), n_buckets)``. A query computes the same hash
  for its Q terms driver-side and filters ``term_bucket IN (...) AND
  term IN (...)`` — the bucket predicate prunes directories (only
  Q/n_buckets of the index is listed), the term predicate is pushed
  into the parquet row-group scan. Query I/O is O(df of the query's
  terms), independent of corpus size.
- **Stats** ride along as a tiny parquet sidecar: one ``(term, df)``
  row per distinct term plus a single ``(__N__, n_docs)`` /
  ``(__AVGDL__, …)`` pair encoded in the same two-column shape, so the
  whole index is plain parquet — readable by any engine, mergeable by
  union + groupBy-sum re-aggregation.

Scoring replays the exact BM25 formula of ``bm25_topk`` (Lucene idf),
with per-term conditional sums in sorted-term expression order so the
floating-point summation order — and therefore the score — is
bit-identical to the full-scan path. ``test_index.py`` pins that
equivalence.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidyvec_spark.embedders.tfidf import tokens_expr
from tidyvec_spark.operators.search import _query_terms

__all__ = [
    "build_postings",
    "write_inverted_index",
    "bm25_topk_indexed",
]

_N_KEY = "__N__"
_AVGDL_KEY = "__AVGDL__"


def build_postings(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Postings table — (term, id, tf, dl), one row per distinct
    (document, term).

    One explode + one groupBy on (doc, term): partial aggregation
    combines map-side, so the shuffle carries distinct (doc, term)
    rows, not raw tokens. ``dl`` (document length) is denormalized
    onto every posting — the standard trade (a long per row) that
    makes scoring a pure scan of the matched postings with no join
    back to a doc-length table.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(content_col)).alias("term"),
    )
    return (
        toks.groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            # dl = Σ tf over the doc — an unordered window on id; one
            # exchange over the distinct (doc, term) rows, which the
            # (id, term) groupBy above already shrank from raw tokens
            "dl",
            F.sum("tf").over(Window.partitionBy("id")),
        )
    )


def write_inverted_index(
    df: DataFrame,
    content_col: str,
    id_col: str,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Build and persist the index at ``path``: ``postings/``
    (partitioned by term_bucket) + ``stats/`` (term→df sidecar with
    the N / avgdl scalars folded in as reserved keys).

    ``n_buckets`` bounds directory fan-out; queries prune to
    Q/n_buckets of it. Raise it for huge vocabularies (it only adds
    directories, never shuffles more).
    """
    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    postings = build_postings(df, content_col, id_col).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(int(n_buckets)))
    )
    postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )
    built = postings.sparkSession.read.parquet(f"{path}/postings")
    per_doc = built.select("id", "dl").groupBy("id").agg(F.first("dl").alias("dl"))
    scalars = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    stats = (
        built.groupBy("term")
        .agg(F.countDistinct("id").cast("double").alias("value"))
        .unionByName(
            scalars.selectExpr(
                f"'{_N_KEY}' AS term", "n AS value"
            ).unionByName(
                scalars.selectExpr(f"'{_AVGDL_KEY}' AS term", "avgdl AS value")
            )
        )
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    query: str,
    n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_score: float = 0.0,
    n_buckets: int = 64,
    round_to: Optional[int] = None,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Top-n by BM25 against a persisted index — identical scores to
    :func:`~tidyvec_spark.operators.search.bm25_topk` on the indexed
    corpus, but the scan touches only the query terms' postings.

    Driver-side work is Q+2 numbers (the query terms' df rows plus the
    N/avgdl scalars — a broadcast-sized fetch, same as ``bm25_stats``).
    The postings read carries BOTH pushdowns: ``term_bucket IN``
    prunes partition directories before listing, ``term IN`` prunes
    row groups inside them. Scoring is one groupBy(id) with per-term
    conditional sums in sorted-term order (deterministic fp
    summation), then top-n.
    """
    terms = _query_terms(query)
    stats = spark.read.parquet(f"{path}/stats")
    rows = stats.filter(
        F.col("term").isin(terms + [_N_KEY, _AVGDL_KEY])
    ).collect()
    by_term = {r["term"]: float(r["value"]) for r in rows}
    if _N_KEY not in by_term or _AVGDL_KEY not in by_term:
        raise ValueError(f"no index stats at {path}/stats")
    n_docs, avgdl = by_term[_N_KEY], by_term[_AVGDL_KEY]
    idf = {
        t: math.log(1.0 + (n_docs - by_term.get(t, 0.0) + 0.5) / (by_term.get(t, 0.0) + 0.5))
        for t in terms
    }

    # same-hash bucket pruning: pmod(xxhash64) evaluated on a literal
    # frame driver-side so the Python literal matches the JVM hash
    buckets = sorted(
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(int(n_buckets))).alias("b"))
        .distinct()
        .collect()
    )
    matched = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    per_doc = matched.groupBy("id").agg(
        F.first("dl").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0)).alias(
                f"_tc{i}"
            )
            for i, t in enumerate(terms)
        ],
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for i, t in enumerate(terms):
        tc = F.col(f"_tc{i}").cast("double")
        part = F.lit(idf[t]) * tc * F.lit(k1 + 1.0) / (tc + norm)
        score = part if score is None else score + part
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        per_doc.select(F.col("id").alias(id_col), score.alias(score_col))
        .filter(F.col(score_col) >= F.lit(float(min_score)))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(int(n))
    )
