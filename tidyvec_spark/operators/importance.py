"""Data-selection by importance resampling (DSIR-style).

Selecting pretraining data "like the target domain" without training a
model: represent every document as hashed n-gram counts, fit two tiny
bag-of-hashed-ngrams models — one on a small curated TARGET corpus
(wiki/books/eval-adjacent), one on the RAW pool — and weight each raw
document by its average log-likelihood ratio

    w(d) = (1/|f(d)|) * sum_{b in f(d)} [ln p_target(b) - ln p_raw(b)]

then keep the top-weighted (or sample proportionally). This is the
published DSIR recipe (Xie et al., "Data Selection for Language Models
via Importance Resampling", NeurIPS 2023) restricted to its hashed
n-gram feature space, which is exactly what makes it tractable at
100 TB: the "model" is ``num_buckets`` floats.

Scale shape (the whole point of the design):

- The two bucket-count passes are map-side partial aggregations into at
  most ``num_buckets`` cells — the shuffle moves O(buckets × partitions)
  rows, not O(corpus).
- The fitted log-ratio table is ``num_buckets`` doubles — it is
  collected once (driver-bounded by construction, like tf-idf's vocab
  or IVF centroids) and shipped back as a dense ARRAY LITERAL, so the
  scoring pass is a pure map-side expression: tokenize, hash, index the
  array, average. ZERO shuffle, zero Python, full codegen.
- Top-k selection is a distributed TakeOrdered, not a global sort.

Hashing is the engine-wide 60-bit md5 convention
(``functions/hashing.py``), so a DuckDB oracle reproduces every stage
bit-for-bit; the only floating-point steps are ``ln`` and one division,
the same cross-engine-stable shapes the tf-idf/BM25 oracles already
pin down.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tidyvec_spark.functions.hashing import md5_long
from tidyvec_spark.functions.text import let, tokens

__all__ = [
    "hashed_ngram_buckets",
    "bucket_counts",
    "dsir_log_ratios",
    "dsir_weights",
    "dsir_top_k",
]


def hashed_ngram_buckets(
    text_col: str, n: int = 2, num_buckets: int = 512
) -> Column:
    """array<long> of hashed n-gram bucket ids, ONE PER OCCURRENCE
    (multiplicity is the feature — DSIR models counts, not presence).

    Documents with fewer than ``n`` tokens yield an empty array.
    Map-side expression: one tokenize (let-bound), one md5 per n-gram.
    """
    nn = int(n)
    b = int(num_buckets)

    def grams(ts: Column) -> Column:
        # positions 1..len-n+1; slice(ts, i, n) then join with space —
        # same n-gram text convention as the dedup family, so oracles
        # share the shingle SQL shape. The size guard is load-bearing:
        # Spark's sequence(1, stop) auto-steps DOWN when stop < 1, so
        # an unguarded short document would gram over [1, 0, ...].
        return F.when(
            F.size(ts) >= nn,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - (nn - 1)),
                lambda i: md5_long(
                    F.concat_ws(" ", F.slice(ts, i, nn))
                ) % F.lit(b),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    return let(tokens(text_col), grams)


def bucket_counts(
    df: DataFrame, text_col: str, n: int = 2, num_buckets: int = 512
) -> DataFrame:
    """(bucket, cnt) occurrence counts over a corpus — the sufficient
    statistics of the hashed-ngram model. Explode + groupBy: partial
    aggregation map-side, ≤ ``num_buckets`` result rows."""
    return (
        df.select(
            F.explode(
                hashed_ngram_buckets(text_col, n=n, num_buckets=num_buckets)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    n: int = 2,
    num_buckets: int = 512,
) -> list[float]:
    """Dense per-bucket log-likelihood ratios, Laplace-smoothed:

        r[b] = ln((c_t(b)+1)/(N_t+B)) − ln((c_r(b)+1)/(N_r+B))

    Computed DISTRIBUTED (two bounded aggregations; the ``ln`` runs
    JVM-side so the numbers match the DuckDB oracle's ``ln`` exactly,
    like tf-idf's idf), then collected — ``num_buckets`` rows, the same
    driver-bounded collect class as tf-idf vocab / IVF centroids.
    """
    b = int(num_buckets)

    def fitted(df: DataFrame) -> dict[int, float]:
        cnts = bucket_counts(df, text_col, n=n, num_buckets=b)
        # windowed grand total over ≤B rows — keeps the ln on the JVM
        total = F.sum("cnt").over(Window.partitionBy())
        rows = cnts.select(
            "bucket",
            F.log(
                (F.col("cnt") + F.lit(1.0))
                / (total + F.lit(float(b)))
            ).alias("logp"),
            total.alias("total"),
        ).collect()
        out = {int(r["bucket"]): float(r["logp"]) for r in rows}
        n_tot = int(rows[0]["total"]) if rows else 0
        # unseen buckets share the smoothing floor ln(1/(N+B))
        import math

        floor = math.log(1.0 / (n_tot + b))
        return {bk: out.get(bk, floor) for bk in range(b)}

    lt = fitted(target)
    lr = fitted(raw)
    return [lt[i] - lr[i] for i in range(b)]


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    num_buckets: int = 512,
    round_to: Optional[int] = None,
    ratios: Optional[list[float]] = None,
) -> DataFrame:
    """(id, weight): average log-likelihood ratio per n-gram occurrence
    of each raw document under target vs raw hashed-ngram models.
    Documents with no n-grams (< n tokens) are dropped — they carry no
    evidence either way.

    The scoring pass is ZERO-shuffle map-side: the fitted table rides
    along as a ``num_buckets``-wide array literal and each document
    averages its occurrences' entries inside one fold. Pass ``ratios``
    to reuse a table fitted once (the production shape: fit on a
    sample, score everything).
    """
    if ratios is None:
        ratios = dsir_log_ratios(
            raw, target, text_col, n=n, num_buckets=num_buckets
        )
    arr = F.array(*[F.lit(float(x)) for x in ratios])
    feats = hashed_ngram_buckets(text_col, n=n, num_buckets=num_buckets)

    def score(fs: Column) -> Column:
        s = F.aggregate(
            fs,
            F.lit(0.0),
            lambda acc, bk: acc + F.element_at(arr, (bk + 1).cast("int")),
        )
        return s / F.size(fs)

    w = let(feats, lambda fs: F.when(F.size(fs) > 0, score(fs)))
    if round_to is not None:
        w = F.round(w, round_to)
    return raw.select(F.col(id_col), w.alias("weight")).filter(
        F.col("weight").isNotNull()
    )


def dsir_top_k(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 100,
    n: int = 2,
    num_buckets: int = 512,
    round_to: Optional[int] = None,
) -> DataFrame:
    """The selection step: top ``k`` raw documents by DSIR weight
    (distributed TakeOrdered; ties broken by id for determinism)."""
    w = dsir_weights(
        raw, target, text_col, id_col,
        n=n, num_buckets=num_buckets, round_to=round_to,
    )
    return w.orderBy(F.desc("weight"), F.asc(id_col)).limit(int(k))
