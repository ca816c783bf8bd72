"""Learned quality classifier over hashed n-gram features.

CCNet pairs its LM-perplexity signal with a learned fastText-style
quality classifier (Wenzek et al. 2020; Joulin et al. 2017 "Bag of
Tricks"); GPT-3/PaLM-era pipelines filter the crawl with a logistic
model over hashed text features trained to separate a curated corpus
from raw crawl. This module is that operator for the engine, next to
the rules (``functions/quality.py``), the LM (``operators/lm.py``) and
DSIR (``operators/importance.py``).

Shape (what matters at 100 TB):

- FEATURES are hashed word-n-gram buckets — the same 60-bit-md5-mod-B
  convention as DSIR (``importance.hashed_ngram_buckets``), a pure
  map-side expression with an exact DuckDB/Python twin.
- SCORING is a zero-shuffle map pass: the trained model is
  ``num_buckets`` doubles + 1 intercept shipped as an array literal,
  each document folds its occurrence list through the array and a
  sigmoid — whole-stage codegen, no Python, no shuffle, the
  ``operators/importance.py`` scoring pattern exactly.
- TRAINING is deterministic full-batch logistic regression (fixed
  iteration count, fixed learning rate, float64 numpy) on the LABELED
  split, which is collected to the driver. That is a deliberate scale
  judgment, not a shortcut: labeled quality data is expensive and
  bounded (CCNet's classifier trains on Wikipedia-vs-crawl samples,
  fastText quality models train single-node in minutes) while the
  corpus to SCORE is the 100 TB side. A billion-row labeled set would
  want ``pyspark.ml``'s LBFGS instead; the scoring surface here would
  not change, only where the coefficient array comes from.
- DETERMINISM is the correctness contract: same labeled rows (sorted
  by id) -> bit-identical coefficients on every run and every engine,
  so the DuckDB oracle replays the exact dot-product + sigmoid with
  the same literals (``fit_logreg_py`` is pure Python/numpy and is
  called by the Spark entry AND the oracle builder).

Reference parity note: the reference has no learned classifier (its
quality surface is rule-based); this extends the engine's curation
stack per the published CCNet recipe.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import let
from tidyvec_spark.operators.importance import hashed_ngram_buckets

__all__ = [
    "hashed_buckets_py",
    "fit_logreg_py",
    "fit_logreg_buckets_py",
    "fit_quality_classifier",
    "fit_quality_classifier_ml",
    "classify_quality",
]


def _tokens_py(text: str) -> list[str]:
    """Python twin of ``functions/text.tokens``: lowercase, split on
    whitespace, drop empties."""
    return [t for t in str(text).lower().split() if t]


def hashed_buckets_py(
    text: str,
    ns: Sequence[int] = (1, 2),
    num_buckets: int = 256,
) -> list[int]:
    """Python twin of the Spark feature expression — one bucket id per
    n-gram OCCURRENCE for each n in ``ns`` (unigrams + bigrams by
    default, the fastText "bag of tricks" feature set), concatenated
    in ``ns`` order. Same 60-bit md5 convention
    (``int(md5_hex[:15], 16) % B``), so features agree bit-for-bit
    with the Spark expression and the DuckDB oracle."""
    ts = _tokens_py(text)
    b = int(num_buckets)
    out: list[int] = []
    for n in ns:
        nn = int(n)
        if len(ts) < nn:
            continue
        out.extend(
            int(
                hashlib.md5(
                    " ".join(ts[i : i + nn]).encode("utf-8")
                ).hexdigest()[:15],
                16,
            )
            % b
            for i in range(len(ts) - nn + 1)
        )
    return out


def fit_logreg_buckets_py(
    labeled: Sequence[tuple[int, Sequence[int]]],
    num_buckets: int = 256,
    iters: int = 64,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> tuple[float, list[float]]:
    """The numpy core of :func:`fit_logreg_py`, taking PRE-HASHED
    per-document bucket lists instead of raw text. Binary presence
    features only consult the SET of buckets per document, so any
    feature producer that agrees with :func:`hashed_buckets_py` on
    the bucket set (the Spark expression does, bit-for-bit) yields
    the identical X matrix and therefore bit-identical coefficients.

    Documents with an empty bucket list carry no evidence and are
    skipped, same as the text path. Returns (intercept, weights).
    """
    import numpy as np

    b = int(num_buckets)
    xs, ys = [], []
    for label, occ in labeled:
        if not occ:
            continue
        v = np.zeros(b, dtype=np.float64)
        for bk in occ:
            v[bk] = 1.0
        xs.append(v)
        ys.append(float(label))
    if not xs:
        raise ValueError("no trainable documents (all below n tokens)")
    X = np.stack(xs)
    y = np.asarray(ys, dtype=np.float64)
    if y.min() == y.max():
        raise ValueError("training labels are all one class")
    w = np.zeros(b, dtype=np.float64)
    w0 = 0.0
    N = float(len(y))
    for _ in range(int(iters)):
        z = X @ w + w0
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        w -= lr * (X.T @ err / N + l2 * w)
        w0 -= lr * float(err.sum() / N)
    return float(w0), [float(x) for x in w]


def fit_logreg_py(
    labeled: Sequence[tuple[int, str]],
    ns: Sequence[int] = (1, 2),
    num_buckets: int = 256,
    iters: int = 64,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> tuple[float, list[float]]:
    """Deterministic full-batch logistic regression on BINARY
    presence features: x[b] = 1 iff any n-gram of the document hashes
    to bucket b (bounded [0,1] per coordinate, so a fixed learning
    rate is well-behaved). Presence beats normalized counts for
    sparse lexical signals — a single decisive token is not diluted
    by document length.

    ``labeled`` must arrive in a deterministic order (sort by id
    upstream): fixed order + fixed float64 ops + fixed iteration count
    means the same inputs produce bit-identical coefficients anywhere
    — that reproducibility is what lets a SQL oracle replay the
    scoring with literal weights.

    Documents with no n-grams carry no evidence and are skipped.
    Returns (intercept, weights[num_buckets]).
    """
    b = int(num_buckets)
    occs = [
        (label, hashed_buckets_py(text, ns=ns, num_buckets=b))
        for label, text in labeled
    ]
    return fit_logreg_buckets_py(
        occs, num_buckets=b, iters=iters, lr=lr, l2=l2
    )


def fit_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    ns: Sequence[int] = (1, 2),
    num_buckets: int = 256,
    iters: int = 64,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> tuple[float, list[float]]:
    """Fit from a LABELED Spark frame: collect (label, buckets) sorted
    by ``id_col`` — the labeled split is driver-bounded by its nature
    (see module docstring) — and run :func:`fit_logreg_buckets_py`.

    The n-gram hashing runs EXECUTOR-SIDE as the same map-side bucket
    expression scoring uses (``importance.hashed_ngram_buckets``, the
    documented bit-for-bit twin of :func:`hashed_buckets_py`), so the
    driver's only work is the bounded numpy fit — it no longer md5s
    every n-gram of the labeled split in single-threaded Python, and
    the collect ships small int arrays instead of document text.
    Binary presence features depend only on each document's bucket
    SET, so the X matrix — and therefore the coefficients — are
    bit-identical to the text-collect path (pinned by pytest).
    Returns (intercept, weights) ready for :func:`classify_quality`."""
    b = int(num_buckets)
    per_n = [
        hashed_ngram_buckets(text_col, n=int(n), num_buckets=b) for n in ns
    ]
    feats = per_n[0] if len(per_n) == 1 else F.concat(*per_n)
    rows = (
        df.select(
            F.col(id_col),
            F.col(label_col).cast("int"),
            feats.alias("__bs"),
        )
        .orderBy(F.asc(id_col))
        .collect()
    )
    labeled = [(int(r[1]), r[2]) for r in rows if r[1] is not None]
    return fit_logreg_buckets_py(
        labeled, num_buckets=b, iters=iters, lr=lr, l2=l2
    )


def fit_quality_classifier_ml(
    df: DataFrame,
    text_col: str,
    label_col: str,
    ns: Sequence[int] = (1, 2),
    num_buckets: int = 256,
    iters: int = 64,
    l2: float = 1e-3,
) -> tuple[float, list[float]]:
    """The DISTRIBUTED-training seam: ``pyspark.ml``'s LBFGS logistic
    regression over the SAME binary-presence hashed features as
    :func:`fit_quality_classifier` — for labeled sets past the driver
    bound (the deterministic driver fit stays the oracle-checkable
    default; this path trades bit-reproducibility for scale, like
    ``cluster_embeddings`` does for k-means). The labeled frame never
    reaches the driver: features are the map-side bucket expression
    densified per row, and LBFGS aggregates gradients executor-side.

    Returns the same (intercept, weights[num_buckets]) shape, so
    :func:`classify_quality`'s zero-shuffle scoring surface is
    IDENTICAL for both fits — only where the coefficient array comes
    from changes, exactly the module-docstring promise. Agreement
    with the driver fit is pinned by an AUC-tolerance pytest (the
    objectives differ in constants, so coefficients are close, not
    bit-equal)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    b = int(num_buckets)
    per_n = [
        hashed_ngram_buckets(text_col, n=int(n), num_buckets=b) for n in ns
    ]
    feats = per_n[0] if len(per_n) == 1 else F.concat(*per_n)
    dense = let(
        feats,
        lambda fs: F.when(
            F.size(fs) > 0,
            F.transform(
                F.sequence(F.lit(0), F.lit(b - 1)),
                lambda i: F.when(
                    F.array_contains(fs, i.cast("long")),
                    F.lit(1.0),
                ).otherwise(F.lit(0.0)),
            ),
        ),
    )
    train = (
        df.select(
            F.col(label_col).cast("double").alias("label"),
            dense.alias("__x"),
        )
        .filter(F.col("label").isNotNull() & F.col("__x").isNotNull())
        .withColumn("features", array_to_vector(F.col("__x")))
    )
    lr = LogisticRegression(
        maxIter=int(iters),
        regParam=float(l2),
        elasticNetParam=0.0,
        standardization=False,
        fitIntercept=True,
    )
    model = lr.fit(train)
    return float(model.intercept), [float(x) for x in model.coefficients]


def classify_quality(
    df: DataFrame,
    text_col: str,
    id_col: str,
    intercept: float,
    weights: Sequence[float],
    ns: Sequence[int] = (1, 2),
    threshold: float = 0.5,
    round_to: Optional[int] = None,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Score every document with the trained model — ZERO-shuffle
    map-side pass: ``p = sigmoid(w0 + sum_b weights[b])`` over the
    document's DISTINCT buckets (binary presence features, matching
    :func:`fit_logreg_py`), folded in SORTED bucket order so the float
    sum is engine-portable (DuckDB folds
    ``list_sort(list_distinct(...))`` identically). Documents with no
    n-grams are dropped (no evidence).

    Returns (``id_col``, quality_prob, keep) — ``keep`` thresholds the
    RAW probability (round-to is presentation only). ``carry`` names
    extra input columns to pass through unchanged, so a caller that
    needs the score NEXT TO another map-side derivation of the same
    row (a label, a length) gets both in ONE scan instead of scoring
    and re-deriving on two scans joined on ``id_col``.
    """
    b = len(weights)
    arr = F.array(*[F.lit(float(x)) for x in weights])
    per_n = [
        hashed_ngram_buckets(text_col, n=int(n), num_buckets=b) for n in ns
    ]
    feats = per_n[0] if len(per_n) == 1 else F.concat(*per_n)

    def prob(fs: Column) -> Column:
        s = F.aggregate(
            F.array_sort(F.array_distinct(fs)),
            F.lit(0.0),
            lambda acc, bk: acc + F.element_at(arr, (bk + 1).cast("int")),
        )
        z = F.lit(float(intercept)) + s
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    p = let(feats, lambda fs: F.when(F.size(fs) > 0, prob(fs)))
    keep = (p >= F.lit(float(threshold))).cast("int")
    if round_to is not None:
        p_out = F.round(p, round_to)
    else:
        p_out = p
    return (
        df.select(
            F.col(id_col),
            p_out.alias("quality_prob"),
            keep.alias("keep"),
            *[F.col(c) for c in carry],
        )
        .filter(F.col("quality_prob").isNotNull())
    )
