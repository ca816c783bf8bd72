"""Learned quality classifier (operators/classifier.py): determinism,
feature parity with the Spark expression, actual separation on a
labeled fixture, and the scoring-edge contract."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.classifier import (
    classify_quality,
    fit_logreg_py,
    fit_quality_classifier,
    hashed_buckets_py,
)

GOOD = [
    "the committee published a detailed annual report on regional trade",
    "researchers measured the effect of irrigation on crop yield over time",
    "the library catalog lists every printed edition with its year",
    "a thorough survey of the river delta appeared in the journal",
]
BAD = [
    "click here buy now cheap cheap deals click here now",
    "win win win free prize click subscribe now free",
    "cheap deals now now now click buy buy buy",
    "subscribe free win prize cheap click click win",
]


def _labeled_df(spark):
    rows = [(i, 1, t) for i, t in enumerate(GOOD)] + [
        (i + 100, 0, t) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "id bigint, label int, text string")


def test_fit_is_deterministic():
    labeled = [(1, t) for t in GOOD] + [(0, t) for t in BAD]
    a = fit_logreg_py(labeled, num_buckets=64)
    b = fit_logreg_py(labeled, num_buckets=64)
    assert a == b  # bit-identical, not approximately


def test_feature_parity_with_spark_expression(spark):
    """hashed_buckets_py must agree with importance.hashed_ngram_buckets
    occurrence-for-occurrence — that parity is what makes the oracle's
    Python-side refit produce the Spark entry's exact coefficients."""
    from tidyvec_spark.operators.importance import hashed_ngram_buckets

    from pyspark.sql import functions as FF

    texts = GOOD + BAD + ["one", "", "Tabs\tand  Spaces  here"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    expr = FF.concat(
        hashed_ngram_buckets("text", n=1, num_buckets=64),
        hashed_ngram_buckets("text", n=2, num_buckets=64),
    )
    got = [[int(x) for x in r[0]] for r in df.select(expr).collect()]
    want = [hashed_buckets_py(t, ns=(1, 2), num_buckets=64) for t in texts]
    assert got == want


def test_classifier_separates_and_scores(spark):
    df = _labeled_df(spark)
    w0, w = fit_quality_classifier(df, "text", "label", "id", num_buckets=64)
    scored = {
        r["id"]: (r["quality_prob"], r["keep"])
        for r in classify_quality(
            df, "text", "id", w0, w, round_to=6
        ).collect()
    }
    for i in range(len(GOOD)):
        assert scored[i][0] > 0.5 and scored[i][1] == 1, scored[i]
    for i in range(len(BAD)):
        assert scored[i + 100][0] < 0.5 and scored[i + 100][1] == 0


def test_classifier_generalizes_to_unseen(spark):
    df = _labeled_df(spark)
    w0, w = fit_quality_classifier(df, "text", "label", "id", num_buckets=64)
    unseen = spark.createDataFrame(
        [
            (1, "the annual report lists regional crop yield over time"),
            (2, "free free prize click now buy cheap subscribe win"),
        ],
        "id bigint, text string",
    )
    got = {
        r["id"]: r["keep"]
        for r in classify_quality(unseen, "text", "id", w0, w).collect()
    }
    assert got == {1: 1, 2: 0}


def test_classify_drops_docs_without_ngrams(spark):
    df = _labeled_df(spark)
    w0, w = fit_quality_classifier(df, "text", "label", "id", num_buckets=64)
    edge = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")],
        "id bigint, text string",
    )
    got = [r["id"] for r in classify_quality(edge, "text", "id", w0, w).collect()]
    assert sorted(got) == [1, 3]  # only the empty doc has zero features


def test_fit_error_cases(spark):
    with pytest.raises(ValueError):
        fit_logreg_py([(1, "all same class"), (1, "still one class")])
    with pytest.raises(ValueError):
        fit_logreg_py([(1, ""), (0, "  ")])  # no featurizable docs


def test_scoring_is_zero_shuffle(spark):
    """The 100 TB contract: scoring is a map-side array-literal pass —
    no exchange in the plan."""
    from tidyvec_spark import plans as P

    df = _labeled_df(spark)
    w0, w = fit_quality_classifier(df, "text", "label", "id", num_buckets=64)
    out = classify_quality(df, "text", "id", w0, w)
    assert P.num_shuffles(out) == 0


def test_ml_fit_agrees_with_driver_fit(spark):
    """fit_quality_classifier_ml (the pyspark.ml LBFGS seam for
    labeled sets past the driver bound): same feature law, same
    (intercept, weights) shape, and ranking agreement with the
    deterministic driver fit — AUC on the fixture within tolerance
    and identical keep decisions through the SAME classify_quality
    scoring surface. Objectives differ in constants, so coefficients
    are close, never bit-equal (declared-ML, like kmeans)."""
    from tidyvec_spark.operators.classifier import (
        fit_quality_classifier_ml,
    )
    from tidyvec_spark.operators.evaluation import auc_score

    df = _labeled_df(spark)
    w0_d, w_d = fit_quality_classifier(
        df, "text", "label", "id", num_buckets=64
    )
    w0_m, w_m = fit_quality_classifier_ml(
        df, "text", "label", num_buckets=64
    )
    assert len(w_m) == len(w_d) == 64

    def auc_of(w0, w):
        scored = classify_quality(df, "text", "id", w0, w).join(
            df.select("id", "label"), "id"
        )
        return auc_score(scored, "quality_prob", "label").first()["auc"]

    auc_d, auc_m = auc_of(w0_d, w_d), auc_of(w0_m, w_m)
    assert auc_d == 1.0  # the fixture is separable
    assert abs(auc_m - auc_d) <= 0.05
    # identical keep decisions on the clearly-separable fixture
    keep_d = {r["id"]: r["keep"]
              for r in classify_quality(df, "text", "id", w0_d, w_d).collect()}
    keep_m = {r["id"]: r["keep"]
              for r in classify_quality(df, "text", "id", w0_m, w_m).collect()}
    assert keep_m == keep_d


def test_entry_ml_agreement_within_tolerance(spark):
    """The driver-registry seam: docs_clf_ml_agreement must emit ONE
    row whose |AUC(driver fit) − AUC(LBFGS fit)| on the fixture
    holdout stays within 0.02 — the declared-ML agreement bound the
    rows-only driver row cannot itself enforce."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    df = entry.queries()["docs_clf_ml_agreement"](
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    # release the entry's persisted frames: the session is shared and
    # a leaked cache makes Spark substitute InMemoryRelation into
    # matching subtrees of LATER tests' plans (breaking plan pins)
    from tidyvec_spark.operators.dedup import release

    release(df)
    assert len(rows) == 1
    r = rows[0]
    assert r["auc_driver"] is not None and r["auc_ml"] is not None
    assert r["auc_abs_diff"] <= 0.02, r


def test_fit_from_jvm_buckets_bit_identical_to_text_path(spark):
    """fit_quality_classifier now collects JVM-hashed bucket arrays
    (executor-side featurization, r14) instead of raw text; binary
    presence features depend only on each doc's bucket SET, so the
    coefficients must stay bit-identical to the driver-hashed text
    path — the contract that keeps every oracle's literal weights
    valid."""
    df = _labeled_df(spark)
    w0_new, w_new = fit_quality_classifier(
        df, "text", "label", "id", num_buckets=64
    )
    rows = (
        df.select("id", F.col("label").cast("int"), "text")
        .orderBy(F.asc("id"))
        .collect()
    )
    labeled = [(int(r[1]), r[2]) for r in rows if r[1] is not None]
    w0_old, w_old = fit_logreg_py(labeled, num_buckets=64)
    assert w0_new == w0_old
    assert w_new == w_old


def test_classify_quality_carry_passthrough(spark):
    """carry= appends input columns unchanged after (id, prob, keep) —
    the one-scan score+label shape the clf entries use (r14)."""
    df = _labeled_df(spark)
    w0, w = fit_quality_classifier(df, "text", "label", "id", num_buckets=64)
    out = classify_quality(
        df, "text", "id", w0, w, round_to=6, carry=["label"]
    )
    assert out.columns == ["id", "quality_prob", "keep", "label"]
    got = {r["id"]: r["label"] for r in out.collect()}
    want = {r["id"]: r["label"] for r in df.collect()}
    assert got == want
