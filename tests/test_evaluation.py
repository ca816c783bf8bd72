"""Recall evaluation operators: hand-computable overlap cases and the
real LSH-vs-exact measurement."""

import pytest

from tidyvec_spark.operators.evaluation import mean_recall, topk_recall


def test_topk_recall_hand_case(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)], "q bigint, i bigint"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99), (2, 77), (2, 78), (2, 79)], "q bigint, i bigint"
    )
    got = {r["q"]: (r["n_hits"], r["recall"]) for r in
           topk_recall(approx, exact, "q", "i", k=3).collect()}
    assert got == {1: (2, 2 / 3), 2: (0, 0.0)}
    assert mean_recall(approx, exact, "q", "i", k=3) == pytest.approx(1 / 3)


def test_topk_recall_missing_query_scores_zero(spark):
    exact = spark.createDataFrame([(1, 10), (2, 20)], "q bigint, i bigint")
    approx = spark.createDataFrame([(1, 10)], "q bigint, i bigint")
    got = {r["q"]: r["recall"] for r in
           topk_recall(approx, exact, "q", "i", k=1).collect()}
    assert got == {1: 1.0, 2: 0.0}
    with pytest.raises(ValueError):
        topk_recall(approx, exact, "q", "i", k=0)


def test_lsh_recall_on_fixture(spark, sf_dir):
    import __spark_entry__ as entry

    qs = entry.queries()
    rec = qs["ann_recall_lsh"](spark, sf_dir).collect()
    assert len(rec) == 5
    vals = [r["recall"] for r in rec]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # the fixture embeddings are near-uniform random, so 8-bit LSH
    # recall is legitimately LOW here — the point of the operator is
    # to MEASURE that instead of assuming literature numbers; assert
    # only consistency with the exact self-hit structure
    assert {r["qid"] for r in rec} == {0, 1, 2, 3, 4}
