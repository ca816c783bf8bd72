"""Sampling operators: budget invariants, hash determinism, plan shapes."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.functions import text as X
from tidyvec_spark.operators.sampling import (
    budget_sample,
    hash_stratified_sample,
    hash_unit,
)

BUDGET = 2000


@pytest.fixture(scope="module")
def scored(documents):
    return documents.select(
        "doc_id", "lang",
        X.token_count("text").alias("n_tokens"),
        F.round(X.quality_score("text"), 6).alias("q"),
    )


def test_budget_never_exceeded_per_stratum(scored):
    out = budget_sample(
        scored, "n_tokens", BUDGET, strata="lang",
        order_by=[F.desc("q"), F.asc("doc_id")],
    )
    sums = out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    assert sums and all(r["s"] <= BUDGET for r in sums)


def test_budget_selection_is_greedy_prefix(scored):
    """The kept set must equal a brute-force greedy walk of each
    stratum in (q desc, doc_id) order."""
    out = budget_sample(
        scored, "n_tokens", BUDGET, strata="lang",
        order_by=[F.desc("q"), F.asc("doc_id")],
    )
    got = {int(r["doc_id"]) for r in out.collect()}
    rows = scored.collect()
    exp = set()
    for lang in {r["lang"] for r in rows}:
        cum = 0
        for r in sorted(
            (r for r in rows if r["lang"] == lang),
            key=lambda r: (-r["q"], r["doc_id"]),
        ):
            cum += r["n_tokens"]
            if cum <= BUDGET:
                exp.add(int(r["doc_id"]))
            else:
                break  # greedy prefix: stop at first overflow
    assert got == exp


def test_budget_requires_order(scored):
    with pytest.raises(ValueError):
        budget_sample(scored, "n_tokens", BUDGET, strata="lang")


def test_hash_sample_deterministic_and_nested(documents):
    a1 = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.25, salt="s",
        ).collect()
    }
    a2 = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.25, salt="s",
        ).collect()
    }
    b = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.5, salt="s",
        ).collect()
    }
    assert a1 == a2          # rerun-stable
    assert a1 <= b           # same salt → nested selections
    n = documents.count()
    assert 0.1 * n < len(a1) < 0.4 * n   # roughly the asked fraction
    assert 0.35 * n < len(b) < 0.65 * n


def test_hash_sample_salt_decorrelates(documents):
    a = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.5, salt="s1",
        ).collect()
    }
    b = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.5, salt="s2",
        ).collect()
    }
    assert a != b
    # independent coins: overlap near |a|·|b|/n, far from min(|a|,|b|)
    n = documents.count()
    assert len(a & b) < 0.8 * min(len(a), len(b))


def test_hash_unit_range(documents):
    mm = documents.select(hash_unit("doc_id").alias("u")).agg(
        F.min("u"), F.max("u")
    ).first()
    assert 0.0 <= mm[0] and mm[1] < 1.0


def test_hash_sample_is_map_side_only(documents):
    df = hash_stratified_sample(
        documents, "doc_id", {"en": 0.5}, "lang", default_fraction=0.1
    )
    assert P.num_shuffles(df) == 0


def test_budget_sample_single_shuffle(scored):
    df = budget_sample(
        scored, "n_tokens", BUDGET, strata="lang",
        order_by=[F.desc("q"), F.asc("doc_id")],
    )
    assert P.num_shuffles(df) == 1
