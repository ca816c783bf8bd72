"""keyword_topk (operators/keywords.py) and the incremental manifest
combine (sources/maintenance.py::combine_manifests)."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.keywords import keyword_topk


def test_keyword_topk_ranks_distinctive_terms(spark):
    """Terms concentrated in one doc outrank corpus-wide terms: 'the'
    appears everywhere (df high -> idf ~0), each doc's topic word is
    unique to it."""
    df = spark.createDataFrame(
        [
            (1, "the the the turbine turbine turbine blade"),
            (2, "the the the glacier glacier glacier melt"),
            (3, "the the the sonnet sonnet sonnet meter"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["kw_rank"]): r["term"]
        for r in keyword_topk(df, "text", "doc_id", k=1).collect()
    }
    assert got == {(1, 1): "turbine", (2, 1): "glacier", (3, 1): "sonnet"}


def test_keyword_topk_min_df_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    # min_df=2 drops gamma (df=1); alpha and beta share df=2
    rows = keyword_topk(df, "text", "doc_id", k=5, min_df=2).collect()
    terms = {r["term"] for r in rows}
    assert "gamma" not in terms and {"alpha", "beta"} <= terms
    # doc 2: alpha and beta tie on tf=1 -> term-ascending tiebreak
    d2 = sorted(
        (r["kw_rank"], r["term"]) for r in rows if r["doc_id"] == 2
    )
    assert d2 == [(1, "alpha"), (2, "beta")]
    with pytest.raises(ValueError):
        keyword_topk(df, "text", "doc_id", k=0)


def test_combine_manifests_equals_one_shot(spark):
    """xor + exact decimal sum are associative/commutative, so merging
    disjoint raw manifests must reproduce the one-shot digest
    bit-for-bit regardless of how the corpus was partitioned."""
    from tidyvec_spark.sources.maintenance import (
        combine_manifests,
        corpus_manifest,
    )

    df = spark.createDataFrame(
        [(i, f"doc number {i} body text {i % 7}") for i in range(60)],
        "doc_id bigint, text string",
    )
    full = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["content_hash"])
        for r in corpus_manifest(df, "doc_id", "text", n_shards=4).collect()
    }
    parts = [
        corpus_manifest(
            df.filter(F.col("doc_id") % 3 == k), "doc_id", "text",
            n_shards=4, digest=False,
        )
        for k in range(3)
    ]
    merged = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["content_hash"])
        for r in combine_manifests(*parts).collect()
    }
    assert merged == full
    with pytest.raises(ValueError):
        combine_manifests()
