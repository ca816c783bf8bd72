"""vocab_growth (Heaps-curve) report tests."""

from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens
from tidyvec_spark.operators.reports import vocab_growth


def test_vocab_growth_matches_exact_prefix_counts(spark, documents):
    got = {
        r["max_doc_id"]: r
        for r in vocab_growth(
            documents, "text", "doc_id", [50, 200, 499]
        ).collect()
    }
    tok = documents.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    )
    for t in (50, 200, 499):
        pre = tok.filter(F.col("doc_id") <= t)
        want_vocab = pre.select("t").distinct().count()
        want_occ = pre.count()
        want_docs = documents.filter(F.col("doc_id") <= t).count()
        r = got[t]
        assert r["vocab"] == want_vocab
        assert r["n_tokens"] == want_occ
        assert r["n_docs"] == want_docs
        assert r["ttr"] == round(want_vocab / want_occ, 6)


def test_vocab_growth_monotone(spark, documents):
    rows = vocab_growth(
        documents, "text", "doc_id", [10, 100, 499]
    ).collect()
    vs = [r["vocab"] for r in rows]
    os_ = [r["n_tokens"] for r in rows]
    assert vs == sorted(vs) and os_ == sorted(os_)


def test_vocab_growth_validation(spark, documents):
    import pytest as pt

    with pt.raises(ValueError):
        vocab_growth(documents, "text", "doc_id", [])
