"""Token co-occurrence PMI (operators/cooccur.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.cooccur import token_pmi_topk


def test_pmi_hand_computed(spark):
    """4 docs: (a,b) co-occur in 2 of 4; a in 3, b in 3 →
    pmi = ln(2·4 / (3·3)). (c,d) co-occur in 2 of 4, each appears
    exactly twice → pmi = ln(2·4/(2·2)) = ln 2, the top pair."""
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c d"),
            (3, "a x"),
            (4, "b y"),
        ],
        "doc_id long, text string",
    )
    out = token_pmi_topk(df, "text", "doc_id", k=50, min_pair_docs=2)
    got = {(r.term_a, r.term_b): (r.n_ab, r.pmi) for r in out.collect()}
    assert got[("c", "d")] == (2, round(math.log(2.0), 6))
    assert got[("a", "b")] == (2, round(math.log(8.0 / 9.0), 6))
    assert got[("c", "d")][1] > got[("a", "b")][1]


def test_pmi_min_pair_docs_prunes(spark):
    df = spark.createDataFrame(
        [(1, "p q"), (2, "p r"), (3, "q r")],
        "doc_id long, text string",
    )
    out = token_pmi_topk(df, "text", "doc_id", k=50, min_pair_docs=2)
    assert out.count() == 0  # every pair co-occurs exactly once


def test_pmi_cap_bounds_pairs(spark):
    """max_distinct caps the per-doc pair fan-out: with cap 2 only the
    two lexicographically-first tokens pair."""
    df = spark.createDataFrame(
        [(1, "z y x w"), (2, "z y x w")], "doc_id long, text string"
    )
    out = token_pmi_topk(
        df, "text", "doc_id", k=50, min_pair_docs=2, max_distinct=2
    )
    rows = out.collect()
    assert [(r.term_a, r.term_b) for r in rows] == [("w", "x")]


def test_pmi_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        token_pmi_topk(df, "text", "doc_id", k=0)
    with pytest.raises(ValueError):
        token_pmi_topk(df, "text", "doc_id", max_distinct=1)


def test_pmi_no_cartesian_and_bounded_shuffles(documents):
    from tidyvec_spark import plans as P

    out = token_pmi_topk(documents, "text", "doc_id", k=10)
    P.assert_no_cartesian(out)
    assert P.num_shuffles(out) <= 4


def test_skipgram_pairs_window_law(spark):
    """skipgram_pairs: exact window semantics on a tiny doc — each
    token pairs with neighbours within +/-w positions, occurrences
    accumulate, and pair volume is 2*w*n_tokens minus boundary
    truncation; validation raises on w < 1."""
    import pytest

    from tidyvec_spark.operators.cooccur import skipgram_pairs

    df = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    got = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_pairs(df, "text", "doc_id", window=1).collect()
    }
    # positions: a0 b1 a2 c3 -> adjacent pairs, both directions
    assert got == {
        ("a", "b"): 2, ("b", "a"): 2,
        ("a", "c"): 1, ("c", "a"): 1,
    }
    tot = sum(
        r["n"] for r in
        skipgram_pairs(df, "text", "doc_id", window=2).collect()
    )
    # w=2: each of 4 tokens probes <=4 neighbours; boundary-truncated
    assert tot == 10
    with pytest.raises(ValueError, match="window"):
        skipgram_pairs(df, "text", "doc_id", window=0)
