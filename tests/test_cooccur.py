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


def test_negative_sampling_table_and_draws(spark):
    """negative_sampling_table: slot shares track count^0.75; the
    table fills exactly to size; sample_negatives is deterministic,
    re-salts move draws, and frequent terms dominate negatives."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.cooccur import (
        negative_sampling_table,
        sample_negatives,
    )

    # 'a' 80x, 'b' 16x, 'c' 4x
    docs = spark.createDataFrame(
        [(0, " ".join(["a"] * 80 + ["b"] * 16 + ["c"] * 4))],
        "doc_id long, text string",
    )
    table = negative_sampling_table(docs, "text", power=0.75,
                                    table_size=1000)
    assert len(table) == 1000
    share = {t: table.count(t) / 1000 for t in ("a", "b", "c")}
    w = {"a": 80 ** 0.75, "b": 16 ** 0.75, "c": 4 ** 0.75}
    z = sum(w.values())
    for t in share:
        assert abs(share[t] - w[t] / z) < 0.002  # floor granularity

    pairs = spark.createDataFrame(
        [(f"k{i}",) for i in range(200)], "key string"
    )
    drawn = sample_negatives(pairs, "key", table, k=3, salt="s")
    rows = drawn.collect()
    assert len(rows) == 600
    again = {(r["key"], r["neg_idx"]): r["neg"]
             for r in sample_negatives(pairs, "key", table, k=3,
                                       salt="s").collect()}
    assert all(again[(r["key"], r["neg_idx"])] == r["neg"] for r in rows)
    other = {(r["key"], r["neg_idx"]): r["neg"]
             for r in sample_negatives(pairs, "key", table, k=3,
                                       salt="t").collect()}
    assert any(other[k2] != v for k2, v in again.items())
    from collections import Counter
    freq = Counter(r["neg"] for r in rows)
    assert freq["a"] > freq["b"] > freq["c"] > 0

    with pytest.raises(ValueError, match="table_size"):
        negative_sampling_table(docs, "text", table_size=0)
    with pytest.raises(ValueError, match="k must"):
        sample_negatives(pairs, "key", table, k=0)


def test_negative_sampling_ranges_and_join_path(spark):
    """negative_sampling_ranges: vocab-bounded driver artifact whose
    slot ranges tile [0, T) exactly; max_vocab caps the collect on the
    canonical (count desc, term) order; sample_negatives_join draws
    identically to the literal-array path via a broadcast equi-join
    with zero shuffles (the r11 ADVICE scale finding)."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.cooccur import (
        negative_sampling_ranges,
        negative_sampling_table,
        sample_negatives,
        sample_negatives_join,
    )

    docs = spark.createDataFrame(
        [(0, " ".join(["a"] * 80 + ["b"] * 16 + ["c"] * 4))],
        "doc_id long, text string",
    )
    T = 1000
    ranges = negative_sampling_ranges(docs, "text", table_size=T)
    # ranges tile [0, T) contiguously in canonical order
    assert ranges[0][1] == 0 and ranges[-1][2] == T
    for (_, _, hi), (_, lo, _) in zip(ranges, ranges[1:]):
        assert hi == lo
    # the table view is the expansion of the ranges
    table = negative_sampling_table(docs, "text", table_size=T)
    for t, lo, hi in ranges:
        assert table[lo:hi] == [t] * (hi - lo)

    # max_vocab caps on (count desc, term): only 'a' and 'b' survive
    capped = negative_sampling_ranges(
        docs, "text", table_size=T, max_vocab=2
    )
    assert [t for t, _, _ in capped] == ["a", "b"]
    assert capped[-1][2] == T  # last kept term absorbs the tail

    # join path == literal-array path, and its plan is broadcast-only
    pairs = spark.createDataFrame(
        [(f"k{i}",) for i in range(100)], "key string"
    )
    via_arr = {(r["key"], r["neg_idx"]): r["neg"]
               for r in sample_negatives(pairs, "key", table,
                                         k=3, salt="s").collect()}
    joined = sample_negatives_join(pairs, "key", ranges, T,
                                   k=3, salt="s")
    assert P.num_shuffles(joined) == 0
    assert "BroadcastHashJoin" in P.join_strategies(joined)
    via_join = {(r["key"], r["neg_idx"]): r["neg"]
                for r in joined.collect()}
    assert via_join == via_arr

    # generic exponents have no engine-exact law: refuse them
    with pytest.raises(ValueError, match="power"):
        negative_sampling_table(docs, "text", power=0.5)
    with pytest.raises(ValueError, match="max_vocab"):
        negative_sampling_ranges(docs, "text", max_vocab=0)
    with pytest.raises(ValueError, match="empty"):
        sample_negatives_join(pairs, "key", [], T)
