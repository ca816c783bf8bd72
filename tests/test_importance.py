"""DSIR importance resampling: hand-checked weights, scale-shape plan
assertions, short-document edge cases."""

import hashlib
import math

from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.importance import (
    dsir_log_ratios,
    dsir_top_k,
    dsir_weights,
    hashed_ngram_buckets,
)

B = 64


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _buckets(text: str, n: int = 2, b: int = B) -> list[int]:
    toks = [t for t in text.lower().split() if t]
    return [
        _md5_long(" ".join(toks[i : i + n])) % b
        for i in range(len(toks) - n + 1)
    ]


def _expected_weights(raw, target, b=B):
    def fit(corpus):
        counts: dict[int, int] = {}
        total = 0
        for _, text in corpus:
            for bk in _buckets(text, b=b):
                counts[bk] = counts.get(bk, 0) + 1
                total += 1
        return counts, total

    tc, tn = fit(target)
    rc, rn = fit(raw)
    ratios = [
        math.log((tc.get(i, 0) + 1.0) / (tn + b))
        - math.log((rc.get(i, 0) + 1.0) / (rn + b))
        for i in range(b)
    ]
    out = {}
    for doc_id, text in raw:
        bs = _buckets(text, b=b)
        if bs:
            s = 0.0
            for bk in bs:  # same left-to-right fold as the engine
                s += ratios[bk]
            out[doc_id] = s / len(bs)
    return out


def test_hashed_ngram_buckets_matches_reference_hash(spark):
    df = spark.createDataFrame(
        [(1, "Alpha beta gamma"), (2, "x"), (3, ""), (4, None)],
        "id int, text string",
    )
    got = {
        r["id"]: r["bs"]
        for r in df.select(
            "id", hashed_ngram_buckets("text", n=2, num_buckets=B).alias("bs")
        ).collect()
    }
    assert got[1] == _buckets("Alpha beta gamma")
    assert len(got[1]) == 2
    # short / empty / NULL docs -> empty feature list, never [1, 0]
    # garbage from a descending sequence
    assert got[2] == []
    assert got[3] == []
    assert got[4] == []


def test_dsir_weights_hand_checked(spark):
    raw_rows = [
        (1, "the cat sat on the mat"),
        (2, "stock market prices fell sharply today"),
        (3, "the cat chased the dog"),
        (4, "quarterly earnings beat market expectations"),
    ]
    target_rows = [
        (10, "a cat and a dog play"),
        (11, "the cat sat near the dog"),
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id int, text string")
    target = spark.createDataFrame(target_rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(
            raw, target, "text", "doc_id", n=2, num_buckets=B
        ).collect()
    }
    exp = _expected_weights(raw_rows, target_rows)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9, (k, got[k], exp[k])
    # animal documents must out-rank finance documents under an
    # animal-themed target
    assert min(got[1], got[3]) > max(got[2], got[4])
    top = dsir_top_k(
        raw, target, "text", "doc_id", k=2, n=2, num_buckets=B
    ).collect()
    assert [r["doc_id"] for r in top] == sorted(
        exp, key=lambda d: (-exp[d], d)
    )[:2]


def test_dsir_scoring_is_map_side(spark):
    """The production shape: fit once (bounded aggs), then score with a
    precomputed ratio table — the scoring pass must plan with ZERO
    shuffles (array-literal lookup inside a fold, no joins)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("source") == "src0")
    ratios = dsir_log_ratios(docs, target, "text", n=2, num_buckets=B)
    assert len(ratios) == B
    scored = dsir_weights(
        docs, target, "text", "doc_id",
        n=2, num_buckets=B, ratios=ratios,
    )
    assert P.num_shuffles(scored) == 0
    assert scored.count() > 0


def test_dsir_short_docs_dropped(spark):
    raw = spark.createDataFrame(
        [(1, "one two three"), (2, "single"), (3, "")],
        "doc_id int, text string",
    )
    target = spark.createDataFrame([(9, "one two")], "doc_id int, text string")
    got = dsir_weights(raw, target, "text", "doc_id", n=2, num_buckets=B)
    assert [r["doc_id"] for r in got.collect()] == [1]
