"""Bloom-prefiltered decontamination (operators/bloom.py).

The contract is equivalence: decontaminate_bloom must return exactly
the documents decontaminate_ngram_hits(min_hits=1) returns — the bloom
stage is a transport optimization, not a semantics change.
"""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.bloom import (
    bloom_bitmap_words,
    bloom_maybe_contains,
    decontaminate_bloom,
)
from tidyvec_spark.operators.dedup import decontaminate_ngram_hits


def test_bloom_never_misses_a_member(spark):
    """Zero false negatives by construction: every inserted gram
    passes the membership test."""
    grams = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(200)], "g string"
    )
    words = bloom_bitmap_words(grams, "g", num_bits=4096, k=4)
    kept = bloom_maybe_contains(grams, "g", words, num_bits=4096, k=4)
    assert kept.count() == 200


def test_bloom_filters_most_non_members(spark):
    """At ~20 bits/elem the false-positive rate is well under 5%."""
    inserted = spark.createDataFrame(
        [(f"in {i}",) for i in range(100)], "g string"
    )
    probes = spark.createDataFrame(
        [(f"out {i}",) for i in range(1000)], "g string"
    )
    words = bloom_bitmap_words(inserted, "g", num_bits=2048, k=4)
    fp = bloom_maybe_contains(probes, "g", words, num_bits=2048, k=4).count()
    assert fp < 50


def test_decontaminate_bloom_matches_exact(documents):
    """Bit-identical output to the exact broadcast-join rule on the
    fixture corpus (benchmark = doc_id < 20, 8-grams)."""
    bench = documents.filter(F.col("doc_id") < 20)
    exact = decontaminate_ngram_hits(
        documents, bench, "text", "doc_id", n=8
    ).select("doc_id")
    bloom = decontaminate_bloom(
        documents, bench, "text", "doc_id", n=8
    ).select("doc_id")
    a = sorted(r[0] for r in exact.collect())
    b = sorted(r[0] for r in bloom.collect())
    assert a == b
    # sanity: something was actually removed (the eval docs themselves)
    assert len(a) < documents.count()


def test_decontaminate_bloom_tiny_filter_still_exact(documents):
    """Deliberately undersized bitmap (every bucket saturates, FPs
    everywhere): the verify join must still make the output exact."""
    bench = documents.filter(F.col("doc_id") < 10)
    exact = decontaminate_ngram_hits(
        documents, bench, "text", "doc_id", n=8
    ).select("doc_id")
    bloom = decontaminate_bloom(
        documents, bench, "text", "doc_id", n=8, num_bits=1024, k=2
    ).select("doc_id")
    assert sorted(exact.collect()) == sorted(bloom.collect())


def test_decontaminate_bloom_validation(documents):
    with pytest.raises(ValueError):
        decontaminate_bloom(documents, documents, "text", "doc_id", n=0)
    with pytest.raises(ValueError):
        decontaminate_bloom(documents, documents, "text", "doc_id", k=0)


def test_bitmap_is_bounded(spark):
    """The build output never exceeds num_bits/64 rows — the bitmap,
    not the gram count."""
    grams = spark.createDataFrame(
        [(f"g{i}",) for i in range(5000)], "g string"
    )
    words = bloom_bitmap_words(grams, "g", num_bits=1024, k=4)
    assert words.count() <= 1024 // 64 + 1
