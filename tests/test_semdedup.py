"""SemDeDup composition: pair recall, keep rule, plan shape."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.semdedup import semantic_dedup, semantic_dedup_pairs


@pytest.fixture(scope="module")
def corpus(embeddings):
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.1)),
            F.slice("embedding", 2, 1_000_000),
        ).alias("embedding"),
    )
    return e.unionByName(pert)


@pytest.fixture(scope="module")
def cents(embeddings):
    return (
        embeddings.filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )


def test_pairs_are_same_cluster_near_dups(corpus, cents):
    pairs = semantic_dedup_pairs(
        corpus, "embedding", "vec_id", cents, threshold=0.98, round_to=6
    ).collect()
    assert pairs, "synthesized near-dups must produce pairs"
    n_base = corpus.count() // 2
    # most pairs are (x, x+100000): the planted duplicates, found when
    # both copies land in the same cluster
    planted = sum(1 for r in pairs if r["id_b"] == r["id_a"] + 100000)
    assert planted >= 0.7 * n_base  # clustering recall is high, not total
    for r in pairs[:50]:
        assert r["id_a"] < r["id_b"]
        assert r["similarity"] >= 0.98


def test_keep_rule_drops_larger_ids_only(corpus, cents):
    kept = {
        int(r["vec_id"])
        for r in semantic_dedup(
            corpus, "embedding", "vec_id", cents, threshold=0.98, round_to=6
        ).collect()
    }
    pairs = semantic_dedup_pairs(
        corpus, "embedding", "vec_id", cents, threshold=0.98, round_to=6
    ).collect()
    dropped = {int(r["id_b"]) for r in pairs}
    all_ids = {int(r["vec_id"]) for r in corpus.collect()}
    assert kept == all_ids - dropped
    # the smaller member of every pair survives unless itself dropped
    # by another pair where it is the larger id
    smaller = {int(r["id_a"]) for r in pairs}
    assert (smaller - dropped) <= kept


def test_pair_generation_single_shuffle(corpus, cents):
    df = semantic_dedup_pairs(corpus, "embedding", "vec_id", cents)
    P.assert_no_cartesian(df)
    # map-side assignment + one groupBy(centroid) for the GEMM, plus
    # ensure_parallelism's repartition of the single-file local input
    # (absent on a real multi-split scan)
    assert P.num_shuffles(df) <= 2


def test_empty_centroids_raise(corpus, cents):
    with pytest.raises(ValueError):
        semantic_dedup_pairs(
            corpus, "embedding", "vec_id", cents.filter(F.lit(False))
        )
