"""Curriculum sharding: assignment semantics, boundary helper, and the
ordered-shard writer round-trip."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.curriculum import (
    curriculum_assign,
    shard_boundaries,
    write_curriculum_shards,
)

SF = "/root/testdata/sf0.001"


def test_curriculum_assign_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, 95.0), (2, 50.0), (3, 95.0), (4, 10.0), (5, 70.0)],
        "doc_id bigint, score double",
    )
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in curriculum_assign(df, "score", "doc_id", [90.0, 40.0]).collect()
    }
    # shard 0: scores > 90 -> ids 1, 3 (tie -> min id first)
    # shard 1: 40 < s <= 90 -> 5 then 2 ; shard 2: the rest -> 4
    assert got[1] == (0, 1) and got[3] == (0, 2)
    assert got[5] == (1, 1) and got[2] == (1, 2)
    assert got[4] == (2, 1)
    # (shard, pos) is a total order with no gaps
    per_shard = {}
    for s, p in got.values():
        per_shard.setdefault(s, []).append(p)
    for ps in per_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_curriculum_rejects_unsorted_boundaries(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id bigint, score double")
    with pytest.raises(ValueError):
        curriculum_assign(df, "score", "doc_id", [10.0, 10.0])
    with pytest.raises(ValueError):
        curriculum_assign(df, "score", "doc_id", [10.0, 20.0])


def test_shard_boundaries_equi_depth(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bs = shard_boundaries(docs, "n_chars", 4)
    assert bs == sorted(bs, reverse=True) and 1 <= len(bs) <= 3
    assigned = curriculum_assign(
        docs.select("doc_id", F.col("n_chars").cast("double").alias("s")),
        "s", "doc_id", bs,
    )
    counts = [
        r["n"]
        for r in assigned.groupBy("shard").agg(F.count("*").alias("n"))
        .orderBy("shard").collect()
    ]
    total = sum(counts)
    # equi-depth within approxQuantile tolerance: no shard is empty or
    # grossly dominant
    assert len(counts) == len(bs) + 1
    assert all(0 < c < 0.6 * total for c in counts)


def test_write_curriculum_shards_roundtrip(spark, tmp_path):
    """Directory-per-shard layout, shard pruning in the plan, rows
    within a shard readable in best-first order."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("score")
    )
    path = str(tmp_path / "curr")
    write_curriculum_shards(docs, path, "score", "doc_id", [419.0, 306.0, 175.0])
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    probe = back.filter(F.col("shard") == 0)
    assert "PartitionFilters" in P.explain_str(probe)
    # shard 0 strictly precedes shard 1 in score
    s0_min = probe.agg(F.min("score")).first()[0]
    s1_max = back.filter(F.col("shard") == 1).agg(F.max("score")).first()[0]
    assert s0_min > s1_max
    # within-shard order: pos ascending == score descending
    rows = (
        back.filter(F.col("shard") == 1).orderBy("pos").select("score").collect()
    )
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_shuffle_assign_is_deterministic_permutation(spark, sf_dir):
    from tidyvec_spark.operators.curriculum import shuffle_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    a = shuffle_assign(docs, "doc_id", n_shards=8, seed=7, epoch=0)
    rows = a.collect()
    # total order: every id appears once, pos is 1..size within shard
    assert len(rows) == n and len({r["doc_id"] for r in rows}) == n
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # uniform-ish split: no shard more than 3x the fair share
    assert max(len(p) for p in by_shard.values()) <= 3 * (n / 8)
    # reproducible: a second evaluation is identical
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in a.collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_shuffle_assign_epochs_differ(spark, sf_dir):
    from tidyvec_spark.operators.curriculum import shuffle_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e0 = {(r["doc_id"], r["shard"], r["pos"])
          for r in shuffle_assign(docs, "doc_id", 8, seed=7, epoch=0).collect()}
    e1 = {(r["doc_id"], r["shard"], r["pos"])
          for r in shuffle_assign(docs, "doc_id", 8, seed=7, epoch=1).collect()}
    assert len(e0 & e1) < len(e0) * 0.2  # fresh permutation, not a tweak


def test_write_shuffled_shards_roundtrip(spark, sf_dir, tmp_path):
    from tidyvec_spark.operators.curriculum import shuffle_assign, write_shuffled_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    path = str(tmp_path / "epoch0")
    write_shuffled_shards(docs, path, "doc_id", n_shards=4, seed=1, epoch=0)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(back.columns) >= {"doc_id", "text", "shard", "pos"}
    # shard directories exist -> partition pruning applies
    one = spark.read.parquet(path).filter(F.col("shard") == 0)
    expected = shuffle_assign(docs, "doc_id", 4, seed=1, epoch=0).filter(
        F.col("shard") == 0
    )
    assert one.count() == expected.count()
