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
