"""Bucket/centroid-partitioned layouts: probe filters must become
PARTITION pruning (directory-level), and pruned results must equal the
scan-everything plan. This is the 100 TB claim of operators/ann.py
made checkable."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators import ann
from tidyvec_spark.sources.layout import (
    ann_lsh_topk_pruned,
    write_bucket_partitioned,
    write_centroid_partitioned,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


@pytest.fixture(scope="module")
def planes():
    return ann.random_planes(64, nbits=6, seed=42)


@pytest.fixture(scope="module")
def bucketed_path(spark, emb, planes, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "bucketed")
    write_bucket_partitioned(emb, path, "embedding", planes)
    return path


def test_bucketed_layout_prunes_partitions(spark, emb, planes, bucketed_path):
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    df = ann_lsh_topk_pruned(
        spark, bucketed_path, "embedding", "vec_id", qvec, planes,
        k=10, probe_hamming=1, round_to=6,
    )
    s = P.explain_str(df)
    # the probe IN-filter must land on the partition column, not a
    # post-scan Filter: pruning happens at planning, before any read
    assert "PartitionFilters" in s and "bucket" in s.split("PartitionFilters")[1][:200]
    assert P.has_take_ordered(df)


def test_bucketed_layout_matches_unpartitioned(spark, emb, planes, bucketed_path):
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    pruned = ann_lsh_topk_pruned(
        spark, bucketed_path, "embedding", "vec_id", qvec, planes,
        k=10, probe_hamming=1, round_to=6,
    ).collect()
    full = ann.ann_lsh_topk(
        emb, "embedding", "vec_id", qvec, k=10, planes=planes,
        probe_hamming=1, round_to=6,
    ).collect()
    assert [(r["vec_id"], r["similarity"]) for r in pruned] == [
        (r["vec_id"], r["similarity"]) for r in full
    ]


def test_centroid_layout_roundtrip(spark, emb, tmp_path_factory):
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    path = str(tmp_path_factory.mktemp("layout") / "ivf")
    write_centroid_partitioned(emb, path, "embedding", "vec_id", cents)
    back = spark.read.parquet(path)
    assert back.count() == emb.count()
    # partition column exists and a probe filter prunes it
    probe = back.filter(F.col("centroid_id").isin([0, 1]))
    assert "PartitionFilters" in P.explain_str(probe)
