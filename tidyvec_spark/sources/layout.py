"""Physical layouts that turn ANN probe filters into partition pruning.

The ANN operators' docstrings (operators/ann.py) promise that "with the
corpus partitioned by bucket, the probe filter becomes partition
pruning". This module keeps that promise as code: write the corpus
parquet partitioned by the LSH bucket (or IVF centroid) key, and the
probe-side reader's ``IN`` filter on that key prunes at the *directory*
level — a query touches ``probes / 2^nbits`` (or ``nprobe / k``) of the
files, before a single row is read.

This is the 100 TB difference between "scan everything, filter
map-side" (the un-partitioned plan, still correct) and "scan almost
nothing": at 2^8 buckets and Hamming-1 multiprobe, 9/256 ≈ 3.5% of the
corpus is read. The layout is write-once — the bucket expression is
deterministic given the plane set, so readers recompute probe sets from
the same planes without any stored index structure.

Not in the reference (its corpus is an in-memory tibble, R/core.R); the
layout mirrors how Spark tables use hive-style partition directories
for partition pruning.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucket_partitioned(
    df: DataFrame,
    path: str,
    emb_col: str,
    planes: Sequence[Sequence[float]],
    bucket_col: str = "bucket",
    mode: str = "error",
) -> None:
    """Write the corpus parquet partitioned by its hyperplane-LSH
    bucket. One pass: the bucket is a map-side expression, the write
    shuffles nothing (hive-style directory per bucket value)."""
    from tidyvec_spark.operators.ann import hyperplane_bucket_expr

    (
        df.withColumn(bucket_col, hyperplane_bucket_expr(emb_col, planes))
        .write.partitionBy(bucket_col)
        .mode(mode)
        .parquet(path)
    )


def write_centroid_partitioned(
    df: DataFrame,
    path: str,
    emb_col: str,
    id_col: str,
    centroids: DataFrame,
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid",
    mode: str = "error",
    strategy: str = "auto",
) -> None:
    """Write the corpus parquet partitioned by IVF centroid assignment
    — the IVF analog of :func:`write_bucket_partitioned`; ``ivf``
    probe reads prune to ``nprobe`` directories."""
    from tidyvec_spark.operators.ann import ivf_assign

    (
        ivf_assign(df, emb_col, id_col, centroids, cent_id, cent_vec,
                   strategy=strategy)
        .write.partitionBy(cent_id)
        .mode(mode)
        .parquet(path)
    )


def ann_lsh_topk_pruned(
    spark: SparkSession,
    path: str,
    emb_col: str,
    id_col: str,
    query_vec: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int = 10,
    probe_hamming: int = 1,
    bucket_col: str = "bucket",
    method: str = "cosine",
    round_to: Optional[int] = None,
) -> DataFrame:
    """LSH top-k over a bucket-partitioned layout. The probe ``IN``
    filter lands on the partition column, so the scan prunes whole
    bucket directories (visible as PartitionFilters in the plan);
    only the probed ≈ (nbits+1)/2^nbits fraction of files is read,
    then the exact kernel reranks. Same results as
    ``operators.ann.ann_lsh_topk`` over the same corpus and planes.
    """
    from tidyvec_spark.functions.vector import array_lit, similarity_expr
    from tidyvec_spark.operators.ann import multiprobe_buckets, query_bucket

    nbits = len(planes)
    qb = query_bucket(query_vec, planes)
    probes = multiprobe_buckets(qb, nbits, probe_hamming)
    sim = similarity_expr(F.col(emb_col), array_lit(query_vec), method)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        spark.read.parquet(path)
        .filter(F.col(bucket_col).isin(probes))
        .withColumn("similarity", sim)
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(int(k))
        .select(id_col, "similarity")
    )
