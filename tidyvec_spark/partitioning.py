"""Partitioning helpers — making tiny-file inputs behave like real scans.

On a production table (100 TB = tens of thousands of parquet splits) a
scan already yields at least one task per core; operators that run heavy
map-side expressions (minhash signatures, simhash bit votes, GEMM
blocks) inherit that parallelism for free. On a single small parquet
file Spark plans 1-2 input partitions and the same expression runs on
1-2 of N cores. ``ensure_parallelism`` is the guard: a round-robin
repartition *only when* the source has fewer partitions than the
cluster has slots — a no-op exchange on real data, a 10-30x unlock on
small files. The shuffled payload is the raw input rows (pre-explosion,
pre-signature), so the exchange cost is bounded by input size.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    ``sparkContext.defaultParallelism``) iff it currently has fewer.
    Never coalesces — a well-split source passes through untouched.
    """
    sc = df.sparkSession.sparkContext
    target = int(min_partitions) if min_partitions else sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
