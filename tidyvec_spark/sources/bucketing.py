"""Bucketed tables: co-located joins with NO exchange on either side.

Hive-style bucketing (``DataFrameWriter.bucketBy``) hash-partitions a
table's FILES by the join key at write time. When two tables share the
bucket key and count, Catalyst proves both sides already satisfy the
join's required distribution and plans a SortMergeJoin with ZERO
Exchange operators — the shuffle every big fact-to-fact join normally
pays is paid once at write time and amortized over every subsequent
join, the core trick for repeated 100 TB joins (events ⋈ users,
lineitem ⋈ orders, doc ⋈ signature index).

This is the third co-location tool next to `sources/layout.py`'s
partition pruning (directory-level elimination) and broadcast joins
(small dims): partitioning prunes what is READ, bucketing removes the
shuffle on what is JOINED.

Bucketed tables must live in the session catalog (files alone cannot
carry bucket metadata), so writers here use ``saveAsTable``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed_table", "bucketed_join_ready"]


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str | Sequence[str],
    n_buckets: int = 32,
    sort_col: str | Sequence[str] | None = None,
    mode: str = "errorifexists",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. ``sort_col`` pre-sorts within buckets so the later
    SortMergeJoin also skips its per-partition Sort. Choose
    ``n_buckets`` once per subject area — only equal bucket counts (or
    integer multiples, with ``spark.sql.bucketing.coalesceBucketsInJoin``)
    join shuffle-free. ``path`` makes it an external table at that
    location (the warehouse dir is a static conf and cannot move after
    session start)."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.mode(mode).bucketBy(int(n_buckets), *cols)
    if sort_col is not None:
        s = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        w = w.sortBy(*s)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str
) -> bool:
    """True iff both catalog tables are bucketed with equal bucket
    counts on some column set — the precondition for the exchange-free
    join plan."""

    def spec(t):
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        return info.get("Num Buckets"), info.get("Bucket Columns")

    ln, lc = spec(left_table)
    rn, rc = spec(right_table)
    return ln is not None and ln == rn and lc == rc
