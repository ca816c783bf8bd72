"""Bucketed tables: the join of two same-bucketed tables must plan
with ZERO Exchange operators — write-time shuffle amortized over every
subsequent join — and return exactly the plain join's rows."""

import os

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.sources.bucketing import (
    bucketed_join_ready,
    write_bucketed_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed_table(
        orders, "b_orders", "o_custkey", n_buckets=8,
        sort_col="o_custkey", mode="overwrite", path=str(wh / "b_orders"),
    )
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", "o_custkey", n_buckets=8,
        sort_col="o_custkey", mode="overwrite",
        path=str(wh / "b_customer"),
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    lt, rt = bucketed
    assert bucketed_join_ready(spark, lt, rt)
    j = (
        spark.table(lt)
        .join(spark.table(rt).hint("merge"), "o_custkey")
        .select("o_orderkey", "o_custkey", "c_mktsegment")
    )
    s = P.explain_str(j)
    assert "SortMergeJoin" in s
    # THE claim: both sides read pre-bucketed, no shuffle anywhere
    assert P.num_shuffles(j) == 0


def test_bucketed_join_matches_plain_join(spark, bucketed):
    lt, rt = bucketed
    bucketed_rows = sorted(
        tuple(r)
        for r in spark.table(lt)
        .join(spark.table(rt), "o_custkey")
        .select("o_orderkey", "c_mktsegment")
        .collect()
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    plain = sorted(
        tuple(r)
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_mktsegment")
        .collect()
    )
    assert bucketed_rows == plain and len(plain) > 0


def test_unbucketed_join_pays_shuffles(spark):
    # the control: the same join over raw files costs two exchanges
    # (or one + broadcast); assert it is NOT exchange-free so the
    # bucketed claim above is meaningful
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    j = orders.join(
        cust.hint("merge"), orders.o_custkey == cust.c_custkey
    )
    assert P.num_shuffles(j) >= 1


def test_compact_parquet_reduces_files_keeps_rows(spark, tmp_path):
    """Small-file compaction: a landing zone of 32 tiny files rewrites
    to the computed target count with identical data."""
    from tidyvec_spark.sources.maintenance import (
        compact_parquet,
        parquet_file_stats,
    )

    src = str(tmp_path / "landing")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.repartition(32).write.parquet(src)
    n_before, total = parquet_file_stats(spark, src)
    assert n_before >= 32
    # the Hadoop-FS listing agrees with a local walk (same files, same
    # bytes) — and unlike os.walk it also works on object-store URIs
    walk_n, walk_total = 0, 0
    for root, _, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                walk_n += 1
                walk_total += os.path.getsize(os.path.join(root, f))
    assert (n_before, total) == (walk_n, walk_total)
    # scheme-qualified URI lists identically (the os.walk version
    # returned 0 here)
    assert parquet_file_stats(spark, f"file://{src}") == (n_before, total)

    dst = str(tmp_path / "compacted")
    n_target = compact_parquet(spark, src, dst, target_mb=128)
    n_after, _ = parquet_file_stats(spark, dst)
    assert n_target == 1  # tiny corpus fits one 128MB file
    assert n_after < n_before
    # identical data
    a = sorted(r["doc_id"] for r in spark.read.parquet(dst).collect())
    b = sorted(r["doc_id"] for r in docs.collect())
    assert a == b


def test_compact_parquet_empty_path_raises(spark, tmp_path):
    """Mis-pointed/empty src must raise, not compact 'everything' into
    one file from a 0-byte listing."""
    from tidyvec_spark.sources.maintenance import compact_parquet

    src = str(tmp_path / "empty")
    os.makedirs(src, exist_ok=True)
    with pytest.raises(ValueError, match="no parquet data files"):
        compact_parquet(spark, src, str(tmp_path / "out"))
