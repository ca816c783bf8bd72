"""Persisted inverted index: indexed BM25 must equal the full-scan
bm25_topk bit-for-bit, the postings layout must partition-prune, and
the stats sidecar must carry exact corpus constants."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.index import (
    bm25_topk_indexed,
    build_postings,
    write_inverted_index,
)
from tidyvec_spark.operators.search import bm25_topk

QUERY = "data spark model training"


@pytest.fixture(scope="module")
def index_path(spark, documents, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("invidx")) + "/idx"
    write_inverted_index(documents, "text", "doc_id", path, n_buckets=16)
    return path


def test_postings_shape(documents):
    p = build_postings(documents, "text", "doc_id")
    assert p.columns == ["id", "term", "tf", "dl"]
    row = p.filter(F.col("tf") > 1).first()
    assert row is not None  # repeated terms aggregate, not duplicate
    # dl is the doc's total token count, identical on every posting
    bad = (
        p.groupBy("id")
        .agg(
            F.countDistinct("dl").alias("ndl"),
            F.sum("tf").alias("s"),
            F.first("dl").alias("dl"),
        )
        .filter((F.col("ndl") != 1) | (F.col("s") != F.col("dl")))
        .count()
    )
    assert bad == 0


def test_indexed_equals_full_scan(spark, documents, index_path):
    full = bm25_topk(
        documents, "text", "doc_id", QUERY, n=20, round_to=None
    ).collect()
    idx = bm25_topk_indexed(
        spark, index_path, QUERY, n=20, n_buckets=16, id_col="doc_id"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in idx] == [
        (r["doc_id"], r["score"]) for r in full
    ]


def test_bucket_pruning_in_plan(spark, index_path):
    df = bm25_topk_indexed(spark, index_path, QUERY, n=5, n_buckets=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the partition filter on term_bucket must reach the scan
    assert "term_bucket" in plan
    # and the term predicate must be pushed into parquet
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:300]


def test_missing_stats_raises(spark, tmp_path, documents):
    p = str(tmp_path / "idx2")
    write_inverted_index(documents.limit(50), "text", "doc_id", p, n_buckets=4)
    empty = spark.createDataFrame([], "term string, value double")
    empty.write.mode("overwrite").parquet(f"{p}/stats")
    with pytest.raises(ValueError, match="no index stats"):
        bm25_topk_indexed(spark, p, QUERY, n_buckets=4)


def test_n_buckets_validation(documents, tmp_path):
    with pytest.raises(ValueError, match="n_buckets"):
        write_inverted_index(documents, "text", "doc_id", str(tmp_path), 0)
