"""Rank fusion, chunk pooling, batched LSH serving."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.ann import ann_lsh_topk, ann_lsh_topk_batch, random_planes
from tidyvec_spark.operators.fusion import mean_pool_embeddings, rrf_fuse

SF = "/root/testdata/sf0.001"


def test_rrf_fuse_hand_checked(spark):
    a = spark.createDataFrame([(1, 0.9), (2, 0.8), (3, 0.7)], ["id", "s1"])
    b = spark.createDataFrame([(3, 5.0), (1, 4.0), (9, 3.0)], ["id", "s2"])
    got = {
        r["id"]: r["rrf_score"]
        for r in rrf_fuse([a, b], "id", ["s1", "s2"], k=60, n=10).collect()
    }
    # id 1: rank1 in a, rank2 in b; id 3: rank3 + rank1; id 2: rank2; id 9: rank3
    assert got[1] == round(1 / 61 + 1 / 62, 6)
    assert got[3] == round(1 / 63 + 1 / 61, 6)
    assert got[2] == round(1 / 62, 6)
    assert got[9] == round(1 / 63, 6)
    assert got[1] > got[3] > got[2] > got[9]


def test_rrf_rejects_bad_args(spark):
    a = spark.createDataFrame([(1, 0.9)], ["id", "s"])
    with pytest.raises(ValueError):
        rrf_fuse([a], "id", ["s", "t"])
    with pytest.raises(ValueError):
        rrf_fuse([], "id", [])
    with pytest.raises(ValueError):
        rrf_fuse([a], "id", ["s"], n=10, max_list_size=5)


def test_rrf_bounds_each_input(spark):
    """A corpus-sized input must be truncated to its top
    max_list_size rows in rank order — planned as a distributed
    TakeOrdered, never a single-task global sort of everything — and
    the ranks (hence RRF scores) of the survivors are unchanged."""
    corpus = spark.range(0, 5000).select(
        F.col("id"), (5000 - F.col("id")).cast("double").alias("s")
    )
    out = rrf_fuse([corpus], "id", ["s"], k=60, n=5, max_list_size=100)
    plan = P.explain_str(out)
    assert "TakeOrderedAndProject" in plan
    got = {r["id"]: r["rrf_score"] for r in out.collect()}
    # ranks preserved exactly: id 0 is rank 1, etc.
    assert got[0] == round(1 / 61, 6)
    assert got[4] == round(1 / 65, 6)


def test_mean_pool_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [10.0, 20.0])],
        ["parent", "emb"],
    )
    got = {
        r["parent"]: (r["embedding"], r["n_chunks"])
        for r in mean_pool_embeddings(df, "emb", "parent").collect()
    }
    assert got[1] == ([2.0, 3.0], 2)
    assert got[2] == ([10.0, 20.0], 1)


def test_mean_pool_ignores_null_and_mismatched_dims(spark):
    """NULL embeddings must not inflate the denominator (collect_list
    already drops them from the sum), and with dim= set, wrong-length
    vectors are excluded instead of NULLing elements via zip_with."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (1, None), (2, None)],
        "parent int, emb array<double>",
    )
    got = {
        r["parent"]: (r["embedding"], r["n_chunks"])
        for r in mean_pool_embeddings(df, "emb", "parent").collect()
    }
    assert got[1] == ([2.0, 3.0], 2)  # NULL row excluded from mean AND count
    assert got[2] == (None, 0)  # all-NULL parent: no vector, zero chunks
    df2 = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0, 5.0])], "parent int, emb array<double>"
    )
    got2 = {
        r["parent"]: (r["embedding"], r["n_chunks"])
        for r in mean_pool_embeddings(df2, "emb", "parent", dim=2).collect()
    }
    assert got2[1] == ([1.0, 2.0], 1)  # 3-dim row filtered out


def test_batch_lsh_matches_single_query_path(spark):
    """The batched plan must return exactly what N single-query
    ann_lsh_topk calls return, and its corpus side must not shuffle
    (probe table broadcast; the only exchange is the per-query
    candidate window)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planes = random_planes(64, nbits=6, seed=42)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    batch = ann_lsh_topk_batch(
        emb, "embedding", "vec_id", qs, "q_id", "q_emb",
        planes=planes, k=5, probe_hamming=1, round_to=6,
    )
    got = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["similarity"])
        for r in batch.collect()
    }
    for qid in range(3):
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        single = ann_lsh_topk(
            emb, "embedding", "vec_id", qvec, k=5, planes=planes,
            probe_hamming=1, round_to=6,
        ).collect()
        for i, r in enumerate(single, start=1):
            assert got[(qid, i)] == (r["vec_id"], r["similarity"])
    P.assert_broadcast(batch)
    assert P.num_shuffles(batch) == 1  # only the top-k window
