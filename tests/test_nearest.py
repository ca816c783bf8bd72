import pytest
from pyspark.sql import functions as F

from tidyvec_spark import vec
from tidyvec_spark.operators.nearest import nearest, similarity_join_exact


@pytest.fixture(scope="module")
def evec(embeddings):
    return vec(embeddings, dim=64)


@pytest.fixture(scope="module")
def qvec(embeddings):
    return embeddings.filter(F.col("vec_id") == 0).first()["embedding"]


def test_nearest_cosine_topk(evec, qvec):
    res = nearest(evec, qvec, n=5, as_embedding=True, tiebreak="vec_id")
    rows = res.collect()
    assert len(rows) == 5
    # self-similarity: vec_id 0 must be rank 1 with sim ~1
    assert rows[0]["vec_id"] == 0
    assert rows[0]["similarity"] == pytest.approx(1.0, abs=1e-6)
    sims = [r["similarity"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_nearest_methods_disagree_but_rank_self_first(evec, qvec):
    for method in ("cosine", "euclidean", "dot"):
        res = nearest(evec, qvec, n=3, as_embedding=True, method=method,
                      tiebreak="vec_id")
        top = res.first()
        assert top["vec_id"] == 0, method


def test_nearest_min_score_filters(evec, qvec):
    res = nearest(evec, qvec, n=500, as_embedding=True, min_score=0.99,
                  tiebreak="vec_id")
    rows = res.collect()
    assert all(r["similarity"] >= 0.99 for r in rows)
    assert len(rows) >= 1


def test_null_embeddings_score_zero_and_pass_min_score_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "id int, embedding array<float>",
    )
    res = nearest(vec(df), [1.0, 0.0], n=10, as_embedding=True, tiebreak="id")
    rows = {r["id"]: r["similarity"] for r in res.collect()}
    # quirk parity (R/core.R:281-292,319): NULL-embedding row scores 0,
    # passes min_score=0
    assert rows[2] == 0.0
    assert len(rows) == 3
    # but a positive min_score drops it
    res2 = nearest(vec(df), [1.0, 0.0], n=10, as_embedding=True,
                   min_score=0.5, tiebreak="id")
    assert sorted(r["id"] for r in res2.collect()) == [1]


def test_n_larger_than_rows_returns_all(evec, qvec):
    # default min_score=0 drops negative cosine scores (reference
    # R/core.R:319); to see every row, lower the threshold
    res = nearest(evec, qvec, n=10_000, as_embedding=True, min_score=-2.0,
                  tiebreak="vec_id")
    assert res.count() == 500
    filtered = nearest(evec, qvec, n=10_000, as_embedding=True,
                       tiebreak="vec_id")
    assert filtered.count() < 500  # negative-sim rows dropped at min_score=0


def test_nearest_without_embedder_raises(evec):
    with pytest.raises(ValueError, match="no embedder"):
        nearest(evec, "some text", n=5)


def test_keyword_hybrid_blend(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "machine learning rocks"),
            (2, [1.0, 0.0], "cooking recipes"),
        ],
        "id int, embedding array<float>, text string",
    )
    res = nearest(
        vec(df), [1.0, 0.0], n=2, as_embedding=True,
        keyword_weight=0.5, keyword_column="text", tiebreak="id",
    )
    # HACK: as_embedding + keyword needs query text; engine uses str(query)
    rows = {r["id"]: r["similarity"] for r in res.collect()}
    # both have identical vector score 1.0; keyword score 0 for both
    # (query text is the vector repr) -> blended 0.5 each
    assert rows[1] == pytest.approx(0.5)
    assert rows[2] == pytest.approx(0.5)


def test_similarity_join_exact_topk(embeddings):
    left = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("left_id"), F.col("embedding").alias("lv")
    )
    right = embeddings.select(
        F.col("vec_id").alias("right_id"), F.col("embedding").alias("rv")
    )
    out = similarity_join_exact(
        left, right, "lv", "rv", method="cosine", k=3,
        left_id="left_id", right_id="right_id",
    )
    rows = out.collect()
    assert len(rows) == 15
    by_left = {}
    for r in rows:
        by_left.setdefault(r["left_id"], []).append(r)
    for lid, grp in by_left.items():
        best = max(grp, key=lambda r: r["similarity"])
        assert best["right_id"] == lid  # self is nearest


def test_query_string_through_embedder_matches_pure_python_mirror(spark):
    # the reference's primary UX (R/core.R:252-260): raw query string ->
    # attached embedder -> nearest. The fake encoder is deterministic,
    # so the full distributed pipeline must reproduce the pure-Python
    # mirror bit-for-bit at 6-digit rounding (same mirror generates the
    # driver's VALUES oracle at sf0.01).
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [
        (r["doc_id"], r["similarity"])
        for r in entry._hf_query_nearest(spark, sf).collect()
    ]
    assert got == entry._fake_nearest_expected(sf)


def test_similarity_join_lsh_subset_of_exact_and_probe_recall(spark):
    # bucketing only restricts candidates: every LSH pair must appear
    # in the exact join with the same score, and raising probe radius
    # can only add pairs
    from tidyvec_spark.operators.ann import random_planes
    from tidyvec_spark.operators.nearest import (
        similarity_join_exact,
        similarity_join_lsh,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 105)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    planes = random_planes(64, nbits=6, seed=42)

    def pairs(df):
        return {
            (r["qid"], r["cid"]): r["similarity"]
            for r in df.select("qid", "cid", "similarity").collect()
        }

    exact = pairs(
        similarity_join_exact(
            q, c, "qv", "cv", left_id="qid", right_id="cid", round_to=6
        )
    )
    p0 = pairs(
        similarity_join_lsh(
            q, c, "qv", "cv", planes, left_id="qid", right_id="cid",
            probe_hamming=0, round_to=6,
        )
    )
    p1 = pairs(
        similarity_join_lsh(
            q, c, "qv", "cv", planes, left_id="qid", right_id="cid",
            probe_hamming=1, round_to=6,
        )
    )
    assert set(p0) <= set(p1) <= set(exact)
    assert all(exact[k] == v for k, v in p1.items())  # identical scores
    assert len(p1) > len(p0)  # multiprobe adds recall on this corpus
