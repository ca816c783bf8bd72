"""Scalar (int8) quantization: encode bounds/clamping, reconstruction
error bound, recall vs exact search, and the scan-prune claim."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.sq import sq_encode, sq_fit, sq_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


@pytest.fixture(scope="module")
def fitted(emb):
    return sq_fit(emb, "embedding", dim=64)


def test_fit_shape(fitted):
    mins, maxs = fitted
    assert len(mins) == len(maxs) == 64
    assert all(mn <= mx for mn, mx in zip(mins, maxs))


def test_encode_bounds_and_determinism(emb, fitted):
    mins, maxs = fitted
    codes = sq_encode(emb, "embedding", mins, maxs)
    rows = {r["vec_id"]: r["sq_code"] for r in codes.collect()}
    assert all(
        len(c) == 64 and all(0 <= x <= 255 for x in c) for c in rows.values()
    )
    again = {
        r["vec_id"]: r["sq_code"]
        for r in sq_encode(emb, "embedding", mins, maxs).collect()
    }
    assert again == rows
    # encoding is a pure projection: no shuffle
    assert P.num_shuffles(codes) == 0


def test_encode_clamps_out_of_range(spark):
    df = spark.createDataFrame([(1, [2.0]), (2, [-2.0])], ["id", "v"])
    codes = {
        r["id"]: r["sq_code"]
        for r in sq_encode(df, "v", [-1.0], [1.0]).collect()
    }
    assert codes[1] == [255] and codes[2] == [0]


def test_reconstruction_error_bounded(emb, fitted):
    """Every dimension reconstructs within half a quantization step —
    the defining property of uniform scalar quantization."""
    mins, maxs = fitted
    codes = sq_encode(emb, "embedding", mins, maxs)
    row = codes.filter(F.col("vec_id") == 7).first()
    for j, (x, c) in enumerate(zip(row["embedding"], row["sq_code"])):
        rng = maxs[j] - mins[j]
        step = rng / 255 if rng > 0 else 0.0
        xhat = mins[j] + c * step
        assert abs(x - xhat) <= step / 2 + 1e-12


def test_sq_topk_recall_vs_exact(emb, fitted, spark):
    mins, maxs = fitted
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    codes = sq_encode(emb, "embedding", mins, maxs).select("vec_id", "sq_code")
    approx = [r["vec_id"] for r in
              sq_topk(codes, "vec_id", qvec, mins, maxs, k=10).collect()]
    assert approx[0] == 0  # the query row quantizes closest to itself
    from tidyvec_spark import vec
    from tidyvec_spark.operators.nearest import nearest

    exact = [r["vec_id"] for r in
             nearest(vec(emb), qvec, n=10, as_embedding=True,
                     method="euclidean", tiebreak="vec_id")
             .df.select("vec_id").collect()]
    # 8-bit SQ on 64 dims barely perturbs the ranking
    assert len(set(approx) & set(exact)) >= 8


def test_sq_scan_reads_only_codes(emb, fitted, spark, tmp_path):
    mins, maxs = fitted
    path = str(tmp_path / "sq")
    sq_encode(emb, "embedding", mins, maxs).write.parquet(path)
    stored = spark.read.parquet(path)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    df = sq_topk(stored, "vec_id", qvec, mins, maxs, k=5)
    P.assert_column_pruned(df, "embedding")
    assert P.has_take_ordered(df)
    assert P.num_shuffles(df) == 0
