"""Product quantization: encode determinism, ADC vs exact recall, and
the scan-bytes claim (approximate queries read only the code column)."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators import ann
from tidyvec_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks_from_rows,
    pq_encode,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


@pytest.fixture(scope="module")
def books(emb):
    seeds = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    return pq_codebooks_from_rows(seeds, m=8)


def test_encode_shape_and_determinism(emb, books):
    codes = pq_encode(emb, "embedding", books).select("vec_id", "pq_code")
    rows = {r["vec_id"]: r["pq_code"] for r in codes.collect()}
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in rows.values())
    # seed rows encode to themselves in every subspace (distance 0)
    for i in range(16):
        assert rows[i] == [i] * 8
    # deterministic across plans
    again = {r["vec_id"]: r["pq_code"] for r in
             pq_encode(emb, "embedding", books).select("vec_id", "pq_code").collect()}
    assert again == rows


def test_adc_topk_overlaps_exact(emb, books, spark):
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    codes = pq_encode(emb, "embedding", books).select("vec_id", "pq_code")
    approx = [r["vec_id"] for r in
              pq_adc_topk(codes, "pq_code", "vec_id", qvec, books, k=20).collect()]
    assert approx[0] == 0  # the query row itself: ADC distance 0 to its own codes
    from tidyvec_spark import vec
    from tidyvec_spark.operators.nearest import nearest
    exact = [r["vec_id"] for r in
             nearest(vec(emb), qvec, n=20, as_embedding=True,
                     method="euclidean", tiebreak="vec_id").df.select("vec_id").collect()]
    # quantized distances are approximate; demand meaningful overlap
    assert len(set(approx) & set(exact)) >= 5


def test_adc_scan_reads_only_codes(emb, books, spark, tmp_path):
    # THE pq claim: once codes are persisted, approximate search never
    # touches the wide embedding column — pin it via ReadSchema
    path = str(tmp_path / "codes")
    pq_encode(emb, "embedding", books).select(
        "vec_id", "embedding", "pq_code"
    ).write.parquet(path)
    stored = spark.read.parquet(path)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    df = pq_adc_topk(stored, "pq_code", "vec_id", qvec, books, k=10)
    P.assert_column_pruned(df, "embedding")
    assert P.has_take_ordered(df)
    assert P.num_shuffles(df) == 0


def test_encode_strategies_agree(emb, books):
    """The literal argmin expression and the BLAS batch encoder must
    produce identical codes (same rounded-distance argmin, same
    smallest-code tiebreak)."""
    lit = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(emb, "embedding", books, strategy="literal")
        .select("vec_id", "pq_code").collect()
    }
    pan = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(emb, "embedding", books, strategy="pandas")
        .select("vec_id", "pq_code").collect()
    }
    assert lit == pan


def test_encode_bad_strategy(emb, books):
    with pytest.raises(ValueError):
        pq_encode(emb, "embedding", books, strategy="quantum")
