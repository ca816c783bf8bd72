"""Binary (sign) quantization: packing parity between the column
expression and the driver-side twin, Hamming top-k, and the
prefilter -> exact-rerank serving pattern."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.bq import (
    bq_encode,
    bq_pack_py,
    bq_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_pack_parity_spark_vs_python(spark, emb):
    rows = (
        bq_encode(
            emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e")),
            "e", dim=64,
        )
        .select("vec_id", "e", "bq")
        .limit(50)
        .collect()
    )
    for r in rows:
        assert list(r["bq"]) == bq_pack_py(list(r["e"])), r["vec_id"]
    assert all(len(r["bq"]) == 1 for r in rows)  # 64 dims -> 1 word


def test_pack_multiword(spark):
    # 100 dims -> 2 words; second word uses 36 bits
    vec = [1.0 if i % 2 == 0 else -1.0 for i in range(100)]
    df = spark.createDataFrame([(1, vec)], "id bigint, e array<double>")
    got = bq_encode(df, "e", dim=100).select("bq").first()["bq"]
    assert list(got) == bq_pack_py(vec)
    # sign bit (j=63) of word 0 must be set for even-positive pattern? j=62 even -> bit62; j=63 odd -> negative dim -> unset
    assert got[0] >= 0


def test_hamming_topk_self_is_zero(spark, emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = bq_topk(emb, "embedding", "vec_id", q, k=5, dim=64).collect()
    assert top[0]["vec_id"] == 0 and top[0]["hamming"] == 0
    hs = [r["hamming"] for r in top]
    assert hs == sorted(hs)


def test_prefilter_rerank_matches_exact_on_candidates(spark, emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = bq_topk(
        emb, "embedding", "vec_id", q, k=5, dim=64, prefilter=100, round_to=6
    ).collect()
    assert len(out) == 5 and out[0]["vec_id"] == 0
    sims = [r["similarity"] for r in out]
    assert sims == sorted(sims, reverse=True)
    # reranked top-1 similarity ~ 1.0 (self)
    assert abs(out[0]["similarity"] - 1.0) < 1e-6


def test_bq_validation(spark, emb):
    with pytest.raises(ValueError):
        bq_topk(emb, "embedding", "vec_id", [1.0] * 64, k=0, dim=64)
    with pytest.raises(ValueError):
        bq_topk(emb, "embedding", "vec_id", [1.0] * 32, k=3, dim=64)
    with pytest.raises(ValueError):
        bq_topk(emb, "embedding", "vec_id", [1.0] * 64, k=10, dim=64, prefilter=5)


def test_stored_code_width_mismatch_raises(spark, emb):
    # ADVICE r5: with code_col, a query of the wrong dim used to
    # NULL the hamming sum (zip_with pads + bit_count(NULL)) and
    # return arbitrary rows; it must error instead.
    coded = bq_encode(emb, "embedding", dim=64)  # 1 word per row
    bad_q = [1.0] * 128  # packs to 2 words
    with pytest.raises(Exception, match="width mismatch"):
        bq_topk(coded, "embedding", "vec_id", bad_q, k=3, code_col="bq").collect()
    # dim + code_col: driver-side check fires before any job
    with pytest.raises(ValueError, match="query dim"):
        bq_topk(coded, "embedding", "vec_id", bad_q, k=3, dim=64, code_col="bq")
