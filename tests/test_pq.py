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


@pytest.fixture(scope="module")
def ivfpq_index(emb, books):
    from tidyvec_spark.operators.pq import ivfpq_encode

    seeds = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    codes = ivfpq_encode(emb, "embedding", "vec_id", seeds, books)
    return seeds, codes


def test_ivfpq_encode_shape(ivfpq_index, emb):
    seeds, codes = ivfpq_index
    rows = {r["vec_id"]: r for r in codes.collect()}
    assert len(rows) == emb.count()
    assert all(0 <= r["centroid_id"] < 16 for r in rows.values())
    assert all(
        len(r["pq_code"]) == 8 and all(0 <= x < 16 for x in r["pq_code"])
        for r in rows.values()
    )
    # a seed row is its own centroid; residual 0 encodes to the code
    # whose sub-vector is nearest zero — same for every seed, so just
    # pin the assignment
    for i in range(16):
        assert rows[i]["centroid_id"] == i


def test_ivfpq_probed_adc_overlaps_exact(ivfpq_index, emb):
    """Probed residual-ADC top-k must meaningfully agree with the exact
    euclidean top-k (IVFADC is approximate on two axes — probe set and
    quantization — so demand overlap, not equality), and probing all
    lists must rank the query row itself first."""
    from tidyvec_spark.operators.pq import ivfpq_adc_topk

    seeds, codes = ivfpq_index
    books = pq_codebooks_from_rows(seeds, m=8)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    approx = [
        r["vec_id"]
        for r in ivfpq_adc_topk(
            codes, "vec_id", qvec, seeds, books, nprobe=16, k=20
        ).collect()
    ]
    assert approx[0] == 0  # own residual quantizes to ADC distance ~0
    from tidyvec_spark import vec
    from tidyvec_spark.operators.nearest import nearest

    exact = [
        r["vec_id"]
        for r in nearest(
            vec(emb), qvec, n=20, as_embedding=True,
            method="euclidean", tiebreak="vec_id",
        ).df.select("vec_id").collect()
    ]
    assert len(set(approx) & set(exact)) >= 5
    # residual coding must beat-or-match raw-vector PQ at equal budget:
    # both rank the true nearest row first here, but the probed variant
    # must also respect its probe set — nprobe=1 scans one list only
    one = ivfpq_adc_topk(codes, "vec_id", qvec, seeds, books, nprobe=1, k=1000)
    probed_cents = {
        r["centroid_id"]
        for r in codes.join(one.select("vec_id"), "vec_id").select("centroid_id").distinct().collect()
    }
    assert len(probed_cents) == 1


def test_ivfpq_scan_prunes_unprobed_lists(ivfpq_index, spark, tmp_path, emb):
    """Written partitioned by centroid_id, a probed query's scan must
    push the centroid IN-filter down to partition pruning."""
    from tidyvec_spark.operators.pq import ivfpq_adc_topk

    seeds, codes = ivfpq_index
    books = pq_codebooks_from_rows(seeds, m=8)
    path = str(tmp_path / "ivfpq")
    codes.write.partitionBy("centroid_id").parquet(path)
    stored = spark.read.parquet(path)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    df = ivfpq_adc_topk(stored, "vec_id", qvec, seeds, books, nprobe=4, k=10)
    s = P.explain_str(df)
    assert "PartitionFilters" in s and "centroid_id" in s
    assert P.num_shuffles(df) == 0
    assert P.has_take_ordered(df)


def test_pq_encode_null_embedding_null_code_both_strategies(spark):
    """Engine NULL law in the encoders: a NULL embedding gets a NULL
    code under BOTH pq_encode strategies (parity — the literal path
    would otherwise pick an arbitrary struct-min code through NULL
    distances, the pandas path would crash vstack), and ivfpq_encode
    simply has no index row for it."""
    from tidyvec_spark.operators.pq import (
        ivfpq_encode,
        pq_codebooks_from_rows,
        pq_encode,
    )

    seeds = [[float(i + j) for j in range(8)] for i in range(4)]
    books = pq_codebooks_from_rows(seeds, m=2)
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, None)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    for strat in ("literal", "pandas"):
        got = {
            r["vec_id"]: r["pq_code"]
            for r in pq_encode(
                df, "embedding", books, strategy=strat
            ).collect()
        }
        assert got[2] is None, strat
        assert got[1] is not None and len(got[1]) == 2, strat
    idx = ivfpq_encode(
        df, "embedding", "vec_id", [[0.0] * 8], books
    ).collect()
    assert [r["vec_id"] for r in idx] == [1]


def test_pq_adc_topk_excludes_null_codes(spark):
    """The NULL-code law propagates to scoring: a NULL-embedding row
    must never rank (previously a NULL LUT index could fabricate a
    rank-1 distance)."""
    from tidyvec_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks_from_rows,
        pq_encode,
    )

    seeds = [[float(i + j) for j in range(8)] for i in range(4)]
    books = pq_codebooks_from_rows(seeds, m=2)
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, None), (3, [2.0] * 8)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    codes = pq_encode(df, "embedding", books).select("vec_id", "pq_code")
    got = pq_adc_topk(
        codes, "pq_code", "vec_id", [3.0] * 8, books, k=3
    ).collect()
    ids = [r["vec_id"] for r in got]
    assert 2 not in ids and set(ids) == {1, 3}


def test_pq_reconstruction_err_expr_matches_numpy(spark):
    """The reconstruction-error expression equals an independent numpy
    decode-and-measure, and zero error on a vector that IS a codeword
    concatenation."""
    import math

    import numpy as np

    from tidyvec_spark.operators.pq import (
        pq_codebooks_from_rows,
        pq_encode,
        pq_reconstruction_err_expr,
    )

    rng = np.random.RandomState(3)
    seeds = [list(map(float, rng.randn(8))) for _ in range(4)]
    books = pq_codebooks_from_rows(seeds, m=2)
    # vec 1: random; vec 2: exactly codeword 0 || codeword 1 (err 0)
    exact = list(books[0][0]) + list(books[1][1])
    df = spark.createDataFrame(
        [(1, list(map(float, rng.randn(8)))), (2, exact), (3, None)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = {
        r["vec_id"]: r["e"]
        for r in df.select(
            "vec_id",
            F.round(
                pq_reconstruction_err_expr("embedding", books), 6
            ).alias("e"),
        ).collect()
    }
    assert got[2] == 0.0
    assert got[3] is None
    # independent check: decode via the encoder's codes, measure L2
    codes = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(df, "embedding", books).collect()
    }
    x = np.array(df.filter(F.col("vec_id") == 1).first()["embedding"])
    dec = np.concatenate(
        [np.array(books[j][codes[1][j]]) for j in range(2)]
    )
    # the expression sums ROUNDED subspace distances; reproduce that
    want = math.sqrt(
        sum(
            round(float(((x[j*4:(j+1)*4] - dec[j*4:(j+1)*4]) ** 2).sum()), 6)
            for j in range(2)
        )
    )
    assert abs(got[1] - round(want, 6)) <= 1e-6


def test_pq_reconstruction_sql_path_matches_column_path(spark):
    """The string-name input builds the expression as one JVM-parsed
    SQL text (r14 construction-cost fix); it must stay bit-identical
    to the Column-builder path — same fold order, same rounded
    per-centroid distances."""
    import numpy as np

    from pyspark.sql import functions as F

    from tidyvec_spark.operators.pq import (
        pq_codebooks_from_rows,
        pq_reconstruction_err_expr,
    )

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(16).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    books = pq_codebooks_from_rows([r[1] for r in rows[:8]], m=4)
    got_sql = {
        r["vec_id"]: r["e"]
        for r in df.select(
            "vec_id",
            F.round(
                pq_reconstruction_err_expr("embedding", books), 6
            ).alias("e"),
        ).collect()
    }
    got_col = {
        r["vec_id"]: r["e"]
        for r in df.select(
            "vec_id",
            F.round(
                pq_reconstruction_err_expr(F.col("embedding"), books), 6
            ).alias("e"),
        ).collect()
    }
    assert got_sql == got_col
