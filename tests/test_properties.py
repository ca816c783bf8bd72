"""Property-based tests (SURVEY §5.2.3): the native column-expression
similarity kernels must agree with an independent numpy formulation on
arbitrary finite inputs, and obey the algebraic invariants the search
semantics rely on (symmetry, bounds, self-similarity, the euclidean
distance→similarity transform).

One Spark job per hypothesis example; examples are small batches of
vector pairs so each job is one collect over a handful of rows.
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tidyvec_spark.functions.vector import (
    array_lit,
    cosine_sim_expr,
    dot_expr,
    euclidean_sim_expr,
    l2_normalize_expr,
)

finite = st.floats(
    min_value=-100.0,
    max_value=100.0,
    allow_nan=False,
    allow_infinity=False,
    width=32,
)


@st.composite
def vector_pairs(draw):
    d = draw(st.integers(min_value=1, max_value=8))
    n = draw(st.integers(min_value=1, max_value=5))
    vecs = st.lists(finite, min_size=d, max_size=d)
    return [(draw(vecs), draw(vecs)) for _ in range(n)]


def _kernels(spark, pairs):
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], "a array<double>, b array<double>"
    )
    rows = df.select(
        cosine_sim_expr("a", "b").alias("cos_ab"),
        cosine_sim_expr("b", "a").alias("cos_ba"),
        dot_expr("a", "b").alias("dot"),
        euclidean_sim_expr("a", "b").alias("euc"),
        euclidean_sim_expr("a", "a").alias("euc_self"),
    ).collect()
    return rows


SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SET
@given(pairs=vector_pairs())
def test_kernels_match_numpy_and_invariants(spark, pairs):
    rows = _kernels(spark, pairs)
    for (a, b), r in zip(pairs, rows):
        va, vb = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
        na, nb = np.linalg.norm(va), np.linalg.norm(vb)

        # dot kernel == numpy dot
        assert math.isclose(r["dot"], float(va @ vb), rel_tol=1e-9, abs_tol=1e-9)

        # cosine: engine convention scores 0 when either norm is 0
        expect_cos = 0.0 if na == 0 or nb == 0 else float(va @ vb) / (na * nb)
        assert math.isclose(r["cos_ab"], expect_cos, rel_tol=1e-6, abs_tol=1e-9)
        # symmetry + bounds (fp slack)
        assert math.isclose(r["cos_ab"], r["cos_ba"], rel_tol=1e-9, abs_tol=1e-12)
        assert -1.0 - 1e-9 <= r["cos_ab"] <= 1.0 + 1e-9

        # euclidean similarity: 1/(1+d), in (0, 1], self-sim exactly 1
        d = float(np.linalg.norm(va - vb))
        assert math.isclose(r["euc"], 1.0 / (1.0 + d), rel_tol=1e-6, abs_tol=1e-9)
        assert 0.0 < r["euc"] <= 1.0 + 1e-9
        assert r["euc_self"] == pytest.approx(1.0)


@SET
@given(pairs=vector_pairs())
def test_l2_normalize_unit_norm(spark, pairs):
    vecs = [a for a, _ in pairs]
    df = spark.createDataFrame([(v,) for v in vecs], "a array<double>")
    rows = df.select(l2_normalize_expr("a").alias("u"), "a").collect()
    for r in rows:
        va = np.array(r["a"], dtype=np.float64)
        if np.linalg.norm(va) == 0:
            continue  # zero vectors pass through by convention
        assert math.isclose(
            float(np.linalg.norm(np.array(r["u"], dtype=np.float64))),
            1.0,
            rel_tol=1e-6,
        )


@SET
@given(pairs=vector_pairs())
def test_query_literal_kernel_matches_column_kernel(spark, pairs):
    """nearest() scores against a broadcast literal query vector; the
    literal path must equal the column-vs-column path."""
    for a, b in pairs[:2]:
        df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
        r = df.select(
            cosine_sim_expr("a", array_lit(b)).alias("lit_cos"),
            cosine_sim_expr("a", "b").alias("col_cos"),
        ).first()
        assert math.isclose(
            r["lit_cos"], r["col_cos"], rel_tol=1e-9, abs_tol=1e-12
        )
