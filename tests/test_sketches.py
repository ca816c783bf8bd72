"""Mergeable HLL distinct-count sketches (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.sketches import (
    distinct_with_accuracy_contract,
    hll_rollup,
    hll_sketch_by,
)


@pytest.fixture(scope="module")
def clicks(spark):
    rows = [
        ("d1", h, u)
        for h in range(4)
        for u in range(h * 10, h * 10 + 25)  # overlapping users per hour
    ] + [("d2", 0, u) for u in range(7)]
    return spark.createDataFrame(rows, "day string, hr int, user long")


def test_merge_consistency_hourly_to_daily(clicks):
    """union of hourly sketches == sketch of the day (same lg_k)."""
    direct = {
        r["day"]: r["n_distinct_est"]
        for r in hll_rollup(
            hll_sketch_by(clicks, ["day"], "user"), ["day"]
        ).collect()
    }
    merged = {
        r["day"]: r["n_distinct_est"]
        for r in hll_rollup(
            hll_sketch_by(clicks, ["day", "hr"], "user"), ["day"]
        ).collect()
    }
    assert direct == merged


def test_estimate_exact_at_low_cardinality(clicks):
    got = {
        r["day"]: r["n_distinct_est"]
        for r in hll_rollup(
            hll_sketch_by(clicks, ["day"], "user"), ["day"]
        ).collect()
    }
    # 0..54 distinct users on d1 (hours overlap), 7 on d2 — sparse-mode
    # HLL is exact at these cardinalities
    assert got == {"d1": 55, "d2": 7}


def test_accuracy_contract_keeps_all_groups(clicks):
    out = {
        r["day"]: r["n_distinct"]
        for r in distinct_with_accuracy_contract(
            clicks, ["day"], "user", ["day", "hr"]
        ).collect()
    }
    assert out == {"d1": 55, "d2": 7}


def test_contract_drops_on_impossible_tolerance(clicks):
    """rel_tol=-1 makes the gate unsatisfiable — every group drops,
    proving the filter really is wired to the estimates."""
    out = distinct_with_accuracy_contract(
        clicks, ["day"], "user", ["day", "hr"], rel_tol=-1.0
    ).collect()
    assert out == []
